package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass multi-column approximate quantiles over a packed feature
  * array — the scan that feeds [[graft.tree.DecisionTreeClassifier]]'s
  * `maxBins` edge computation.
  *
  * Runs the SAME Greenwald–Khanna summaries (with the same
  * `relativeError` contract) as `df.stat.approxQuantile`, but as a
  * Catalyst aggregate over one codegen-projected `array(cols)` child
  * instead of `Dataset.rdd.treeAggregate` over external `Row`s. The
  * stock path re-boxes every double of every row during the
  * InternalRow -> Row conversion; at the reference's flagship width
  * (190 features, README.md:40-47) that conversion dominated the whole
  * fit — 173 s of a 190 s wide fit at sf0.1 was the quantile pass,
  * ~25x the histogram scan that does strictly more arithmetic. Reading
  * primitives straight out of the projected `UnsafeArrayData` makes the
  * edge pass cost what a scan costs.
  *
  * Null and NaN feature values are ignored per column (the stock
  * `approxQuantile` contract). Output: one `Array[Double]` of the
  * queried quantiles per feature; empty when the column had no valid
  * values (all-null feature — callers drop those, Trainer.scala:164).
  */
case class MultiQuantileSketch(
    featuresArray: Expression,     // ArrayType(DoubleType), one slot per feature
    numFeatures: Int,
    relativeError: Double,
    probabilities: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[QuantileSummaries]] {

  require(numFeatures > 0, "numFeatures must be positive")
  require(probabilities.nonEmpty, "at least one probability required")

  override def children: Seq[Expression] = Seq(featuresArray)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "multi_quantile_sketch"

  override def createAggregationBuffer(): Array[QuantileSummaries] =
    Array.fill(numFeatures)(
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError))

  override def update(
      buffer: Array[QuantileSummaries], input: InternalRow): Array[QuantileSummaries] = {
    val arr = featuresArray.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var f = 0
      while (f < numFeatures) {
        if (!a.isNullAt(f)) {
          val v = a.getDouble(f)
          if (!java.lang.Double.isNaN(v)) buffer(f) = buffer(f).insert(v)
        }
        f += 1
      }
    }
    buffer
  }

  override def merge(
      buffer: Array[QuantileSummaries],
      input: Array[QuantileSummaries]): Array[QuantileSummaries] = {
    var f = 0
    while (f < numFeatures) {
      val a = if (buffer(f).compressed) buffer(f) else buffer(f).compress()
      val b = if (input(f).compressed) input(f) else input(f).compress()
      buffer(f) = if (b.count == 0) a else if (a.count == 0) b else a.merge(b)
      f += 1
    }
    buffer
  }

  override def eval(buffer: Array[QuantileSummaries]): Any =
    new GenericArrayData(buffer.map { s0 =>
      val s = if (s0.compressed) s0 else s0.compress()
      if (s.count == 0) new GenericArrayData(Array.empty[Double])
      else new GenericArrayData(probabilities.map(p => s.query(p).get).toArray)
    })

  /** Stats triples written raw — QuantileSummaries' sampled array is its
    * whole state besides the scalars. */
  override def serialize(buffer: Array[QuantileSummaries]): Array[Byte] = {
    val compressed = buffer.map(s => if (s.compressed) s else s.compress())
    val size = compressed.map(s => 8 + 4 + s.sampled.length * 24).sum
    val bb = ByteBuffer.allocate(size)
    compressed.foreach { s =>
      bb.putLong(s.count)
      bb.putInt(s.sampled.length)
      s.sampled.foreach { st => bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[QuantileSummaries] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numFeatures) {
      val count = bb.getLong()
      val n = bb.getInt()
      val stats = Array.fill(n)(
        QuantileSummaries.Stats(bb.getDouble(), bb.getLong(), bb.getLong()))
      new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, relativeError, stats, count, true)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultiQuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultiQuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MultiQuantileSketch =
    copy(featuresArray = newChildren.head)
}
