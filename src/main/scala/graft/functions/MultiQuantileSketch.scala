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
  *
  * Memory discipline: QuantileSummaries buffers raw inserts in a boxed
  * head buffer and only folds it in every 50k values — tuned for ONE
  * summary per column per task. With `numFeatures` summaries per task
  * times every scan task, those heads add up to (rows x features) live
  * boxed doubles across the executor (3.5 GB at 600k x 190 locally) and
  * the job runs at GC speed. Folding each summary every
  * [[MultiQuantileSketch.foldEvery]] inserts caps a task's whole pending
  * state at [[MultiQuantileSketch.PendingBudget]] boxed values and keeps
  * the scan CPU-bound; the GK error bound is unaffected by fold
  * frequency.
  */
case class MultiQuantileSketch(
    featuresArray: Expression,     // ArrayType(DoubleType), one slot per feature
    numFeatures: Int,
    relativeError: Double,
    probabilities: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MultiQuantileSketch.Buffer] {
  import MultiQuantileSketch.Buffer

  require(numFeatures > 0, "numFeatures must be positive")
  require(probabilities.nonEmpty, "at least one probability required")

  private val foldEvery = MultiQuantileSketch.foldEvery(numFeatures)

  override def children: Seq[Expression] = Seq(featuresArray)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "multi_quantile_sketch"

  override def createAggregationBuffer(): Buffer =
    new Buffer(
      Array.fill(numFeatures)(
        new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)),
      new Array[Int](numFeatures))

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val arr = featuresArray.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val s = buffer.summaries
      val pending = buffer.pending
      var f = 0
      while (f < numFeatures) {
        if (!a.isNullAt(f)) {
          val v = a.getDouble(f)
          if (!java.lang.Double.isNaN(v)) {
            s(f) = s(f).insert(v)
            pending(f) += 1
            if (pending(f) >= foldEvery) { s(f) = s(f).compress(); pending(f) = 0 }
          }
        }
        f += 1
      }
    }
    buffer
  }

  override def merge(buffer: Buffer, input: Buffer): Buffer = {
    var f = 0
    while (f < numFeatures) {
      val a = if (buffer.summaries(f).compressed) buffer.summaries(f)
              else buffer.summaries(f).compress()
      val b = if (input.summaries(f).compressed) input.summaries(f)
              else input.summaries(f).compress()
      buffer.summaries(f) = if (b.count == 0) a else if (a.count == 0) b else a.merge(b)
      buffer.pending(f) = 0
      f += 1
    }
    buffer
  }

  override def eval(buffer: Buffer): Any =
    new GenericArrayData(buffer.summaries.map { s0 =>
      val s = if (s0.compressed) s0 else s0.compress()
      if (s.count == 0) new GenericArrayData(Array.empty[Double])
      else new GenericArrayData(probabilities.map(p => s.query(p).get).toArray)
    })

  /** Stats triples written raw — QuantileSummaries' sampled array is its
    * whole state besides the scalars. */
  override def serialize(buffer: Buffer): Array[Byte] = {
    val compressed = buffer.summaries.map(s => if (s.compressed) s else s.compress())
    val size = compressed.map(s => 8 + 4 + s.sampled.length * 24).sum
    val bb = ByteBuffer.allocate(size)
    compressed.foreach { s =>
      bb.putLong(s.count)
      bb.putInt(s.sampled.length)
      s.sampled.foreach { st => bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val summaries = Array.fill(numFeatures) {
      val count = bb.getLong()
      val n = bb.getInt()
      val stats = Array.fill(n)(
        QuantileSummaries.Stats(bb.getDouble(), bb.getLong(), bb.getLong()))
      new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, relativeError, stats, count, true)
    }
    new Buffer(summaries, new Array[Int](numFeatures))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultiQuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultiQuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MultiQuantileSketch =
    copy(featuresArray = newChildren.head)
}

object MultiQuantileSketch {
  /** Pending-insert budget for a whole task's buffer (all features
    * together): each summary folds every `PendingBudget / numFeatures`
    * inserts, clamped to [4096, 50000]. The lower the fold interval the
    * more sort-merge passes per insert; the higher, the more live boxed
    * doubles. 50000 is the stock head size (folding later than that is a
    * no-op — QuantileSummaries folds itself there); at 190 features this
    * lands ~4k, which turned the wide edge pass from GC-bound back to
    * CPU-bound. Fold frequency never affects the GK error bound. */
  val PendingBudget = 786432

  def foldEvery(numFeatures: Int): Int =
    math.min(50000, math.max(4096, PendingBudget / numFeatures))

  /** Per-feature summaries plus pending-insert counters driving the
    * periodic fold. */
  final class Buffer(val summaries: Array[QuantileSummaries], val pending: Array[Int])
}
