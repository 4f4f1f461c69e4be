package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fused melt + histogram for the BINNED pipeline fit: one aggregate over
  * the packed raw `array<double>` feature slots that emits the exact same
  * histogram cells the posexplode + hash-aggregate formulation produced —
  * `array<struct<feature, feature_value, class_i_count..., count_examples>>`,
  * one struct per OBSERVED (slot, snapped value), exploded by `inline`
  * into the unchanged cumulative/gain pipeline.
  *
  * Why (guide §2.3/§5): the melted formulation materializes
  * rows x (#slots) melted tuples per tree level before the partial
  * aggregate — at the wide fit's 191 slots that is ~10^8 generator
  * outputs and hash probes per level, and the snap projection it feeds
  * on (`SnapArrayToEdges`) allocates a boxed Object[] array per row.
  * The r20 driver record priced that allocation rate at 111.5 s on
  * local[32] vs 29.9 s on local[8] (inverse core scaling: 32 allocating
  * cores grow the heap faster than the kernel can commit/zero pages —
  * the record's 52.6 GB peak heap vs 2.6 GB live). Here the per-task
  * state is ONE flat long array of Σ_f(|edges_f|+1) x (numClasses+1)
  * cells (~200 KB at 191 slots x 32 edges), the per-row work is
  * #slots binary searches, and the per-row garbage is one array
  * accessor — independent of the heap the harness grants.
  *
  * Exact cell parity with melt-after-[[SnapArrayToEdges]] (pinned by
  * PackedHistogramCellsSpec differentials):
  *   - value v -> first ascending edge with v <= e (same binary-search
  *     predicate), the +Infinity overflow cell past the last edge;
  *   - null -> the overflow cell (the snap's CaseWhen `otherwise(+Inf)`;
  *     the melt's null filter never fires because snapped slots are
  *     never null);
  *   - NaN -> the overflow cell (NaN fails every `<=`);
  *   - class counts = `count(when(target === v, 1))`: a null/unknown
  *     class (index null, -1, or out of range) counts toward
  *     `count_examples` only;
  *   - cells with zero examples are NOT emitted (the melt only groups
  *     observed values);
  *   - an emitted `-0.0` edge value is normalized to `0.0`, matching the
  *     hash aggregate's float normalization of its group keys.
  *
  * Every slot must carry at least one FINITE edge (the caller melts the
  * node sentinel as edges = [0.0]: its constant 0.0 value always lands
  * on that edge, reproducing the melt's single sentinel cell). A +Inf
  * edge would collide with the overflow cell where the melt's group-by
  * would have merged them — the caller falls back to the melt for that
  * (never produced by the quantile sketch) case.
  */
case class PackedHistogramCells(
    featuresArray: Expression, // ArrayType(DoubleType): packed RAW slots
    classIndex: Expression,    // int class index; null/-1/out-of-range = no class
    edges: Seq[Seq[Double]],   // per-slot ascending finite bin edges, all non-empty
    numClasses: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(edges.nonEmpty && edges.forall(_.nonEmpty),
    "every packed slot needs at least one bin edge")
  require(edges.forall(_.forall(e => java.lang.Double.isFinite(e))),
    "bin edges must be finite (a +Inf edge would collide with the overflow cell)")

  private val numSlots = edges.size
  private val stride = numClasses + 1 // class counts + count_examples
  // immutable snapshots for executor-side loops
  @transient private lazy val edgeArrays: Array[Array[Double]] =
    edges.map(_.sorted.toArray).toArray
  // cell offset of each slot's bin 0; slot f spans (|edges_f|+1) cells
  @transient private lazy val slotOffsets: Array[Int] = {
    val offs = new Array[Int](numSlots)
    var acc = 0
    var f = 0
    while (f < numSlots) {
      offs(f) = acc
      acc += (edges(f).size + 1) * stride
      f += 1
    }
    offs
  }
  private lazy val bufferLen: Int =
    edges.map(e => (e.size + 1) * stride).sum

  override def children: Seq[Expression] = Seq(featuresArray, classIndex)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(StructField("feature", IntegerType, nullable = false),
        StructField("feature_value", DoubleType, nullable = false)) ++
        (0 until numClasses).map(i =>
          StructField(s"class_${i}_count", LongType, nullable = false)) :+
        StructField("count_examples", LongType, nullable = false)),
    containsNull = false)
  override def prettyName: String = "packed_histogram_cells"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufferLen)

  /** First edge index with v <= edge, else the overflow cell — the same
    * predicate [[SnapArrayToEdges]] snaps with (NaN fails every compare
    * and lands in overflow). */
  private def binOf(es: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = es.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= es(mid)) hi = mid else lo = mid + 1
    }
    lo // == es.length -> overflow (+Inf) cell
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val arr = featuresArray.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val cls = classIndex.eval(input)
      val k =
        if (cls == null) -1
        else {
          val c = cls.asInstanceOf[Int]
          if (c >= 0 && c < numClasses) c else -1
        }
      var f = 0
      while (f < numSlots) {
        val es = edgeArrays(f)
        // null -> overflow, the snap chain's otherwise(+Inf)
        val b = if (a.isNullAt(f)) es.length else binOf(es, a.getDouble(f))
        val off = slotOffsets(f) + b * stride
        if (k >= 0) buffer(off + k) += 1L
        buffer(off + numClasses) += 1L
        f += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufferLen) { buffer(i) += input(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val cells = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var f = 0
    while (f < numSlots) {
      val es = edgeArrays(f)
      var b = 0
      while (b <= es.length) {
        val off = slotOffsets(f) + b * stride
        val examples = buffer(off + numClasses)
        if (examples > 0L) {
          val row = new GenericInternalRow(stride + 2)
          row.setInt(0, f)
          // -0.0 edge -> 0.0: the hash aggregate normalizes float group
          // keys, so the melt's cell for a -0.0 edge reads back 0.0
          val v = if (b < es.length) es(b) else Double.PositiveInfinity
          row.setDouble(1, if (v == 0.0d) 0.0d else v)
          var c = 0
          while (c < numClasses) { row.setLong(2 + c, buffer(off + c)); c += 1 }
          row.setLong(2 + numClasses, examples)
          cells += row
        }
        b += 1
      }
      f += 1
    }
    new GenericArrayData(cells.toArray)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufferLen * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bufferLen)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PackedHistogramCells =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PackedHistogramCells =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PackedHistogramCells =
    copy(featuresArray = newChildren(0), classIndex = newChildren(1))
}
