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
  * Memory discipline: inserts NEVER touch QuantileSummaries' boxed head
  * buffer. Each feature stages raw values in a PRIMITIVE double array of
  * [[MultiQuantileSketch.foldEvery]] slots; a full stage is sorted in
  * place and folded into the summary as an exact pre-sorted batch
  * (Stats(v, g=1, delta=0) — the zero-error GK representation) via the
  * public merge + compress, the same per-partition-summary merge
  * distributed GK already relies on. Two effects: a task's whole pending
  * state is a flat [[MultiQuantileSketch.PendingBudget]] doubles
  * (~6 MB at width 190, no object headers), and the per-insert
  * `java.lang.Double` allocation disappears — at 600k x 190 that was
  * ~114M transient boxes per pass, the churn that made the wide fit's
  * sampled heap peak a function of the harness's GC cadence
  * (tools/WideHeapProbe). The GK error bound is unaffected by fold
  * frequency or batch folding.
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
      // stage arrays allocate lazily on first insert: merge-side buffers
      // (deserialize) never stage, and must not pay width x foldEvery
      new Array[Array[Double]](numFeatures),
      new Array[Int](numFeatures))

  /** Fold feature `f`'s staged primitives into its summary: sort the
    * stage in place, wrap it as an exact compressed summary
    * (Stats(v, 1, 0) sorted — zero rank error by construction), merge,
    * re-bound to `relativeError`. The stage array is REUSED across
    * folds — no per-fold reallocation. */
  private def flush(buffer: Buffer, f: Int): Unit = {
    val n = buffer.pending(f)
    if (n > 0) {
      val stage = buffer.staged(f)
      java.util.Arrays.sort(stage, 0, n)
      val stats = new Array[QuantileSummaries.Stats](n)
      var i = 0
      while (i < n) { stats(i) = QuantileSummaries.Stats(stage(i), 1, 0); i += 1 }
      val batch = new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, relativeError, stats, n, true)
      val s = buffer.summaries(f)
      buffer.summaries(f) =
        (if (s.count == 0) batch else s.merge(batch)).compress()
      buffer.pending(f) = 0
    }
  }

  private def flushAll(buffer: Buffer): Unit = {
    var f = 0
    while (f < numFeatures) { flush(buffer, f); f += 1 }
  }

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val arr = featuresArray.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val staged = buffer.staged
      val pending = buffer.pending
      var f = 0
      while (f < numFeatures) {
        if (!a.isNullAt(f)) {
          val v = a.getDouble(f)
          if (!java.lang.Double.isNaN(v)) {
            var st = staged(f)
            if (st == null) { st = new Array[Double](foldEvery); staged(f) = st }
            st(pending(f)) = v
            pending(f) += 1
            if (pending(f) >= foldEvery) flush(buffer, f)
          }
        }
        f += 1
      }
    }
    buffer
  }

  override def merge(buffer: Buffer, input: Buffer): Buffer = {
    flushAll(buffer)
    flushAll(input)
    var f = 0
    while (f < numFeatures) {
      val a = buffer.summaries(f) // compressed: flush/deserialize guarantee it
      val b = input.summaries(f)
      buffer.summaries(f) = if (b.count == 0) a else if (a.count == 0) b else a.merge(b)
      f += 1
    }
    buffer
  }

  override def eval(buffer: Buffer): Any = {
    flushAll(buffer)
    new GenericArrayData(buffer.summaries.map { s0 =>
      val s = if (s0.compressed) s0 else s0.compress()
      if (s.count == 0) new GenericArrayData(Array.empty[Double])
      else new GenericArrayData(probabilities.map(p => s.query(p).get).toArray)
    })
  }

  /** Stats triples written raw — QuantileSummaries' sampled array is its
    * whole state besides the scalars. */
  override def serialize(buffer: Buffer): Array[Byte] = {
    flushAll(buffer)
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
    new Buffer(summaries, new Array[Array[Double]](numFeatures),
      new Array[Int](numFeatures))
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
  /** Staged-insert budget for a whole task's buffer (all features
    * together): each feature's stage holds `PendingBudget / numFeatures`
    * primitive doubles, clamped to [4096, 50000]. The lower the stage
    * the more sort+merge folds; the higher, the more live (primitive)
    * pending state — PendingBudget doubles is ~6 MB per task buffer, a
    * non-issue. 50000 matches the stock head size for parity with
    * narrow-width behavior; at 190 features this lands ~4k. Fold
    * frequency never affects the GK error bound. */
  val PendingBudget = 786432

  def foldEvery(numFeatures: Int): Int =
    math.min(50000, math.max(4096, PendingBudget / numFeatures))

  /** Per-feature summaries, reusable primitive staging arrays
    * (foldEvery slots each), and stage fill counters. */
  final class Buffer(
      val summaries: Array[QuantileSummaries],
      val staged: Array[Array[Double]],
      val pending: Array[Int])
}
