package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items (heavy-hitters) summary over a string
  * column, as a Catalyst `TypedImperativeAggregate`.
  *
  * The 100 TB story: discovering hot n-grams (boilerplate shingles, stop
  * tokens) with an exact `groupBy(gram).count` shuffles EVERY distinct
  * gram — at corpus scale the gram dictionary is itself the biggest
  * table in the job. This aggregate keeps a bounded `capacity`-entry
  * summary per task, partial-merges map-side like any other aggregate,
  * and ships only `capacity` (item, count) pairs per partition — the
  * whole job is one narrow pass over the corpus plus a tiny final merge,
  * no gram-keyed shuffle at all. The summaries merge losslessly in the
  * Agarwal et al. "Mergeable Summaries" (PODS '12) sense: the merged
  * bound is the same `N / (capacity + 1)` as a single-pass summary's.
  *
  * Guarantees (classic Misra–Gries, weak form of SpaceSaving):
  *  - every item with true count > N / (capacity + 1) is present
  *    (N = total items aggregated);
  *  - reported counts UNDER-estimate: `true - maxErr <= n <= true`,
  *    where `maxErr` (emitted alongside the items) is the cumulative
  *    decrement the summary actually applied — `0` means every reported
  *    count is exact, which is guaranteed whenever the global distinct
  *    cardinality fits in `capacity` (that regime is what the DuckDB
  *    oracle pins; the approximate regime is property-tested).
  *
  * Output: struct<items: array<struct<item string, n long>>, max_err
  * long, total long> — items sorted (n desc, item asc), callers explode
  * and limit. Null child values are skipped (SQL aggregate convention).
  *
  * Reference context: the reference pipeline has no bounded-memory
  * frequency operator (its corpora fit exact counting); this is part of
  * the builder-brief LLM-pipeline surface (stop-gram discovery feeding
  * [[graft.operators.Dedup.jaccardPairs]]'s `maxDf` cap and vocabulary
  * pruning at crawl scale).
  */
case class FrequentItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[FrequentItemsSketch.Buffer] {
  import FrequentItemsSketch.Buffer

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FrequentItemsSketch.Schema
  override def prettyName: String = "frequent_items_sketch"

  override def createAggregationBuffer(): Buffer = new Buffer(capacity)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    // clone: the UTF8String may point into a reused row buffer
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].clone(), 1L)
    buffer
  }

  override def merge(buffer: Buffer, input: Buffer): Buffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: Buffer): Any = {
    val entries = buffer.sortedEntries
    val rows: Array[Any] = entries.map { case (item, n) =>
      new GenericInternalRow(Array[Any](item, n)): Any
    }
    new GenericInternalRow(
      Array[Any](new GenericArrayData(rows), buffer.maxErr, buffer.total))
  }

  override def serialize(buffer: Buffer): Array[Byte] = {
    val entries = buffer.entriesRaw
    var size = 4 + 8 + 8 + 4
    entries.foreach { case (item, _) => size += 4 + item.numBytes() + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(capacity)
    bb.putLong(buffer.maxErr)
    bb.putLong(buffer.total)
    bb.putInt(entries.length)
    entries.foreach { case (item, n) =>
      val bytes = item.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(n)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val cap = bb.getInt()
    val buf = new Buffer(cap)
    buf.maxErr = bb.getLong()
    buf.total = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.putRaw(UTF8String.fromBytes(b), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItemsSketch =
    copy(child = newChildren.head)
}

object FrequentItemsSketch {
  val Schema: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("max_err", LongType, nullable = false),
    StructField("total", LongType, nullable = false)))

  /** Mutable Misra–Gries state. Counts live in a plain HashMap with a
    * mutable holder (no per-increment boxing on the hit path — the hot
    * case at scale, where a handful of grams dominate the stream). */
  final class Buffer(val capacity: Int) {
    private val counts = new java.util.HashMap[UTF8String, Holder]()
    /** cumulative decrement applied — the max undercount of any count */
    var maxErr: Long = 0L
    /** total (non-null) items observed */
    var total: Long = 0L

    def add(item: UTF8String, w: Long): Unit = {
      total += w
      val h = counts.get(item)
      if (h != null) h.n += w
      else if (counts.size() < capacity) counts.put(item, new Holder(w))
      else {
        // overflow: decrement everything by the incoming weight (the
        // batched form of MG's decrement-all-by-1, error-equivalent),
        // dropping entries that hit zero. Amortized O(1) per insert:
        // each sweep destroys (capacity+1)*w units of count mass.
        maxErr += w
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue.n -= w
          if (e.getValue.n <= 0L) it.remove()
        }
      }
    }

    /** restore a serialized entry verbatim (no MG bookkeeping) */
    def putRaw(item: UTF8String, n: Long): Unit = counts.put(item, new Holder(n))

    /** Mergeable-summaries combine: sum counts, then if over capacity
      * subtract the (capacity+1)-th largest count from everything and
      * drop the non-positive tail. Error adds: errA + errB + subtracted. */
    def mergeIn(other: Buffer): Unit = {
      total += other.total
      maxErr += other.maxErr
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val h = counts.get(e.getKey)
        if (h != null) h.n += e.getValue.n
        else counts.put(e.getKey, new Holder(e.getValue.n))
      }
      if (counts.size() > capacity) {
        val ns = new Array[Long](counts.size())
        var i = 0
        val vit = counts.values().iterator()
        while (vit.hasNext) { ns(i) = vit.next().n; i += 1 }
        java.util.Arrays.sort(ns)
        // (capacity+1)-th largest = index size-capacity-1 ascending
        val cut = ns(ns.length - capacity - 1)
        maxErr += cut
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          e.getValue.n -= cut
          if (e.getValue.n <= 0L) eit.remove()
        }
      }
    }

    def entriesRaw: Array[(UTF8String, Long)] = {
      val out = new Array[(UTF8String, Long)](counts.size())
      var i = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue.n); i += 1 }
      out
    }

    /** (n desc, item asc-binary) — deterministic regardless of hash order */
    def sortedEntries: Array[(UTF8String, Long)] = {
      val out = entriesRaw
      java.util.Arrays.sort(out, new java.util.Comparator[(UTF8String, Long)] {
        override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2)
          if (c != 0) c else a._1.compareTo(b._1)
        }
      })
      out
    }
  }

  private final class Holder(var n: Long)
}
