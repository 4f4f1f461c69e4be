package graft

/** Daemon-thread peak driver-JVM-heap sampler (the reference's headline
  * metric is peak memory — README.md:57-60). Construct once; the thread
  * samples every `intervalMs` until JVM exit.
  *
  * Two high-water marks per window, because they answer different
  * questions (tools/WideHeapProbe, r7):
  *   - RAW `totalMemory - freeMemory`: live data plus all uncollected
  *     garbage. G1 sizes its young gen (and Spark its on-heap execution
  *     pool) proportionally to -Xmx, so this number is a property of
  *     the HARNESS as much as of the code — the same wide fit sampled
  *     5.6 GB at Xmx=8g and 14 GB at Xmx=32g.
  *   - LIVE `MemoryPoolMXBean.getCollectionUsage`: heap occupancy
  *     immediately after the most recent collection of each pool — what
  *     actually survives GC, i.e. the number that would OOM an
  *     executor. Stable (~3 GB for the wide fit) across harness heap
  *     sizes.
  */
final class PeakHeapSampler(intervalMs: Long = 100) {
  private val peak = new java.util.concurrent.atomic.AtomicLong(0L)
  private val live = new java.util.concurrent.atomic.AtomicLong(0L)

  private val heapPools = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP).toIndexedSeq
  }

  locally {
    val t = new Thread(() => {
      val rt = Runtime.getRuntime
      while (true) {
        val used = rt.totalMemory() - rt.freeMemory()
        peak.updateAndGet(p => math.max(p, used))
        var liveNow = 0L
        heapPools.foreach { p =>
          val u = p.getCollectionUsage
          if (u != null) liveNow += u.getUsed
        }
        live.updateAndGet(p => math.max(p, liveNow))
        Thread.sleep(intervalMs)
      }
    }, "graft-peak-heap-sampler")
    t.setDaemon(true)
    t.start()
  }

  /** Zero the high-water marks (e.g. between measured phases). */
  def reset(): Unit = { peak.set(0L); live.set(0L) }

  /** Read-and-zero the raw high-water mark atomically: the returned peak
    * covers exactly the window since the previous drain, so a caller can
    * attribute heap to per-entry windows without losing samples between
    * them. */
  def drain(): Long = peak.getAndSet(0L)

  /** Read-and-zero the post-GC live high-water mark (same window
    * semantics as [[drain]]). Reads 0 when no collection happened in the
    * window — callers should treat 0 as "no evidence", not "no heap". */
  def drainLive(): Long = live.getAndSet(0L)

  def peakBytes: Long = peak.get()
  def livePeakBytes: Long = live.get()
}
