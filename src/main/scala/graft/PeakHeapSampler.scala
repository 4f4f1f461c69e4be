package graft

/** Daemon-thread peak driver-JVM-heap sampler (the reference's headline
  * metric is peak memory — README.md:57-60). Construct once; the thread
  * samples `totalMemory - freeMemory` every `intervalMs` until JVM exit. */
final class PeakHeapSampler(intervalMs: Long = 100) {
  private val peak = new java.util.concurrent.atomic.AtomicLong(0L)
  locally {
    val t = new Thread(() => {
      val rt = Runtime.getRuntime
      while (true) {
        val used = rt.totalMemory() - rt.freeMemory()
        peak.updateAndGet(p => math.max(p, used))
        Thread.sleep(intervalMs)
      }
    }, "graft-peak-heap-sampler")
    t.setDaemon(true)
    t.start()
  }

  /** Zero the high-water mark (e.g. between measured phases). */
  def reset(): Unit = peak.set(0L)

  /** Read-and-zero the high-water mark atomically: the returned peak covers
    * exactly the window since the previous drain, so a caller can attribute
    * heap to per-entry windows without losing samples between them. */
  def drain(): Long = peak.getAndSet(0L)

  def peakBytes: Long = peak.get()
}
