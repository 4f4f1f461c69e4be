package graft.tools

import org.apache.spark.sql.catalyst.util.QuantileSummaries

/** Dev microbench: single-thread cost of QuantileSummaries.insert at the
  * fit's relative error (1/128), plus compress, to locate where the wide
  * fit's bin-edge pass spends its time.
  */
object GkMicrobench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(600000)
    val rnd = new java.util.Random(42)
    val values = Array.fill(n)(rnd.nextDouble() * 1000)
    (1 to 3).foreach { round =>
      var s = new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, 1.0 / 128)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { s = s.insert(values(i)); i += 1 }
      val tIns = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      s = s.compress()
      val tCmp = (System.nanoTime() - t1) / 1e9
      println(f"[gk] round $round n=$n insert=${tIns}%.2fs (${tIns / n * 1e9}%.0f ns/op) " +
        f"compress=${tCmp}%.3fs sampled=${s.sampled.length}")
    }
    // 190 summaries round-robin (the actual update pattern): locality check
    val k = 190
    val per = n / k
    val arr = Array.fill(k)(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, 1.0 / 128))
    val t0 = System.nanoTime()
    var i = 0
    while (i < per) {
      var f = 0
      while (f < k) { arr(f) = arr(f).insert(values(i * k % n + f % 97)); f += 1 }
      i += 1
    }
    val tIns = (System.nanoTime() - t0) / 1e9
    println(f"[gk] interleaved k=$k total=${per * k} insert=${tIns}%.2fs (${tIns / (per * k) * 1e9}%.0f ns/op)")
  }
}
