ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "efficienttreesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses ONE bare JSON line from `sbt runMain graft.Bench`
// stdout; sbt's default logger prefixes forked output with "[info] ",
// which breaks that parse (BENCH_r02.json: rc=0, parsed=null). Pass the
// forked JVM's stdout/stderr straight through instead.
run / connectInput := true
outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~100 bench entries compile thousands of whole-stage-codegen classes
  // in one JVM; the JDK 17 default 240 MB code cache overflows mid-sweep
  // and flushes hot methods, so later sweeps re-JIT what the warmup
  // already compiled (r10: wide190 min-of-3 at 32.5 s vs 10.8 s steady
  // state in a churn-free JVM — tools/WideHeapProbe). Headroom makes the
  // bench's min-of-interleaved-sweeps measure warm capability again.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
  // Tiered compilation pinned EXPLICITLY to the JDK 17 default (on, all
  // levels) so the bench JVM's compilation mode is recorded, not
  // inherited: the wide190 fit swings ~2x between full runs and the
  // r11 root cause was JIT state (code-cache flush); Bench now also
  // reports per-CodeHeap peak occupancy in its JSON so reserve vs use
  // is a per-round number.
  "-XX:+TieredCompilation",
  // JDK 17 G1 can throw a spurious OOM ("Retried waiting for GCLocker
  // too often") when allocation lands while a JNI critical region
  // (parquet/compression codecs) holds the GC lock — seen on the 100x
  // fuzzy_clusters probe. Raising the retry count from the default 2
  // is the standard mitigation for Spark-on-17 deployments.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
  // NOTE on "peak heap" measurements: raw used-heap sampling is a
  // function of the harness's -Xmx, not just of the code — G1 sizes its
  // young gen up to 60% of the heap, and Spark's on-heap execution pool
  // also scales with it, so the same workload samples to 5.6 GB at
  // Xmx=8g and 14 GB at Xmx=32g with an identical ~3 GB post-GC live
  // set (measured: tools/WideHeapProbe; the r6 15.9/5.8/3.9 GB
  // wide-fit spread across harnesses). Bench therefore reports
  // peak_live_gb (post-collection usage) alongside the raw peak.
  // A pinned nursery (-Xmn2g) was tried and REJECTED: it pushed
  // short-lived execution pages into the old gen (gcTime 1.3 -> 13.8 s
  // on the wide fit) without bounding the raw peak.
)
