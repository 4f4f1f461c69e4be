package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 100k rows, two INDEPENDENT uniform dims in [0, 1000) */
  private def data: DataFrame =
    spark.range(0L, 100000L).select(
      col("id"),
      (abs(xxhash64(col("id"), lit(1))) % 1000).cast("double").as("x"),
      (abs(xxhash64(col("id"), lit(2))) % 1000).cast("double").as("y"))

  /** per-row-group column [min, max] stats straight from the parquet
    * footers — the exact information scan-time row-group pruning uses */
  private def rowGroupBounds(path: String): Seq[Map[String, (Double, Double)]] = {
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    parts.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration()))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          block.getColumns.asScala.map { c =>
            val st = c.getStatistics
            c.getPath.toDotString -> (
              st.genericGetMin.asInstanceOf[Number].doubleValue(),
              st.genericGetMax.asInstanceOf[Number].doubleValue())
          }.toMap
        }
      } finally reader.close()
    }
  }

  private def overlapping(groups: Seq[Map[String, (Double, Double)]],
      box: Map[String, (Double, Double)]): Int =
    groups.count { g =>
      box.forall { case (k, (lo, hi)) =>
        val (mn, mx) = g(k)
        mx >= lo && mn <= hi
      }
    }

  private lazy val layouts: (String, String) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder")
      .toFile.getAbsolutePath
    val zPath = s"$tmp/z"
    val sPath = s"$tmp/s"
    ZOrder.writeZOrdered(data, zPath, Seq("x", "y"),
      bits = 8, numFiles = 4, rowGroupBytes = Some(64 * 1024))
    data.repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").option("parquet.block.size", 64 * 1024)
      .parquet(sPath)
    (zPath, sPath)
  }

  test("z-ordered row groups prune on the NON-leading dimension; a 1-D sort cannot") {
    val (zPath, sPath) = layouts
    val zg = rowGroupBounds(zPath)
    val sg = rowGroupBounds(sPath)
    assert(zg.size >= 8, s"need several row groups to measure pruning, got ${zg.size}")
    assert(sg.size >= 8)
    val yOnly = Map("y" -> (100.0, 199.0)) // 10% of the y range
    // >= 90% rather than == 100%: a TINY trailing row group (the parquet
    // writer's flush cadence decides where groups split, so one appears
    // nondeterministically) can statistically miss a 10% y-band
    // (0.9^n is non-negligible at n ~ 10 rows) — the contract under
    // test is "x-sort can't prune y", not "every last sliver overlaps"
    val sHitY = overlapping(sg, yOnly)
    assert(sHitY * 10 >= sg.size * 9,
      s"the x-sorted layout must be (nearly) unable to prune a y predicate: " +
        s"$sHitY of ${sg.size} groups overlap")
    val zHitY = overlapping(zg, yOnly)
    assert(zHitY * 2 <= zg.size,
      s"z-order must prune most row groups on y: $zHitY of ${zg.size} overlap")
  }

  test("2-D box predicates prune under z-order at least as well as the 1-D sort") {
    val (zPath, sPath) = layouts
    val zg = rowGroupBounds(zPath)
    val sg = rowGroupBounds(sPath)
    val box = Map("x" -> (100.0, 199.0), "y" -> (100.0, 199.0))
    val zHit = overlapping(zg, box)
    val sHit = overlapping(sg, box)
    assert(zHit <= sHit, s"z-order box overlap $zHit should not exceed 1-D sort's $sHit")
    assert(zHit * 3 <= zg.size, s"the 1% box should prune most groups: $zHit of ${zg.size}")
  }

  test("z-ordered data reads back complete and filter-correct") {
    val (zPath, _) = layouts
    val back = spark.read.parquet(zPath)
    assert(back.count() == 100000L)
    val expect = data.where(col("x").between(100, 199) && col("y").between(100, 199)).count()
    val got = back.where(col("x").between(100, 199) && col("y").between(100, 199)).count()
    assert(got == expect && got > 0)
  }

  test("zValue interleaves bits: (x=0b11, y=0b01) at 2 bits -> 0b0111") {
    val v = spark.range(1)
      .select(ZOrder.zValue(Seq(lit(3L), lit(1L)), 2).as("z"))
      .head().getLong(0)
    assert(v == 7L)
  }

  test("scaled clamps to the grid and survives degenerate bounds") {
    val r = spark.range(1).select(
      ZOrder.scaled(lit(-5.0), lit(0.0), lit(10.0), 4).as("under"),
      ZOrder.scaled(lit(99.0), lit(0.0), lit(10.0), 4).as("over"),
      ZOrder.scaled(lit(5.0), lit(0.0), lit(10.0), 4).as("mid"),
      ZOrder.scaled(lit(7.0), lit(7.0), lit(7.0), 4).as("degenerate")).head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 15L)
    assert(r.getLong(2) == 8L)
    assert(r.getLong(3) == 0L)
  }
}
