package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Offline lint gate (≙ reference `.pre-commit-config.yaml:1-`, which runs
  * ruff/format checks on every commit). The build environment resolves no
  * new sbt plugins (zero egress), so `scalafmtCheckAll` cannot run here;
  * this spec enforces the mechanical core of the checked-in
  * `.scalafmt.conf` on every `sbt test` / CI run instead: no tabs, no
  * CRLF, no trailing whitespace, newline at EOF, maxColumn 120.
  * Networked dev machines additionally run scalafmt with the committed
  * config (same maxColumn), so the two gates agree.
  */
class StyleSpec extends AnyFunSuite {

  private def sourceFiles: Seq[Path] = {
    val roots = Seq("src/main/scala", "src/test/scala").map(Paths.get(_))
    roots.filter(Files.exists(_)).flatMap { r =>
      val stream = Files.walk(r)
      try stream.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
      finally stream.close()
    }
  }

  test("no tabs, CRLF, or trailing whitespace; newline at EOF; maxColumn 120") {
    val files = sourceFiles
    assert(files.nonEmpty, "style gate found no sources — wrong working dir?")
    val violations = files.flatMap { f =>
      val text = new String(Files.readAllBytes(f), "UTF-8")
      val vs = scala.collection.mutable.Buffer[String]()
      if (text.contains('\t')) vs += s"$f: tab character"
      if (text.contains('\r')) vs += s"$f: CRLF line ending"
      if (text.nonEmpty && !text.endsWith("\n")) vs += s"$f: missing newline at EOF"
      text.split("\n", -1).zipWithIndex.foreach { case (l, i) =>
        if (l.length > 120) vs += s"$f:${i + 1}: ${l.length} chars (maxColumn 120)"
        if (l.nonEmpty && (l.last == ' ' || l.last == '\t'))
          vs += s"$f:${i + 1}: trailing whitespace"
      }
      vs
    }
    assert(violations.isEmpty, "style violations:\n" + violations.mkString("\n"))
  }
}
