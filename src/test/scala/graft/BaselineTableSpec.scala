package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.BaselineTargets]] (the literals the emitted `baseline`
  * block compares against) to the BASELINE.md §2 table — re-measuring
  * floors and updating only one of the two is the silent-drift class
  * ADVICE r13 flagged. The doc is the human-audited source; the code
  * literals must follow it.
  */
class BaselineTableSpec extends AnyFunSuite {

  /** Parse §2's measured table: each row's backticked entry names zipped
    * with the measured column's numbers (parentheticals stripped — B7's
    * "(68.2k rec/s ...)" must not parse as a floor). */
  private def docTargets: Map[String, Double] = {
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BASELINE.md")), "UTF-8").linesIterator.toSeq
    val entryRe = """`([^`]+)`""".r
    val numRe = """\d+\.\d+""".r
    lines.filter(l => l.startsWith("| B") && l.count(_ == '|') >= 6).flatMap { l =>
      val cells = l.split("\\|").map(_.trim)
      // cells(0) is empty (leading pipe): cells(3)=entry, cells(4)=measured
      val entries = entryRe.findAllMatchIn(cells(3)).map(_.group(1)).toSeq
      val measured = numRe.findAllIn(cells(4).replaceAll("\\(.*?\\)", "")).toSeq
      entries.zip(measured.map(_.toDouble))
    }.toMap
  }

  /** Same parse for the "BenchOne med3" column (the fresh-JVM
    * population targets) — cell index 6, parentheticals stripped so
    * B2's "(anchor floor __anchor_med 0.261)" note doesn't parse. */
  private def docBenchOneTargets: Map[String, Double] = {
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BASELINE.md")), "UTF-8").linesIterator.toSeq
    val entryRe = """`([^`]+)`""".r
    val numRe = """\d+\.\d+""".r
    lines.filter(l => l.startsWith("| B") && l.count(_ == '|') >= 7).flatMap { l =>
      val cells = l.split("\\|").map(_.trim)
      val entries = entryRe.findAllMatchIn(cells(3)).map(_.group(1)).toSeq
      val med3 = numRe.findAllIn(cells(6).replaceAll("\\(.*?\\)", "")).toSeq
      entries.zip(med3.map(_.toDouble))
    }.toMap
  }

  test("Bench.BaselineTargets literals match the BASELINE.md section-2 table") {
    val doc = docTargets
    assert(doc.nonEmpty, "BASELINE.md section-2 table parsed empty")
    Bench.BaselineTargets.foreach { case (entry, value) =>
      assert(doc.contains(entry),
        s"$entry is in Bench.BaselineTargets but not in the BASELINE.md table")
      assert(doc(entry) == value,
        s"$entry: code says $value, BASELINE.md says ${doc(entry)} — " +
          "update both together")
    }
  }

  test("Bench.BaselineTargetsBenchOne literals match the doc's BenchOne med3 column") {
    val doc = docBenchOneTargets
    assert(doc.nonEmpty, "BenchOne med3 column parsed empty")
    Bench.BaselineTargetsBenchOne.foreach { case (entry, value) =>
      assert(doc.contains(entry),
        s"$entry is in BaselineTargetsBenchOne but not in the doc column")
      assert(doc(entry) == value,
        s"$entry: code says $value, BASELINE.md med3 column says " +
          s"${doc(entry)} — update both together")
    }
  }
}
