package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Gate-key hygiene across the SPLIT registries: a Scala Map literal
  * silently keeps the LAST entry for a duplicated key, so a re-used
  * gate name would shadow an existing gate (and could pair the
  * survivor with the WRONG oracle) without any compile- or run-time
  * signal. Found live: a second "ts_dtw" landed 3,400 lines away from
  * the first and knocked the board count from 409 to 408 before the
  * bench's nqueries surfaced it. Cross-FILE duplicates are refused at
  * runtime by SparkEntry.strictMerge; this spec reads the SOURCE of
  * every registry, where within-file duplicates are still visible. */
class GateKeySpec extends AnyFunSuite {

  private lazy val gateFiles: Seq[(String, String)] = {
    val gatesDir = Paths.get("src/main/scala/graft/gates")
    val files = Paths.get("src/main/scala/graft/SparkEntry.scala") +:
      Files.list(gatesDir).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".scala")).sortBy(_.toString)
    files.map(p => p.getFileName.toString -> new String(
      Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
  }

  test("every gate key is defined exactly once across ALL registry " +
      "sources (within-file dups a Map literal would swallow, and " +
      "cross-file dups strictMerge would refuse at runtime)") {
    val gatePat = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r
    val keys = gateFiles.flatMap { case (f, src) =>
      gatePat.findAllMatchIn(src).map(m => m.group(1) -> f)
    }
    val dups = keys.groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, fs) => s"$k(${fs.map(_._2).mkString("+")})" }
      .toSeq.sorted
    assert(dups.isEmpty, s"duplicate gate keys in source: ${dups.mkString(", ")}")
    assert(keys.map(_._1).toSet == SparkEntry.queries.keySet,
      "source scrape and runtime key set disagree — gate pattern drifted")
  }

  test("queries and oracleSql agree key-for-key") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"gates without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("no gate name appears more than twice across all sources (once " +
      "as gate, at most once as its own oracle key)") {
    val arrow = """"([a-z0-9_]+)" ->""".r
    val counts = gateFiles.flatMap { case (_, src) =>
      arrow.findAllMatchIn(src).map(_.group(1))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val gateKeys = SparkEntry.queries.keySet
    val over = gateKeys.filter(k => counts.getOrElse(k, 0) > 2).toSeq.sorted
    assert(over.isEmpty,
      s"gate keys bound more than twice (shadowing hazard): " +
        over.map(k => s"$k=${counts(k)}").mkString(", "))
  }

  test("each registry source stays within the ~3k-line maintainability " +
      "budget the r9 verdict set for the split") {
    val over = gateFiles.filter(_._2.count(_ == '\n') > 3000).map(_._1)
    assert(over.isEmpty, s"registry files over 3000 lines: $over")
  }

  test("SURVEY.md §2.8 inventory table reconciles key-for-key with the " +
      "gate board (r10 verdict: the table drifted 40 gates behind twice; " +
      "this makes a gate without its inventory row a failing build)") {
    val survey = new String(Files.readAllBytes(Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq
    val from = survey.indexWhere(_.startsWith("### 2.8"))
    val to = survey.indexWhere(_.startsWith("### 2.9"))
    assert(from >= 0 && to > from, "SURVEY.md §2.8/§2.9 headings moved")
    val keyPat = """`([a-z0-9_]+)`""".r
    val tableKeys = survey.slice(from, to).iterator
      .filter(_.startsWith("| "))
      .map(_.split("\\|")(1)) // first cell only: gate key(s), `/`-separated
      .filterNot(_.contains("(rows of")) // q_expectations' per-rule output
      // rows, documented in-table as NOT gate keys
      .flatMap(cell => keyPat.findAllMatchIn(cell).map(_.group(1)))
      .toSet
    val gates = SparkEntry.queries.keySet
    val missingRows = (gates -- tableKeys).toSeq.sorted
    val staleRows = (tableKeys -- gates).toSeq.sorted
    assert(missingRows.isEmpty,
      s"gates missing an inventory row in SURVEY §2.8: $missingRows")
    assert(staleRows.isEmpty,
      s"SURVEY §2.8 rows naming no existing gate: $staleRows")
  }
}
