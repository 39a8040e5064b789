package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Gate-key hygiene: a Scala Map literal silently keeps the LAST entry
  * for a duplicated key, so a re-used gate name would shadow an
  * existing gate (and could pair the survivor with the WRONG oracle)
  * without any compile- or run-time signal. Found live: a second
  * "ts_dtw" landed 3,400 lines away from the first and knocked the
  * board count from 409 to 408 before the bench's nqueries surfaced
  * it. This spec reads the SOURCE, where duplicates are still
  * visible. */
class GateKeySpec extends AnyFunSuite {

  private lazy val src = new String(Files.readAllBytes(
    Paths.get("src/main/scala/graft/SparkEntry.scala")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("every gate key is defined exactly once in the queries map") {
    val gatePat = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r
    val keys = gatePat.findAllMatchIn(src).map(_.group(1)).toSeq
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate gate keys in source: ${dups.mkString(", ")}")
    assert(keys.toSet == SparkEntry.queries.keySet,
      "source scrape and runtime key set disagree — gate pattern drifted")
  }

  test("queries and oracleSql agree key-for-key") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"gates without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("no gate name appears more than twice in source (once as gate, " +
      "at most once as its own oracle key)") {
    val arrow = """"([a-z0-9_]+)" ->""".r
    val counts = arrow.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val gateKeys = SparkEntry.queries.keySet
    val over = gateKeys.filter(k => counts.getOrElse(k, 0) > 2).toSeq.sorted
    assert(over.isEmpty,
      s"gate keys bound more than twice (shadowing hazard): " +
        over.map(k => s"$k=${counts(k)}").mkString(", "))
  }
}
