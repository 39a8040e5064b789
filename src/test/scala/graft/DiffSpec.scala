package graft

import graft.ops.Diff

/** Keyed diff: insert/delete/update classification, null-safe compares,
  * unchanged rows absent. */
class DiffSpec extends SparkSpec {

  import spark.implicits._

  private def diff(
      l: Seq[(Long, Option[String], Option[Double])],
      r: Seq[(Long, Option[String], Option[Double])]) =
    Diff.keyedDiff(
      l.toDF("k", "s", "v"), r.toDF("k", "s", "v"), Seq("k"))
      .collect()
      .map(row => row.getLong(0) ->
        ((row.getString(1), row.getSeq[String](2).toList))).toMap

  test("classifies inserts, deletes, updates; drops unchanged") {
    val got = diff(
      l = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0)),
        (3L, Some("c"), Some(3.0))),
      r = Seq((1L, Some("a"), Some(1.0)),              // unchanged
        (2L, Some("B"), Some(2.5)),                    // both cols change
        (4L, Some("d"), Some(4.0))))                   // new key
    assert(got == Map(
      2L -> (("update", List("s", "v"))),
      3L -> (("delete", Nil)),
      4L -> (("insert", Nil))))
  }

  test("null-safe: NULL==NULL is no change, NULL->value is") {
    val got = diff(
      l = Seq((1L, None, Some(1.0)), (2L, None, None)),
      r = Seq((1L, Some("x"), Some(1.0)), (2L, None, None)))
    assert(got == Map(1L -> (("update", List("s")))))
  }

  test("payload columns present on only one side are ignored") {
    val l = Seq((1L, "a", 10)).toDF("k", "s", "only_left")
    val r = Seq((1L, "a", true)).toDF("k", "s", "only_right")
    assert(Diff.keyedDiff(l, r, Seq("k")).collect().isEmpty)
  }

  test("schemaDiff: added, removed, type_changed; identical schemas are empty") {
    val l = Seq((1L, "a", 10)).toDF("k", "s", "gone")
    val r = Seq((1L, 2.0, true)).toDF("k", "s", "novel")
    val got = Diff.schemaDiff(l, r).collect()
      .map(x => x.getString(0) -> ((x.getString(1),
        Option(x.getString(2)), Option(x.getString(3))))).toMap
    assert(got == Map(
      "s" -> (("type_changed", Some("string"), Some("double"))),
      "gone" -> (("removed", Some("int"), None)),
      "novel" -> (("added", None, Some("boolean")))))
    assert(Diff.schemaDiff(l, l).collect().isEmpty)
  }
}
