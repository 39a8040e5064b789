package graft

import graft.ops.Scd2

/** SCD Type-2: close+open on change, no-op and late changes ignored,
  * history passthrough, new keys open at their change ts. */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def dim(rows: (Long, String, Option[Long], Long)*) =
    rows.toSeq.toDF("k", "seg", "valid_to_us", "valid_from_us")
      .select($"k", $"seg", $"valid_from_us", $"valid_to_us")

  private def run(
      d: org.apache.spark.sql.DataFrame,
      ch: Seq[(Long, String, Long)]) =
    Scd2.applyChanges(d, ch.toDF("k", "seg", "ts"), "k", "ts", Seq("seg"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet

  test("real change closes the current version and opens a new one") {
    val d = dim((1L, "A", None, 0L))
    assert(run(d, Seq((1L, "B", 100L))) == Set(
      (1L, "A", 0L, Some(100L)), (1L, "B", 100L, None)))
  }

  test("no-op change and late change keep the current version") {
    val d = dim((1L, "A", None, 50L), (2L, "X", None, 50L))
    assert(run(d, Seq((1L, "A", 300L), (2L, "Y", 10L))) == Set(
      (1L, "A", 50L, None), (2L, "X", 50L, None)))
  }

  test("new key opens at its ts; unmentioned keys pass through") {
    val d = dim((1L, "A", None, 0L))
    assert(run(d, Seq((9L, "N", 700L))) == Set(
      (1L, "A", 0L, None), (9L, "N", 700L, None)))
  }

  test("closed history rows pass through untouched") {
    val d = dim((1L, "OLD", Some(40L), 0L), (1L, "A", None, 40L))
    assert(run(d, Seq((1L, "B", 90L))) == Set(
      (1L, "OLD", 0L, Some(40L)),
      (1L, "A", 40L, Some(90L)),
      (1L, "B", 90L, None)))
  }
}
