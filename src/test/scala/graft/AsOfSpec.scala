package graft

import graft.ops.AsOf

/** As-of join semantics: latest right row at-or-before each left row. */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private val right = Seq(
    (1L, 10L, "r10"), (1L, 20L, "r20"), (1L, 30L, "r30"),
    (2L, 100L, "s100")).toDF("k", "rt", "rv")

  test("picks the latest right row with rt <= lt; none -> NULL") {
    val left = Seq(
      (1L, 5L, "before-any"), (1L, 20L, "exact-tie"),
      (1L, 25L, "between"), (1L, 99L, "after-all"),
      (2L, 100L, "other-key"), (3L, 50L, "unknown-key"))
      .toDF("k", "lt", "tag")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv"))
      .collect().map(r => r.getAs[String]("tag") ->
        ((Option(r.getAs[java.lang.Long]("asof_rt")).map(_.toLong),
          Option(r.getAs[String]("asof_rv"))))).toMap
    assert(got("before-any") == ((None, None)))
    assert(got("exact-tie") == ((Some(20L), Some("r20")))) // inclusive <=
    assert(got("between") == ((Some(20L), Some("r20"))))
    assert(got("after-all") == ((Some(30L), Some("r30"))))
    assert(got("other-key") == ((Some(100L), Some("s100"))))
    assert(got("unknown-key") == ((None, None)))
  }

  test("forward: picks the EARLIEST right row with rt >= lt; " +
    "inclusive edge; ties by greatest tie tuple") {
    val left = Seq(
      (1L, 5L, "before-any"), (1L, 20L, "exact-tie"),
      (1L, 25L, "between"), (1L, 99L, "after-all"),
      (3L, 50L, "unknown-key")).toDF("k", "lt", "tag")
    val got = AsOf.joinAsOfForward(
      left, right, Seq("k"), "lt", "rt", Seq("rt", "rv"))
      .collect().map(r => r.getAs[String]("tag") ->
        ((Option(r.getAs[java.lang.Long]("asof_rt")).map(_.toLong),
          Option(r.getAs[String]("asof_rv"))))).toMap
    assert(got("before-any") == ((Some(10L), Some("r10"))))
    assert(got("exact-tie") == ((Some(20L), Some("r20")))) // inclusive >=
    assert(got("between") == ((Some(30L), Some("r30"))))
    assert(got("after-all") == ((None, None))) //     nothing follows
    assert(got("unknown-key") == ((None, None)))
    // equal-(key, ts) right rows: greatest tie tuple wins, same as back
    val dupRight = Seq((1L, 10L, 1L, "low"), (1L, 10L, 9L, "high"))
      .toDF("k", "rt", "seq", "rv")
    val one = AsOf.joinAsOfForward(
      Seq((1L, 5L, "x")).toDF("k", "lt", "tag"), dupRight,
      Seq("k"), "lt", "rt", Seq("rv"), rightTieBreakCols = Seq("seq"))
      .collect().head.getAs[String]("asof_rv")
    assert(one == "high")
  }

  test("NULL value in the matched right row stays NULL (no back-fill stitch)") {
    // r2 is the latest match but carries a NULL value: ASOF semantics
    // return (rt=20, NULL), never rt=20 paired with r1's value.
    val r = Seq(
      (1L, 10L, Option("r10")),
      (1L, 20L, Option.empty[String])).toDF("k", "rt", "rv")
    val left = Seq((1L, 25L, "probe")).toDF("k", "lt", "tag")
    val row = AsOf.joinAsOf(left, r, Seq("k"), "lt", "rt", Seq("rt", "rv")).head()
    assert(row.getAs[java.lang.Long]("asof_rt") == 20L)
    assert(row.getAs[String]("asof_rv") == null)
  }

  test("NULL right timestamp never becomes a phantom match") {
    val r = Seq(
      (1L, Option.empty[java.lang.Long], "null-ts"),
      (1L, Option(50L).map(Long.box), "r50")).toDF("k", "rt", "rv")
    val left = Seq((1L, 10L, "before-any-real"), (1L, 60L, "after-r50"))
      .toDF("k", "lt", "tag")
    val got = AsOf.joinAsOf(left, r, Seq("k"), "lt", "rt", Seq("rv"))
      .collect().map(x => x.getAs[String]("tag") ->
        Option(x.getAs[String]("asof_rv"))).toMap
    assert(got("before-any-real").isEmpty) // NULL-ts row must not match
    assert(got("after-r50").contains("r50"))
  }

  test("equal (key, ts) right rows resolve by the tie-break column") {
    val r = Seq((1L, 20L, 1L, "low"), (1L, 20L, 9L, "high"))
      .toDF("k", "rt", "seq", "rv")
    val left = Seq((1L, 25L, "probe")).toDF("k", "lt", "tag")
    val row = AsOf.joinAsOf(left, r, Seq("k"), "lt", "rt", Seq("rv"),
      rightTieBreakCols = Seq("seq")).head()
    assert(row.getAs[String]("asof_rv") == "high") // greatest tie tuple wins
  }

  test("tolerance: stale matches null out together, matched flag reports") {
    val left = Seq(
      (1L, 12L, "fresh"),      // gap 2 from rt=10 → within tol 5
      (1L, 26L, "stale"),      // gap 6 from rt=20 → beyond tol 5
      (1L, 30L, "exact-edge"), // gap 0 from rt=30
      (3L, 50L, "no-match"))   // no right rows at all
      .toDF("k", "lt", "tag")
    val got = AsOf.joinAsOfTolerance(left, right, Seq("k"), "lt", "rt",
        Seq("rt", "rv"), toleranceUs = 5L)
      .collect().map(r => r.getAs[String]("tag") ->
        ((Option(r.getAs[java.lang.Long]("asof_rt")).map(_.toLong),
          Option(r.getAs[String]("asof_rv")),
          r.getAs[Boolean]("asof_matched")))).toMap
    assert(got("fresh") == ((Some(10L), Some("r10"), true)))
    // the stale match must drop BOTH columns, not just one
    assert(got("stale") == ((None, None, false)))
    assert(got("exact-edge") == ((Some(30L), Some("r30"), true)))
    assert(got("no-match") == ((None, None, false)))
  }

  test("left rows and payload survive unchanged; one output row per left row") {
    val left = (0L until 50L).map(i => (1L, i, s"p$i")).toDF("k", "lt", "payload")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "lt", "rt", Seq("rv"))
    assert(out.count() == 50L)
    assert(out.columns.toSeq == Seq("k", "lt", "payload", "asof_rv"))
    assert(out.filter($"payload".startsWith("p")).count() == 50L)
  }
}
