package graft

import graft.ops.Profile

/** Column profiling: exact per-column stats, native-type min/max,
  * null accounting. */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("profiles counts, nulls, distincts, and native-ordered min/max") {
    val df = Seq(
      (1L, Some("b"), Some(10.0)),
      (2L, Some("a"), Some(2.5)),
      (2L, None, None),
      (9L, Some("a"), Some(100.0)))
      .toDF("id", "s", "x")
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(got("id") == ((4L, 0L, 3L, "1", "9")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    // numeric min/max must use NUMERIC ordering: 2.5 < 10.0 < 100.0
    // (lexicographic would say "10.0" < "100.0" < "2.5")
    assert(got("x")._4 == "2.5" && got("x")._5 == "100.0")
  }

  test("column subset and empty-selection guard") {
    val df = Seq((1L, "a")).toDF("id", "s")
    assert(Profile.profile(df, Seq("id")).count() == 1L)
    intercept[IllegalArgumentException] {
      Profile.profile(df.select())
    }
  }

  test("histogram: equi-width bins, max closes into last bin, nulls drop") {
    val df = Seq(
      ("a", Some(0.0)), ("a", Some(4.9)), ("a", Some(5.0)), ("a", Some(10.0)),
      ("a", None),
      ("b", Some(7.0)), ("b", Some(7.0))). // min == max group
      toDF("g", "v")
    val got = Profile.histogram(df, "g", "v", bins = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // group a spans [0,10]: bins [0,5) and [5,10]; 4.9→bin0, 5.0 & 10.0→bin1
    assert(got(("a", 0L)) == ((0.0, 5.0, 2L)))
    assert(got(("a", 1L)) == ((5.0, 10.0, 2L)))
    // degenerate group: everything in bin 0, zero-width bounds
    assert(got(("b", 0L)) == ((7.0, 7.0, 2L)))
    assert(got.size == 3) // the null row contributed nowhere
  }
}
