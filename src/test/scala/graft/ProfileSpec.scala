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
}
