package graft

import org.apache.spark.sql.functions._

import graft.sink.Analyze

/** ANALYZE column statistics: typed extremes (numerics never compared
  * as strings), exact null/NDV accounting, unsupported types surfaced
  * with NULL stats instead of dropped. */
class AnalyzeSpec extends SparkSpec {

  import spark.implicits._

  test("columnStats: counts, nulls, NDV and typed extremes per column") {
    val df = Seq(
      (1L, Some(10.5), Some("b")),
      (2L, None, Some("a")),
      (9L, Some(-3.0), None),
      (10L, Some(10.5), Some("c")))
      .toDF("k", "v", "s")
    val got = Analyze.columnStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("k", "v", "s"))
    val k = got("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0 && k.getLong(3) == 4)
    // numeric ordering: min 1, max 10 (string ordering would say "10" < "9")
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 10.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val v = got("v")
    assert(v.getLong(1) == 4 && v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == -3.0 && v.getDouble(5) == 10.5)
    val s = got("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("unsupported column types keep their counts but surface NULL " +
    "ndv/extremes") {
    val df = Seq((1L, Seq(1, 2)), (2L, Seq(3)))
      .toDF("k", "arr")
    val got = Analyze.columnStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val arr = got("arr")
    assert(arr.getLong(1) == 2 && arr.getLong(2) == 0)
    assert(arr.isNullAt(3) && arr.isNullAt(4) && arr.isNullAt(6))
  }

  test("empty frame yields zero-count rows, not an empty stats table") {
    val df = Seq.empty[(Long, String)].toDF("k", "s")
    val got = Analyze.columnStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size == 2)
    assert(got("k").getLong(1) == 0 && got("k").isNullAt(4))
    assert(got("s").getLong(3) == 0)
  }
}
