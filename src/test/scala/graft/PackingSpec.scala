package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Sequence packing: block spans over the concatenated token stream must
  * be exact integer arithmetic, per-partition independent, and — the
  * regression this spec exists for — frame each row individually (ROWS)
  * rather than pooling rows tied on the order key (the default RANGE
  * frame's behavior, which silently corrupts spans). */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("contiguous spans: starts chain, blocks cover the stream") {
    val df = Seq((1L, 10L), (2L, 300L), (3L, 0L), (4L, 56L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packContiguous(df, "doc_id", "n_tokens", 256L)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "first_block", "last_block",
        "offset_in_block", "n_blocks")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L, 0L, 1L),     // tokens [0,10)
      (2L, 10L, 0L, 1L, 10L, 2L),   // tokens [10,310) straddles block 0→1
      (3L, 310L, 1L, 1L, 54L, 1L),  // zero-length: reports its start block
      (4L, 310L, 1L, 1L, 54L, 1L))) // tokens [310,366) inside block 1
  }

  test("partition columns pack independently") {
    val df = Seq(("en", 1L, 100L), ("en", 2L, 100L),
      ("de", 1L, 50L), ("de", 2L, 50L)).toDF("lang", "doc_id", "n_tokens")
    val out = Packing
      .packContiguous(df, "doc_id", "n_tokens", 128L, Seq("lang"))
      .select("lang", "doc_id", "tok_start")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("en", 1L, 0L), ("en", 2L, 100L),
      ("de", 1L, 0L), ("de", 2L, 50L)))
  }

  test("duplicate order keys get consecutive spans, not a pooled RANGE sum") {
    // Three rows tied on the order key. The default RANGE frame would sum
    // all ties together: every row would report tok_start = 30 - 10 = 20
    // and the spans would overlap. The explicit ROWS frame must hand out
    // consecutive disjoint spans {0, 10, 20} covering the stream exactly.
    val df = Seq((7L, 10L), (7L, 10L), (7L, 10L)).toDF("doc_id", "n_tokens")
    val starts = Packing.packContiguous(df, "doc_id", "n_tokens", 16L)
      .select("tok_start").as[Long].collect().toSeq.sorted
    assert(starts == Seq(0L, 10L, 20L))
    // and total stream length is preserved (no tokens double-counted)
    val spans = Packing.packContiguous(df, "doc_id", "n_tokens", 16L)
      .agg(max(col("tok_start") + col("n_tokens"))).as[Long].head()
    assert(spans == 30L)
  }
}
