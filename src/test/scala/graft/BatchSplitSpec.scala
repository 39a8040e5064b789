package graft

import graft.ops.BatchSplit

/** Chunk-plan arithmetic vs the reference's split fixtures
  * (quick_stream `src/upsert.rs:603-611`, `:658-714`):
  * 110 → [100,10]; 250 → [100,100,10,10,10,10,10]; empty; singleton. */
class BatchSplitSpec extends SparkSpec {

  import spark.implicits._

  private def plan(n: Int): (Long, Long, Long, Long) = {
    val df = (1 to n).map(i => (i.toLong, "g")).toDF("id", "grp")
    val r = BatchSplit.chunkPlan(df, Seq("grp")).collect()
    if (r.isEmpty) (0L, 0L, 0L, 0L)
    else {
      val row = r.head
      (row.getAs[Long]("n_hundred_chunks"), row.getAs[Long]("n_ten_chunks"),
        row.getAs[Long]("remainder_arity"), row.getAs[Long]("n_chunks"))
    }
  }

  test("110 rows → one 100-chunk and one 10-chunk (src/upsert.rs:603-611)") {
    assert(plan(110) == (1L, 1L, 0L, 2L))
  }

  test("250 rows → [100,100,10,10,10,10,10] (src/upsert.rs:658-702)") {
    assert(plan(250) == (2L, 5L, 0L, 7L))
  }

  test("singleton → one 1-chunk (src/upsert.rs:704-714)") {
    assert(plan(1) == (0L, 0L, 1L, 1L))
  }

  test("empty input → no groups at all") {
    assert(plan(0) == (0L, 0L, 0L, 0L))
  }

  test("remainder arity 1-9 always gets exactly one extra chunk") {
    for (n <- Seq(7, 19, 105, 309)) {
      val (h, t, r, c) = plan(n)
      assert(h == n / 100 && t == (n % 100) / 10 && r == n % 10)
      assert(c == h + t + (if (r > 0) 1 else 0))
    }
  }
}
