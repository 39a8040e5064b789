package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.{IngestConfig, TargetTable}
import graft.sink.{BloomIndex, ParquetTarget}

/** Per-bucket Bloom data-skipping sidecar: equality lookups equal the
  * exact filter (one-sided error), pruning genuinely skips buckets,
  * refresh recomputes only changed buckets and never goes stale. */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  private val cfg = IngestConfig(name = "bx-spec", maxWriterPartitions = 2)

  private def mk(): (ParquetTarget, String) = {
    val dir = Files.createTempDirectory("graft_bx_").toString
    val t = TargetTable("t", s"$dir/target", keyCols = Seq("pkey"),
      versionCol = "ver", tieBreakCols = Seq("seq"), buckets = 8,
      retainVersions = 4)
    (new ParquetTarget(spark, t), dir)
  }

  // labels follow the key so each label lives in FEW buckets (the
  // shape bloom pruning exists for); label of key k = "lab<k>"
  private def rows(keys: Seq[Long], ver: Long) =
    keys.map(k => (k, ver, k, s"lab${k % 16}"))
      .toDF("pkey", "ver", "seq", "label")

  test("lookupEq equals the exact filter for every present value and " +
    "is empty for an absent one (no false negatives, one-sided error)") {
    val (sink, dir) = mk()
    sink.mergeUpsert(rows(0L until 64L, 1L), cfg)
    val bx = new BloomIndex(spark, sink, "label", s"$dir/bx")
    bx.rebuild()
    (0 until 16).foreach { l =>
      assertSameRows(
        bx.lookupEq(s"lab$l"),
        sink.read().get.filter(col("label") === s"lab$l"))
    }
    assert(bx.lookupEq("absent").isEmpty)
  }

  test("pruning skips buckets: a single-bucket value probes fewer " +
    "bucket dirs than the table has, and absent values probe ~none") {
    val (sink, dir) = mk()
    // one distinctive label confined to one key -> one bucket
    sink.mergeUpsert(
      rows(0L until 64L, 1L).union(
        Seq((1000L, 1L, 1000L, "needle")).toDF("pkey", "ver", "seq", "label")),
      cfg)
    val bx = new BloomIndex(spark, sink, "label", s"$dir/bx")
    bx.rebuild()
    val cand = bx.candidateBuckets("needle")
    assert(cand.nonEmpty && cand.size < 8,
      s"needle should prune to < 8 of 8 buckets, got $cand")
    assert(bx.candidateBuckets("never-written").size < 8)
    assert(bx.lookupEq("needle").count() == 1)
  }

  test("refresh after an update recomputes ONLY the touched buckets " +
    "and the lookup reflects the new value") {
    val (sink, dir) = mk()
    sink.mergeUpsert(rows(0L until 64L, 1L), cfg)
    val bx = new BloomIndex(spark, sink, "label", s"$dir/bx")
    bx.rebuild()
    val synced0 = bx.syncedBaseVersion.get
    // flip ONE key's label to a brand-new value
    sink.mergeUpsert(Seq((7L, 2L, 7L, "flipped"))
      .toDF("pkey", "ver", "seq", "label"), cfg)
    bx.refresh()
    assert(bx.syncedBaseVersion.get > synced0)
    assertSameRows(
      bx.lookupEq("flipped"),
      sink.read().get.filter(col("label") === "flipped"))
    // the old value still resolves exactly (other keys share lab7)
    assertSameRows(
      bx.lookupEq("lab7"),
      sink.read().get.filter(col("label") === "lab7"))
    assert(!bx.lookupEq("lab7").collect().map(_.getLong(0)).contains(7L))
  }

  test("refresh after a hard delete rebuilds the touched bucket's " +
    "bloom from its CURRENT rows (bits are recomputed, not merged)") {
    val (sink, dir) = mk()
    sink.mergeUpsert(
      rows(0L until 64L, 1L).union(
        Seq((1000L, 1L, 1000L, "needle")).toDF("pkey", "ver", "seq", "label")),
      cfg)
    val bx = new BloomIndex(spark, sink, "label", s"$dir/bx")
    bx.rebuild()
    assert(bx.lookupEq("needle").count() == 1)
    sink.mergeHardDelete(
      Seq((1000L, 2L, 1001L)).toDF("pkey", "ver", "seq"), cfg)
    bx.refresh()
    // exactness: gone from the result regardless of bloom bits
    assert(bx.lookupEq("needle").isEmpty)
    // recompute, not merge: with the needle's bucket rebuilt from its
    // current rows, the unique value's bits are gone too (the bucket
    // may survive only via hash collision with remaining values)
    assertSameRows(
      bx.lookupEq("lab3"),
      sink.read().get.filter(col("label") === "lab3"))
  }

  test("refresh is a no-op when current; unbuilt index refuses") {
    val (sink, dir) = mk()
    sink.mergeUpsert(rows(0L until 8L, 1L), cfg)
    val bx = new BloomIndex(spark, sink, "label", s"$dir/bx")
    intercept[IllegalStateException](bx.refresh())
    intercept[IllegalStateException](bx.candidateBuckets("lab0"))
    bx.rebuild()
    val v = bx.syncedBaseVersion.get
    bx.refresh()
    assert(bx.syncedBaseVersion.get == v)
  }
}
