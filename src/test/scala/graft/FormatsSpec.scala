package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Formats

/** Format round-trips preserve data exactly, and partitioned layouts
  * prune at the directory level (the filter must appear as a
  * PartitionFilter in the scan, not a post-scan Filter). */
class FormatsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val rows = Seq(
    (1L, "plain text", "en", 10L),
    (2L, "comma, semicolon; pipe|", "en", 23L),
    (3L, "\"quoted\" and 'apostrophes'", "de", 26L),
    (4L, "unicode: héllo wörld — ünïcode", "fr", 30L))

  test("csv round-trip survives delimiters, quotes, and unicode") {
    val df = rows.toDF("id", "text", "lang", "n")
    val back = Formats.roundTrip(spark, df, "csv", tmp("fmt_csv_"))
    assertSameRows(back, df)
    // Explicit schema, no inference drift. Names/types only: Spark file
    // reads force nullable=true regardless of the supplied schema.
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
  }

  test("csv multiLine option round-trips embedded newlines") {
    val df = Seq((1L, "line one\nline two"), (2L, "no newline"))
      .toDF("id", "text")
    val back = Formats.roundTrip(spark, df, "csv", tmp("fmt_csvml_"),
      Map("multiLine" -> "true"))
    assertSameRows(back, df)
  }

  test("json and orc round-trips preserve nulls and schema") {
    val df = Seq((1L, Some("x"), Some(2.5)), (2L, None, None))
      .toDF("id", "text", "score")
    for (fmt <- Seq("json", "orc")) {
      val back = Formats.roundTrip(spark, df, fmt, tmp(s"fmt_${fmt}_"))
      assertSameRows(back, df)
    }
  }

  test("xml round-trip (Spark 4 native source) survives markup-hostile " +
      "text and nulls") {
    val df = Seq((1L, Some("a <b> & \"c\" </b>"), Some(2.5)),
      (2L, None, None), (3L, Some("ünïcode 🎈"), Some(-0.5)))
      .toDF("id", "text", "score")
    val back = Formats.roundTrip(spark, df, "xml", tmp("fmt_xml_"),
      options = Map("rowTag" -> "row"))
    assertSameRows(back, df)
  }

  test("unsupported format fails loud") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val err = intercept[IllegalArgumentException] {
      Formats.roundTrip(spark, df, "avro", tmp("fmt_bad_"))
    }
    assert(err.getMessage.contains("format"))
  }

  test("writeShards caps rows per file and loses nothing") {
    val df = (0L until 500L).map(i => (i, if (i % 5 == 0) "val" else "train"))
      .toDF("id", "split")
    val dir = tmp("fmt_shard_")
    Formats.writeShards(df, dir, "split", maxRecordsPerShard = 64L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500L)
    assert(back.filter(col("split") === "val").count() == 100L)
    // every parquet shard respects the record cap
    import scala.jdk.CollectionConverters._
    val shardCounts = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => spark.read.parquet(p.toString).count())
      .toSeq
    assert(shardCounts.nonEmpty)
    assert(shardCounts.forall(_ <= 64L), shardCounts.toString)
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    val suf = java.lang.Long.toHexString(System.nanoTime())
    val dir = tmp("fmt_bkt_")
    val fact = (0L until 400L).map(i => (i % 50, i * 1.0)).toDF("k", "v")
    val dim = (0L until 50L).map(i => (i, s"n$i")).toDF("k", "name")
    Formats.writeBucketedTable(fact, s"fact_$suf", s"$dir/f", Seq("k"), 4)
    Formats.writeBucketedTable(dim, s"dim_$suf", s"$dir/d", Seq("k"), 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table(s"fact_$suf").join(spark.table(s"dim_$suf"), "k")
      assertSameRows(j, fact.join(dim, "k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")

      val g = spark.table(s"fact_$suf").groupBy("k").count()
      assert(g.collect().length == 50)
      val gplan = g.queryExecution.executedPlan.toString
      assert(!gplan.contains("Exchange"), s"bucketed agg shuffled:\n$gplan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write prunes at the directory level on read") {
    val df = rows.toDF("id", "text", "lang", "n")
    val dir = tmp("fmt_part_")
    Formats.writePartitioned(df, dir, Seq("lang"))
    val read = Formats.readPartitioned(spark, dir).filter(col("lang") === "en")
    // The lang predicate must be a PartitionFilter (directory pruning),
    // not a data Filter over a full scan.
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("lang")),
      s"lang filter did not reach PartitionFilters:\n$plan")
    assertSameRows(
      read.select("id", "text", "n", "lang"),
      df.filter(col("lang") === "en").select("id", "text", "n", "lang"))
  }

  test("gunzipText: round-trips UTF-8 text through real gzip bytes; " +
      "corrupt, truncated, and oversize streams yield NULL rows") {
    import spark.implicits._
    def gz(s: String): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(bb)
      o.write(s.getBytes("UTF-8")); o.close()
      bb.toByteArray
    }
    val good = gz("hello gzip wörld") // multi-byte char: bytes != chars
    val trunc = good.take(good.length / 2)
    val corrupt = good.clone(); corrupt(12) = (corrupt(12) ^ 0x5a).toByte
    val df = Seq(
      (1L, good), (2L, trunc), (3L, corrupt),
      (4L, "not gzip at all".getBytes)).toDF("id", "content")
    val got = Formats.gunzipText(df, "id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(2) == "hello gzip wörld".getBytes("UTF-8").length)
    assert(got(1L).getString(3) == "hello gzip wörld")
    for (k <- Seq(2L, 3L, 4L))
      assert(got(k).isNullAt(2) && got(k).isNullAt(3), s"id $k")
    // decompression-bomb cap: 100k zeros against a 10-byte cap
    val bomb = gz("0" * 100000)
    val capped = Formats.gunzipText(
      Seq((9L, bomb)).toDF("id", "content"), "id", "content", maxBytes = 10L)
      .collect().head
    assert(capped.isNullAt(2) && capped.isNullAt(3))
    // fixture round-trip: gzipTextFixture -> gunzipText is identity
    val src = Seq((7L, "alpha beta"), (8L, "γδ ε")).toDF("doc_id", "text")
    val rt = Formats.gunzipText(
      Formats.gzipTextFixture(src, "doc_id", "text"), "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(rt == Map(7L -> "alpha beta", 8L -> "γδ ε"))
  }

  test("decodeText: per-row charset honored; latin-1 bytes declared as " +
      "utf-8 QUARANTINE (strict decode), unknown charset yields NULLs") {
    import spark.implicits._
    val latin1 = "café ß".getBytes("ISO-8859-1")
    val utf8 = "café ß".getBytes("UTF-8")
    val df = Seq(
      (1L, latin1, "iso-8859-1"), //                    correct declaration
      (2L, utf8, "utf-8"), //                           correct declaration
      (3L, latin1, "utf-8"), //    mojibake: 0xE9 is malformed UTF-8 alone
      (4L, utf8, "no-such-charset")) //                   unknown charset
      .toDF("id", "content", "charset")
    val got = Formats.decodeText(df, "id", "content", "charset")
      .collect().map(r => r.getLong(0) -> r).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("café ß".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(1L).getString(4) == want && got(2L).getString(4) == want)
    assert(got(1L).getLong(2) == latin1.length)
    assert(got(2L).getLong(2) == utf8.length && utf8.length > latin1.length)
    assert(got(3L).isNullAt(3) && got(3L).isNullAt(4), "mojibake must quarantine")
    assert(got(4L).isNullAt(4))
  }

  test("NULL binary cells quarantine, never NPE: gunzipText emits a " +
      "NULL row, zipEntries/tarGzEntries zero rows, Warc.records a " +
      "NULL row — the 'data, not a crash' contract holds for nulls") {
    import spark.implicits._
    def gz(s: String): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bb)
      g.write(s.getBytes("UTF-8")); g.close()
      bb.toByteArray
    }
    val df = Seq((1L, null: Array[Byte]), (2L, gz("alive")))
      .toDF("doc_id", "content")
    val gun = Formats.gunzipText(df, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(gun.size == 2, "the NULL cell's row must SURVIVE")
    assert(gun(1L).isNullAt(3) && gun(1L).getLong(1) == 0L)
    assert(gun(2L).getString(3) == "alive")
    assert(Formats.zipEntries(df, "doc_id", "content")
      .filter($"id" === 1L).count() == 0L)
    assert(Formats.tarGzEntries(df, "doc_id", "content")
      .filter($"id" === 1L).count() == 0L)
    val warc = graft.sources.Warc.records(df, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(warc.size == 2 && warc(1L).isNullAt(1))
  }

  test("zipEntries: an archive with more than maxEntries entries is " +
      "QUARANTINED whole (zero rows) like the bomb case — a truncated " +
      "listing must never look fully ingested") {
    import spark.implicits._
    def zip(n: Int): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bb)
      (0 until n).foreach { i =>
        z.putNextEntry(new java.util.zip.ZipEntry(s"f$i.txt"))
        z.write(s"payload $i".getBytes("UTF-8"))
        z.closeEntry()
      }
      z.close()
      bb.toByteArray
    }
    val df = Seq((1L, zip(5)), (2L, zip(3))).toDF("doc_id", "content")
    val got = Formats.zipEntries(df, "doc_id", "content", maxEntries = 3)
      .collect().map(_.getLong(0))
    assert(!got.contains(1L), "over-long archive must contribute 0 rows")
    assert(got.count(_ == 2L) == 3,
      "an archive with EXACTLY maxEntries entries is complete, not truncated")
  }

  test("parseFixedWidth slices by 1-based columns, right-trims strings, " +
    "and quarantines malformed numerics as NULL") {
    val lines = Seq(
      "0000000042Alpha     00123",
      "0000000007Beta      00007",
      "00000000XXGamma     abcde" //        both numeric fields malformed
    ).map(Tuple1(_)).toDF("value")
    val got = Formats.parseFixedWidth(lines, "value", Seq(
      ("id", 1, 10, "long"), ("name", 11, 10, "string"),
      ("qty", 21, 5, "int"))).collect()
    assert(got(0).getAs[Long]("id") == 42L &&
      got(0).getAs[String]("name") == "Alpha" &&
      got(0).getAs[Int]("qty") == 123)
    assert(got(1).getAs[Long]("id") == 7L &&
      got(1).getAs[Int]("qty") == 7)
    assert(got(2).isNullAt(0) && got(2).getAs[String]("name") == "Gamma" &&
      got(2).isNullAt(2), "malformed numerics -> NULL, never a throw")
  }

  test("parquetFooterStats: sharded directory aggregates every part " +
      "file's footer and equals the single-file stats on the same data") {
    val data = (1L to 1000L).map(i => (i, i % 97)).toDF("a", "b")
    val one = tmp("footer1")
    data.coalesce(1).write.mode("overwrite").parquet(one)
    val many = tmp("footerN")
    data.repartition(7).write.mode("overwrite").parquet(many)
    def stats(path: String) = Formats
      .parquetFooterStats(spark, path, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val singleFile = new java.io.File(one).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    val s1 = stats(singleFile)
    assert(s1("a") == ((1000L, 0L, 1L, 1000L)))
    assert(s1("b") == ((1000L, 0L, 0L, 96L)))
    assert(stats(one) == s1, "directory with one part == that part")
    assert(stats(many) == s1, "7-shard directory aggregates to the same")
  }
}
