package graft

import graft.functions.TextHash

/** The registered SQL functions must resolve, run, and agree with the
  * Column-builder surface (installed into the shared session — same
  * builders `injectFunction` wires into new sessions). */
class ExtensionsSpec extends SparkSpec {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.install(spark)
  }

  test("SQL surface: word hashes, simhash, doc hash, minhash via spark.sql") {
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta eta"))
      .toDF("id", "text").createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      """SELECT id,
        |  graft_simhash(graft_word_hashes(text), 16) AS sim,
        |  graft_doc_hash(graft_word_hashes(text)) AS fp,
        |  graft_minhash_signature(
        |    graft_shingle_hashes(graft_word_hashes(text), 2), 4) AS sig
        |FROM docs_ext""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    val viaCol = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta eta"))
      .toDF("id", "text")
      .select($"id",
        TextHash.simhash(TextHash.wordHashes($"text"), 16).as("sim"),
        TextHash.docHash(TextHash.wordHashes($"text")).as("fp"),
        TextHash.minhashSignature(
          TextHash.shingleHashes(TextHash.wordHashes($"text"), 2), 4).as("sig"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    assert(viaSql == viaCol)
  }

  test("SQL surface: jaro-winkler") {
    val jw = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .head().getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-12)
  }

  test("SQL surface: dot and hyperplane bucket") {
    Seq((1L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("id", "v")
      .createOrReplaceTempView("vec_ext")
    val r = spark.sql(
      "SELECT graft_dot(v, v) AS d, graft_hyperplane_bucket(v, 4, 3) AS b " +
        "FROM vec_ext").head()
    assert(r.getDouble(0) == 30.0)
    assert(r.getLong(1) >= 0 && r.getLong(1) < 8)
  }
}
