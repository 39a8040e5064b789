package graft

import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.ops.Similarity

/** The native codegen kernels must be value-identical to their
  * higher-order-function twins (same algorithm, two independent
  * implementations) — on edge-case strings and on real corpus data. */
class NativeExprSpec extends SparkSpec {

  import spark.implicits._

  private val tricky = Seq(
    "plain words here",
    "  leading and trailing  ",
    "multi\t\tseparators\n mixed \r\n kinds",
    "x",
    " ",
    "",
    "a b",
    "repeat repeat repeat repeat",
    "punct-u@tion, digits 123 mixed t0k3ns!",
    "unicode café 中文 words",
    "astral 😀 emoji 🚀🍕 and 𤭢 cjk-ext")

  test("native wordHashes == HOF wordHashes on edge cases") {
    val df = tricky.toDF("t").select(
      TextHash.wordHashes(col("t")).as("native"),
      TextHash.wordHashesHof(col("t")).as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for row $r")
    }
  }

  test("native shingle/minhash/simhash/docHash == HOF twins on corpus sample") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val wh = TextHash.wordHashes(col("text"))
    val base = docs.select(col("doc_id"), wh.as("wh"))
      .select(col("doc_id"), col("wh"),
        TextHash.shingleHashes(col("wh"), 3).as("sh_n"),
        TextHash.shingleHashesHof(col("wh"), 3).as("sh_h"))
      .select(col("doc_id"), col("wh"), col("sh_n"), col("sh_h"),
        TextHash.minhashSignature(col("sh_n"), 4).as("sig"),
        TextHash.simhash(col("wh"), 16).as("sim_n"),
        TextHash.simhashHof(col("wh"), 16).as("sim_h"),
        TextHash.docHash(col("wh")).as("fp_n"),
        TextHash.docHashHof(col("wh")).as("fp_h"),
        TextHash.minhash(col("sh_h"), 0).as("mh0_h"),
        TextHash.minhash(col("sh_h"), 3).as("mh3_h"))
    base.collect().foreach { r =>
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "shingles diverge")
      assert(r.getLong(5) == r.getLong(6), "simhash diverges")
      assert(r.getLong(7) == r.getLong(8), "docHash diverges")
      val sig = r.getSeq[Long](4)
      assert(sig(0) == r.getLong(9), "minhash j=0 diverges")
      assert(sig(3) == r.getLong(10), "minhash j=3 diverges")
    }
  }

  test("native winnow == HOF twin on corpus sample and synthetic edges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200).select(col("text"))
      .unionByName(Seq("", "a b", "a b c d", "x x x x x x x x",
        "one two three four five six seven").toDF("text"))
    val base = docs
      .select(TextHash.wordHashes(col("text")).as("wh"))
      .select(TextHash.shingleHashes(col("wh"), 3).as("sh"))
      .select(
        TextHash.winnow(col("sh"), 4).as("w_n"),
        TextHash.winnowHof(col("sh"), 4).as("w_h"))
    base.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"winnow diverges: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("native dot/bucket == HOF twins on embeddings, bit-exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = emb.select(
      Similarity.dot(col("v"), col("v")).as("d_n"),
      Similarity.dotHof(col("v"), col("v")).as("d_h"),
      Similarity.hyperplaneBucket(col("v"), 64, 6).as("b_n"),
      Similarity.hyperplaneBucketHof(col("v"), 64, 6).as("b_h"))
    both.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot not bit-exact")
      assert(r.getLong(2) == r.getLong(3), "bucket diverges")
    }
  }

  test("int8 pack/dot: packed dot == double dot of the quantized values") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // quantize exactly as sq8TopK does (fixed scale here for test focus)
    val q = emb.select(transform(col("v"), x =>
      greatest(lit(-127.0), least(lit(127.0),
        floor(x * lit(127.0) + lit(0.5)).cast("double")))).as("qv"))
    val both = q.select(
      Similarity.dotI8(
        Similarity.packI8(col("qv")), Similarity.packI8(col("qv"))).as("i"),
      Similarity.dot(col("qv"), col("qv")).as("d"))
    both.collect().foreach { r =>
      assert(r.getLong(0).toDouble == r.getDouble(1),
        "packed integer dot must equal the exact double dot")
    }
  }

  test("int8 pack rejects non-integral and out-of-range components") {
    // Depending on where evaluation happens (task vs local/constant
    // folding) the kernel error may or may not be wrapped in a
    // SparkException — assert on the root message instead.
    def failsWith(df: org.apache.spark.sql.DataFrame, kernel: String): Unit = {
      val e = intercept[Exception](df.collect())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(kernel)), e.toString)
    }
    failsWith(Seq(Seq(0.5)).toDF("qv")
      .select(Similarity.packI8(col("qv")).as("b")), "graft_pack_i8")
    failsWith(Seq(Seq(128.0)).toDF("qv")
      .select(Similarity.packI8(col("qv")).as("b")), "graft_pack_i8")
    // mismatched code lengths fail loud, not garbage
    failsWith(Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b").select(
      Similarity.dotI8(
        Similarity.packI8(col("a")), Similarity.packI8(col("b"))).as("d")),
      "graft_dot_i8")
  }

  /** Independent Jaro-Winkler reference (chars, straightforward
    * collection code) — a second implementation to check the kernel's
    * imperative arrays/bitmask-free logic against. */
  private def jwRef(a: String, b: String): Double = {
    val l1 = a.length; val l2 = b.length // BMP-only test inputs
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val used = collection.mutable.Set.empty[Int]
    val matches = for {
      i <- 0 until l1
      j <- (math.max(0, i - w) to math.min(l2 - 1, i + w))
        .find(j => !used(j) && b(j) == a(i))
    } yield { used += j; (a(i), j) }
    val m = matches.size
    if (m == 0) return 0.0
    val bs = matches.map(_._2).sorted.map(b(_))
    val t2 = matches.map(_._1).zip(bs).count { case (x, y) => x != y }
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m.toDouble - t2 / 2.0) / m.toDouble) / 3.0
    val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
    jaro + l * 0.1 * (1.0 - jaro)
  }

  test("jaroWinkler: classic textbook values") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("DWAYNE", "DUANE"), ("", ""), ("", "x"), ("abc", "abc"))
      .toDF("a", "b")
      .select(TextHash.jaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.9611111111111111) < 1e-12) // MARTHA/MARHTA
    assert(math.abs(got(1) - 0.8133333333333332) < 1e-12) // DIXON/DICKSONX
    assert(got(3) == 1.0 && got(4) == 0.0 && got(5) == 1.0)
  }

  test("jaroWinkler: kernel == independent reference on random strings") {
    val rng = new scala.util.Random(41)
    val pool = "abcde "
    val rows = Seq.fill(300)((
      Seq.fill(rng.nextInt(13))(pool(rng.nextInt(pool.length))).mkString,
      Seq.fill(rng.nextInt(13))(pool(rng.nextInt(pool.length))).mkString))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        TextHash.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) == jwRef(r.getString(0), r.getString(1)),
        s"'${r.getString(0)}' vs '${r.getString(1)}'")
    }
  }

  test("damerauLevenshtein: unrestricted-transposition discriminators " +
      "and classic values") {
    val df = Seq(
      ("ca", "abc"), //     TRUE DL = 2 (OSA would say 3 — the variant proof)
      ("a cat", "an act"), //                            2 (same reason)
      ("ab", "ba"), //                              one transposition = 1
      ("thee", "the"), //                                      delete = 1
      ("", "abc"), //                                                   3
      ("kitten", "sitting"), //                       plain Levenshtein 3
      ("abc", "abc")) //                                                0
      .toDF("a", "b")
      .select(TextHash.damerauLevenshtein(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 2L, 1L, 1L, 3L, 3L, 0L))
  }

  // Reference DP (independent shape: full matrix with matches list per
  // symbol) for randomized cross-checking of the kernel.
  private def dlRef(a: String, b: String): Long = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    val d = Array.fill(la + 2, lb + 2)(0)
    d(0)(0) = inf
    for (i <- 0 to la) { d(i + 1)(0) = inf; d(i + 1)(1) = i }
    for (j <- 0 to lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j }
    val da = scala.collection.mutable.Map.empty[Char, Int].withDefaultValue(0)
    for (i <- 1 to la) {
      var db = 0
      for (j <- 1 to lb) {
        val k = da(b(j - 1)); val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = Seq(
          d(i)(j) + cost, d(i + 1)(j) + 1, d(i)(j + 1) + 1,
          d(k)(l) + (i - k - 1) + 1 + (j - l - 1)).min
      }
      da(a(i - 1)) = i
    }
    d(la + 1)(lb + 1).toLong
  }

  test("damerauLevenshtein: kernel == reference DP on random strings, " +
      "and never exceeds plain Levenshtein") {
    val rng = new scala.util.Random(73)
    val pool = "abcd"
    val rows = Seq.fill(300)((
      Seq.fill(rng.nextInt(11))(pool(rng.nextInt(pool.length))).mkString,
      Seq.fill(rng.nextInt(11))(pool(rng.nextInt(pool.length))).mkString))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        TextHash.damerauLevenshtein(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).cast("long").as("lev"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == dlRef(a, b), s"'$a' vs '$b'")
      assert(r.getLong(2) <= r.getLong(3), s"DL > Lev for '$a' vs '$b'")
    }
  }

  test("dtw: hand-checked alignments, empty-series NULL, and kernel == " +
      "reference DP on random series") {
    val df = Seq(
      (Seq(1L, 3L, 4L, 9L, 8L), Seq(1L, 6L, 2L, 3L, 0L, 9L, 4L)), // 12
      (Seq(5L), Seq(2L, 2L, 9L)), //              |5-2|+|5-2|+|5-9| = 10
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)), //               identical = 0
      (Seq(0L, 0L), Seq(7L, 7L, 7L))) //                       3·7 = 21
      .toDF("a", "b")
      .select(TextHash.dtw(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(12L, 10L, 0L, 21L))
    val empty = Seq((Seq.empty[Long], Seq(1L, 2L)))
      .toDF("a", "b").select(TextHash.dtw(col("a"), col("b")).as("d"))
    assert(empty.collect().head.isNullAt(0))
    def ref(a: Seq[Long], b: Seq[Long]): Long = {
      val n = a.length; val m = b.length
      val d = Array.fill(n + 1, m + 1)(Long.MaxValue / 4)
      d(0)(0) = 0L
      for (i <- 1 to n; j <- 1 to m)
        d(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          Seq(d(i - 1)(j), d(i)(j - 1), d(i - 1)(j - 1)).min
      d(n)(m)
    }
    val rng = new scala.util.Random(99)
    val rows = Seq.fill(120)((
      Seq.fill(1 + rng.nextInt(12))(rng.nextInt(40).toLong),
      Seq.fill(1 + rng.nextInt(12))(rng.nextInt(40).toLong)))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), TextHash.dtw(col("a"), col("b")).as("d"))
      .collect()
    got.foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      assert(r.getLong(2) == ref(a, b), s"$a vs $b")
    }
  }

  test("null/empty semantics: signature NULL for shingle-less docs") {
    val df = Seq("one two", "one two three").toDF("t")
      .select(TextHash.minhashSignature(
        TextHash.shingleHashes(TextHash.wordHashes(col("t")), 3), 4).as("sig"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))       // 2 words, no trigrams
    assert(rows(1).getSeq[Long](0).length == 4)
  }

  test("soundex: census textbook codes incl. the H/W-invisible rule; " +
      "empty and non-letter input yield the empty code") {
    val df = Seq("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
      "Honeyman", "tymczak", "  123 !?", "", "a")
      .toDF("s").select(TextHash.soundexCode(col("s")).as("c"))
    val got = df.collect().map(_.getString(0))
    assert(got(0) == "R163" && got(1) == "R163", "Robert/Rupert collide")
    assert(got(2) == "A261", "Ashcraft: c across h collapses into s")
    assert(got(3) == "T522", "Tymczak: z after c collapses, vowel splits")
    assert(got(4) == "P236", "Pfister: pf collapses to P")
    assert(got(5) == "H555")
    assert(got(6) == "T522", "case-insensitive")
    assert(got(7) == "" && got(8) == "", "no letters -> empty code")
    assert(got(9) == "A000", "single letter zero-pads")
  }

  test("hilbertD expression == kernel, codegen and interpreted agree") {
    val df = spark.range(500L).select(
      (col("id") % 37L).as("x"), (col("id") % 53L).as("y"))
    val got = df.select(col("x"), col("y"),
      TextHash.hilbertD(col("x"), col("y"), 6).as("d")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == graft.functions.NativeKernels.hilbertD(
        r.getLong(0), r.getLong(1), 6))
    }
    // SQL registration path
    GraftExtensions.install(spark)
    val viaSql = spark.sql("SELECT graft_hilbert_d(3, 4, 6)").head().getLong(0)
    assert(viaSql == graft.functions.NativeKernels.hilbertD(3L, 4L, 6))
  }

  test("ratReduce: gcd-reduced BIGINT rational — hand cases incl. " +
      "negative numerator, zero, and huge exact-division decimals") {
    import org.apache.spark.sql.types.Decimal
    def red(n: BigInt, d: BigInt): (Long, Long) = (
      graft.functions.NativeKernels.ratReduce(
        Decimal(scala.math.BigDecimal(n), 38, 0),
        Decimal(scala.math.BigDecimal(d), 38, 0), emitNum = true),
      graft.functions.NativeKernels.ratReduce(
        Decimal(scala.math.BigDecimal(n), 38, 0),
        Decimal(scala.math.BigDecimal(d), 38, 0), emitNum = false))
    assert(red(2525000, 3125000) == (101L, 125L))       // the AC1 spec grid
    assert(red(-6, 4) == (-3L, 2L))                     // sign stays on num
    assert(red(0, 7) == (0L, 1L))                       // zero num -> 0/1
    assert(red(0, 0) == (0L, 0L))                       // gcd guard: g = 1
    // n^3-order decimals sharing a large factor reduce into BIGINT
    val big = BigInt("123456789012345678901234")        // > Long.MaxValue
    assert(red(big * 3, big * 5) == (3L, 5L))
    // Plan path: codegen and interpreted agree with the kernel (the
    // same DECIMAL(38,0) casts the gwetAc1 gate emits through)
    val df = Seq((2525000L, 3125000L), (-6L, 4L), (81L, 27L))
      .toDF("n", "d")
      .select(
        graft.functions.TextHash.ratNum(
          col("n").cast("decimal(38,0)"), col("d").cast("decimal(38,0)"))
          .as("rn"),
        graft.functions.TextHash.ratDen(
          col("n").cast("decimal(38,0)"), col("d").cast("decimal(38,0)"))
          .as("rd"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((101L, 125L), (-3L, 2L), (3L, 1L)))
  }

  test("ratReduce: a NULL rational operand (the decimal-overflow " +
      "signature) fails loud on both eval paths, never emits null") {
    import spark.implicits._
    // A DECIMAL(38,0) product past 38 digits nulls under non-ANSI
    // decimal arithmetic; RatReduceExpr must refuse to launder that
    // into a null gate column (r12 advice item on q_gwet_ac1).
    def run(codegen: Boolean): Unit = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
      try {
        val df = Seq((Some(6L), None: Option[Long]), (Some(6L), Some(4L)))
          .toDF("n", "d")
          .select(graft.functions.TextHash.ratNum(
            col("n").cast("decimal(38,0)"),
            col("d").cast("decimal(38,0)")).as("rn"))
        val e = intercept[Exception] { df.collect() }
        def causes(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: causes(t.getCause)
        assert(causes(e).exists(c =>
          c.isInstanceOf[ArithmeticException] &&
            c.getMessage.contains("DECIMAL(38,0)")),
          s"expected ArithmeticException cause, got $e")
      } finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    run(codegen = true)
    run(codegen = false)
  }

  test("lcs: hand cases, empty sides, and kernel == driver-side " +
      "reference DP on random sequences") {
    import spark.implicits._
    def lcsCol(a: Seq[Long], b: Seq[Long]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(TextHash.lcs(col("a"), col("b")).as("l")).head().getLong(0)
    // classic: "ABCBDAB" vs "BDCABA" -> 4
    val s1 = "ABCBDAB".map(_.toLong); val s2 = "BDCABA".map(_.toLong)
    assert(lcsCol(s1, s2) == 4L)
    assert(lcsCol(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3L)
    assert(lcsCol(Seq(1L, 2L), Seq(3L, 4L)) == 0L)
    assert(lcsCol(Seq.empty, Seq(1L)) == 0L)
    assert(lcsCol(Seq(1L), Seq.empty) == 0L)
    // reference DP (full matrix, independent shape) on random input
    def ref(a: Seq[Long], b: Seq[Long]): Long = {
      val dp = Array.ofDim[Long](a.size + 1, b.size + 1)
      for (i <- 1 to a.size; j <- 1 to b.size)
        dp(i)(j) =
          if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.size)(b.size)
    }
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val a = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(5).toLong)
      val b = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(5).toLong)
      assert(lcsCol(a, b) == ref(a, b), s"mismatch on $a vs $b")
    }
  }

  test("sqDist: exact integer squared distance == driver replay; " +
      "negative components and zero vectors; length mismatch fails loud") {
    import spark.implicits._
    def sd(a: Seq[Long], b: Seq[Long]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(TextHash.sqDist(col("a"), col("b")).as("d"))
        .head().getLong(0)
    assert(sd(Seq(1L, -2L, 3L), Seq(4L, 1L, 3L)) == 9L + 9L)
    assert(sd(Seq(0L, 0L), Seq(0L, 0L)) == 0L)
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(64) + 1
      val a = Seq.fill(n)(rnd.nextInt(2000000).toLong - 1000000L)
      val b = Seq.fill(n)(rnd.nextInt(2000000).toLong - 1000000L)
      val want = a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
      assert(sd(a, b) == want)
    }
    val e = intercept[Exception] { sd(Seq(1L), Seq(1L, 2L)) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("length mismatch")))
  }

  test("editDistance: hand cases (substitution/insert/delete, plain " +
      "Levenshtein prices a transposition at 2), empty sides, and " +
      "kernel == driver-side reference DP on random sequences") {
    import spark.implicits._
    def edCol(a: Seq[Long], b: Seq[Long]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(TextHash.editDistance(col("a"), col("b")).as("d"))
        .head().getLong(0)
    assert(edCol(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 0L)
    assert(edCol(Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)) == 1L) // substitute
    assert(edCol(Seq(1L, 2L, 3L), Seq(1L, 3L)) == 1L) //      delete
    assert(edCol(Seq(1L, 3L), Seq(1L, 2L, 3L)) == 1L) //      insert
    assert(edCol(Seq(1L, 2L), Seq(2L, 1L)) == 2L) // NOT Damerau: swap = 2
    assert(edCol(Seq.empty, Seq(1L, 2L)) == 2L)
    assert(edCol(Seq(1L, 2L), Seq.empty) == 2L)
    // reference DP (full matrix, independent shape) on random input
    def ref(a: Seq[Long], b: Seq[Long]): Long = {
      val dp = Array.ofDim[Long](a.size + 1, b.size + 1)
      for (i <- 0 to a.size) dp(i)(0) = i.toLong
      for (j <- 0 to b.size) dp(0)(j) = j.toLong
      for (i <- 1 to a.size; j <- 1 to b.size)
        dp(i)(j) = math.min(
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0L else 1L),
          math.min(dp(i - 1)(j) + 1L, dp(i)(j - 1) + 1L))
      dp(a.size)(b.size)
    }
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 20) {
      val a = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(5).toLong)
      val b = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextInt(5).toLong)
      assert(edCol(a, b) == ref(a, b), s"mismatch on $a vs $b")
    }
  }

  test("mulawToPcm: closed-form landmarks — 0xFF is digital silence, " +
      "0x00 the negative peak -8031, sign symmetry holds") {
    import graft.functions.NativeKernels.mulawToPcm
    assert(mulawToPcm(0xff) == 0)
    assert(mulawToPcm(0x7f) == 0) //            positive zero codeword
    assert(mulawToPcm(0x00) == -8031)
    assert(mulawToPcm(0x80) == 8031)
    for (b <- 0 until 128)
      assert(mulawToPcm(b) == -mulawToPcm(b | 0x80), s"symmetry at $b")
    // monotone decreasing magnitude as the codeword index rises
    val mags = (0 until 128).map(b => -mulawToPcm(b))
    assert(mags == mags.sorted.reverse, "monotone companding")
  }
}
