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

  test("expect: null predicate results count as violations, not passes") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(5.0), "a"), (Some(60.0), "a"), (None, "b"), (Some(10.0), "z"))
      .toDF("q", "f")
    val got = Profile.expect(df, Seq(
        "q_range" -> col("q").between(1, 50),   // 60 violates; NULL violates
        "f_domain" -> col("f").isin("a", "b"))) // "z" violates
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("q_range") == ((4L, 2L, false)))
    assert(got("f_domain") == ((4L, 1L, false)))
  }

  test("expect on an EMPTY input passes (no NULL three-valued escape)") {
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(Double, String)].toDF("q", "f")
    val got = Profile.expect(empty, Seq("q_range" -> col("q").between(1, 50)))
      .collect().head
    assert(got.getLong(1) == 0L)       // n_checked
    assert(got.getLong(2) == 0L)       // n_violations — NOT null
    assert(got.getBoolean(3))          // pass == true — NOT null
  }

  test("orphanRule counts child keys with no parent") {
    import org.apache.spark.sql.functions._
    val child = Seq((1L, "x"), (2L, "y"), (9L, "z"), (9L, "w"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profile.orphanRule("fk_check", child, "fk", parent, "pk")
      .collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2),
      got.getBoolean(3)) == (("fk_check", 4L, 2L, false)))
  }

  test("chiSquare: zero on independence, hand-checked with empty cells") {
    // perfectly independent 2x2
    val ind = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L),
      ("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L)).toDF("a", "b")
    val r0 = Profile.chiSquare(ind, "a", "b").head()
    assert(r0.getAs[Double]("chi2") == 0.0)
    assert(r0.getAs[Long]("dof") == 1L && r0.getAs[Long]("n_rows") == 8L)
    // dependent with an EMPTY cell (x,2): cells (x,1)=4, (y,1)=1, (y,2)=3
    // rt=4/4, ct=5/3, n=8 → chi2 = 0.9 + 1.5 + 0.9 + 1.5 = 4.8
    val dep = (Seq.fill(4)(("x", 1L)) ++ Seq(("y", 1L)) ++
      Seq.fill(3)(("y", 2L))).toDF("a", "b")
    val r1 = Profile.chiSquare(dep, "a", "b").head()
    assert(math.abs(r1.getAs[Double]("chi2") - 4.8) < 1e-12)
  }

  test("chiSquare is partitioning-invariant (strict fold, no float race)") {
    val rng = new scala.util.Random(31)
    val rows = Seq.fill(5000)((s"t${rng.nextInt(6)}", rng.nextInt(7).toLong))
    val run = (p: Int) =>
      Profile.chiSquare(rows.toDF("a", "b").repartition(p), "a", "b")
        .head().getAs[Double]("chi2")
    assert(run(1) == run(17))
  }

  test("kAnonymityViolations emits only classes below k") {
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(1)(("DE", "A"))).toDF("nation", "seg")
    val got = Profile.kAnonymityViolations(df, Seq("nation", "seg"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("US", "B") -> 2L, ("DE", "A") -> 1L))
  }

  test("benford: string-extracted leading digits, Benford expectations, " +
    "sub-1 rows dropped") {
    val df = (Seq.fill(30)(123.4) ++ Seq.fill(18)(2.7) ++ Seq.fill(2)(9000.0)
      ++ Seq(0.5)).toDF("x") // 0.5 has no leading digit in [1,9]
    val got = Profile.benford(df, "x")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // full 1..9 spine: absent digits are present with n_obs = 0 and
    // still contribute their (0-e)^2/e term
    assert(got.keySet == (1L to 9L).toSet)
    assert(got(1L)._1 == 30L && got(2L)._1 == 18L && got(9L)._1 == 2L)
    assert(got(3L)._1 == 0L && got(8L)._1 == 0L)
    val e1 = 50.0 * math.log10(2.0)
    assert(got(1L)._2 == e1)
    assert(got(1L)._3 == (30.0 - e1) * (30.0 - e1) / e1)
    val e3 = 50.0 * math.log10(1.0 + 1.0 / 3.0)
    assert(got(3L)._2 == e3 && got(3L)._3 == e3)
  }

  test("keySkewProfile: one row, exact extremes, deterministic top key") {
    val df = (Seq.fill(60)("hot") ++ (1 to 20).map(i => s"k$i") ++
      Seq.fill(60)("hot2")).toDF("k")
    val r = Profile.keySkewProfile(df, "k").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 140L && row.getLong(1) == 22L)
    assert(row.getLong(2) == 60L)
    // mean = 140/22; skew = 60*22/140
    assert(row.getDouble(5) == 60.0 * 22.0 / 140.0)
    // hot2 > hot lexicographically: the deterministic tie-break
    assert(row.getString(6) == "hot2" && row.getLong(7) == 60L)
  }

  test("psi: identical distributions give ~zero terms; a vanished " +
    "bucket appears in the grid with a positive term") {
    val a = (Seq.fill(50)("x") ++ Seq.fill(30)("y") ++ Seq.fill(20)("z"))
      .toDF("bk")
    val same = Profile.psi(a, a, "bk").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(same.values.forall(_ == 0.0)) // p_a == p_b exactly
    val b = (Seq.fill(50)("x") ++ Seq.fill(50)("y")).toDF("bk") // z gone
    val got = Profile.psi(a, b, "bk").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set("x", "y", "z"))
    assert(got("z")._2 == 0L && got("z")._3 > 0.0) // vanished: big term
    // hand-check one term with the same smoothing
    val (na, nb, k, ta, tb) = (20.0, 0.0, 3.0, 100.0, 100.0)
    val pa = (na + 1) / (ta + k); val pb = (nb + 1) / (tb + k)
    val expect = BigDecimal((pa - pb) * math.log(pa / pb))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("z")._3 == expect)
  }

  test("entropy: uniform = ln(k), single-category = 0, exact fold") {
    val df = (Seq(("u", "a"), ("u", "b"), ("u", "c"), ("u", "d")) ++
      Seq(("s", "only"), ("s", "only"))).toDF("g", "c")
    val got = Profile.entropy(df, "g", "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // strict left fold of four identical 0.25·ln(4) terms
    val h = Seq.fill(4)(-0.25 * math.log(0.25)).foldLeft(0.0)(_ + _)
    assert(got("u") == ((4L, 4L, h)))
    assert(got("s")._3 == 0.0)
  }

  test("lDiversityViolations flags classes whose sensitive attribute " +
    "lacks diversity, regardless of class size") {
    val df = (Seq.fill(5)(("US", "flu")) ++ //       large but uniform: flag
      Seq(("DE", "flu"), ("DE", "cold")) ++ //       diverse: pass
      Seq(("FR", "flu"), ("FR", "flu"))) //          2 rows, 1 value: flag
      .toDF("nation", "dx")
    val got = Profile.lDiversityViolations(df, Seq("nation"), "dx", l = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("US" -> ((5L, 1L)), "FR" -> ((2L, 1L))))
    intercept[IllegalArgumentException] {
      Profile.lDiversityViolations(df, Seq("nation"), "dx", l = 1)
    }
  }

  test("mutualInformation: zero on independence, H(a) when b determines a") {
    val ind = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L),
      ("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L)).toDF("a", "b")
    val r0 = Profile.mutualInformation(ind, "a", "b").head()
    assert(r0.getAs[Double]("mi") == 0.0)
    assert(r0.getAs[Long]("n_rows") == 8L && r0.getAs[Long]("r") == 2L)
    // b a bijection of a → MI = H(a) = ln 2 for a uniform 2-class a
    val det = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L)).toDF("a", "b")
    val r1 = Profile.mutualInformation(det, "a", "b").head()
    assert(math.abs(r1.getAs[Double]("mi") - math.log(2.0)) < 1e-8)
  }

  test("mutualInformation is partitioning-invariant (strict fold)") {
    val rng = new scala.util.Random(47)
    val rows = Seq.fill(4000)((s"t${rng.nextInt(5)}", rng.nextInt(6).toLong))
    val run = (p: Int) =>
      Profile.mutualInformation(rows.toDF("a", "b").repartition(p), "a", "b")
        .head().getAs[Double]("mi")
    assert(run(1) == run(13))
  }

  test("aucBinned: perfect separation = 1, reversed = 0, ties get half " +
    "credit, degenerate class = NULL") {
    import org.apache.spark.sql.functions.col
    // pos scores {3,4}, neg {1,2} → AUC 1
    val perfect = Seq((true, 3L), (true, 4L), (false, 1L), (false, 2L))
      .toDF("y", "q")
    val r = Profile.aucBinned(perfect, col("y"), col("q")).head()
    assert(r.getAs[Double]("auc") == 1.0 && r.getAs[Long]("u2") == 8L)
    val rev = Profile.aucBinned(perfect, !col("y"), col("q")).head()
    assert(rev.getAs[Double]("auc") == 0.0)
    // all tied on one bin → AUC exactly 0.5 via the ½ tie credit
    val tied = Seq((true, 7L), (true, 7L), (false, 7L)).toDF("y", "q")
    assert(Profile.aucBinned(tied, col("y"), col("q")).head()
      .getAs[Double]("auc") == 0.5)
    // no negatives → NULL, counts still reported
    val onePos = Seq((true, 1L), (true, 2L)).toDF("y", "q")
    val d = Profile.aucBinned(onePos, col("y"), col("q")).head()
    assert(d.isNullAt(d.fieldIndex("auc")) && d.getAs[Long]("n_pos") == 2L)
  }

  test("aucBinned matches the brute-force pair count on random data") {
    val rng = new scala.util.Random(53)
    val rows = Seq.fill(400)((rng.nextBoolean(), rng.nextInt(40).toLong))
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = wins.toDouble / (2.0 * pos.size * neg.size)
    import org.apache.spark.sql.functions.col
    val got = Profile.aucBinned(rows.toDF("y", "q").repartition(7),
      col("y"), col("q")).head()
    assert(got.getAs[Long]("u2") == wins)
    assert(got.getAs[Double]("auc") == expected)
  }

  test("twoProportionZ: hand-checked statistic, degenerate arms NULL") {
    import org.apache.spark.sql.functions.col
    // A: 100 rows, 30 convert; B: 200 rows, 40 convert
    val rows = (0 until 100).map(i => (true, i < 30)) ++
      (0 until 200).map(i => (false, i < 40))
    val r = Profile.twoProportionZ(rows.toDF("a", "c"), col("a"), col("c"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((100L, 30L, 200L, 40L)))
    val (pa, pb, pp) = (0.3, 0.2, 70.0 / 300.0)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / 100 + 1.0 / 200))
    assert(r.getDouble(4) == pa && r.getDouble(5) == pb)
    assert(math.abs(r.getDouble(6) - z) < 1e-12)
    // one-armed input: z and the missing arm's rate are NULL
    val solo = Profile.twoProportionZ(
      Seq((true, true), (true, false)).toDF("a", "c"), col("a"), col("c"))
      .head()
    assert(solo.isNullAt(5) && solo.isNullAt(6))
  }

  test("ksTestBinned matches the brute-force CDF sweep, earliest-tie " +
    "argmax, identical samples give 0") {
    val rng = new scala.util.Random(59)
    val rows = Seq.fill(500)((rng.nextBoolean(),
      (rng.nextInt(30) + (if (rng.nextBoolean()) 5 else 0)).toLong))
    val a = rows.filter(_._1).map(_._2)
    val b = rows.filterNot(_._1).map(_._2)
    val bins = rows.map(_._2).distinct.sorted
    val sweep = bins.map { q =>
      val d = math.abs(a.count(_ <= q).toLong * b.size -
        b.count(_ <= q).toLong * a.size)
      (d, q)
    }
    val dMax = sweep.map(_._1).max
    val atBin = sweep.filter(_._1 == dMax).map(_._2).min
    import org.apache.spark.sql.functions.col
    val got = Profile.ksTestBinned(rows.toDF("a", "q").repartition(5),
      col("a"), col("q")).head()
    assert(got.getAs[Long]("ks_num") == dMax)
    assert(got.getAs[Long]("at_bin") == atBin)
    assert(got.getAs[Double]("ks") ==
      dMax.toDouble / (a.size.toDouble * b.size.toDouble))
    // a sample vs itself: D = 0
    val same = (a.map((true, _)) ++ a.map((false, _))).toDF("a", "q")
    assert(Profile.ksTestBinned(same, col("a"), col("q")).head()
      .getAs[Long]("ks_num") == 0L)
  }

  test("joinFanout: exact output cardinality and worst key, disjoint " +
    "keys profile to zero") {
    import spark.implicits._
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k") //  counts 3,1,1
    val b = Seq(1L, 1L, 2L, 9L).toDF("k") //      counts 2,1 (+9 unmatched)
    val r = Profile.joinFanout(a, "k", b, "k").head()
    // keys in both: 1 (3*2=6), 2 (1*1=1) -> est 7, max 6
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 2L)
    assert(r.getDouble(3) == 7.0 && r.getLong(4) == 6L)
    // cross-check against the actual join
    assert(a.join(b, "k").count() == 7L)
    val disjoint = Profile.joinFanout(
      a, "k", Seq(100L).toDF("k"), "k").head()
    assert(disjoint.getDouble(3) == 0.0 && disjoint.getLong(4) == 0L)
  }

  test("paretoCoverage: descending-count ranks with key tie-break, " +
    "exact cumulative shares, k-bounded") {
    import spark.implicits._
    // key a x4, b x2, c x2, d x1, e x1 -> total 10
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e")).toDF("k")
    val got = Profile.paretoCoverage(df, "k", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == (("a", 4L, 4L, 0.4)))
    assert(got(2L) == (("b", 2L, 6L, 0.6))) // tie b/c -> key ASC
    assert(got(3L) == (("c", 2L, 8L, 0.8)))
    assert(got.size == 3)
  }

  test("latenessProfile: inversion rate + exact p99/max backward jump; " +
    "in-order stream profiles clean") {
    import spark.implicits._
    // user 1 arrivals: ts 10, 20, 5 (jump back 15), 30
    // user 2 arrivals: ts 10, 8 (jump back 2)
    val df = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 5L), (1L, 4L, 30L),
      (2L, 1L, 10L), (2L, 2L, 8L))
      .toDF("u", "seq", "ts")
    val r = Profile.latenessProfile(df, "u", "seq", "ts").head()
    assert(r.getLong(0) == 4L) //                        adjacent pairs
    assert(r.getLong(1) == 2L) //                        inversions
    assert(r.getDouble(2) == 0.5)
    assert(r.getLong(3) == 15L) //                       max regression
    assert(r.getLong(4) == 15L) //       p99 over {2,15}: ceil-rank pick
    val clean = Seq((1L, 1L, 10L), (1L, 2L, 11L)).toDF("u", "seq", "ts")
    val c = Profile.latenessProfile(clean, "u", "seq", "ts").head()
    assert(c.getLong(1) == 0L && c.getLong(3) == 0L && c.getLong(4) == 0L)
  }

  test("histogram2d: joint grid over global bounds, max closes into " +
    "the last bin, null-on-either-axis drops, cells sum to rows") {
    import spark.implicits._
    // x in [0, 10], y in [0, 100]; 2 bins per axis -> quadrants
    val df = Seq[(Option[Double], Option[Double])](
      (Some(0.0), Some(0.0)), (Some(1.0), Some(10.0)),
      (Some(9.0), Some(10.0)), (Some(10.0), Some(100.0)),
      (Some(2.0), Some(90.0)), (None, Some(5.0)), (Some(3.0), None))
      .toDF("x", "y")
    val got = Profile.histogram2d(df, "x", "y", bins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(6)))).toMap
    // (0,0): x<5,y<50 -> rows (0,0),(1,10) ; (1,0): (9,10)
    // (1,1): (10,100) max closes in ; (0,1): (2,90)
    assert(got((0L, 0L))._3 == 2L)
    assert(got((1L, 0L))._3 == 1L)
    assert(got((1L, 1L))._3 == 1L)
    assert(got((0L, 1L))._3 == 1L)
    assert(got.values.map(_._3).sum == 5L) //   both null rows dropped
    assert(got((0L, 0L))._1 == 0.0 && got((0L, 0L))._2 == 5.0) // edges
  }

  test("calibrationBins: exact bucket counts, rates, and mean scores") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq[(Option[Double], Int)](
      (Some(0.05), 0), (Some(0.07), 1),
      (Some(0.55), 1), (Some(0.52), 1), (Some(0.58), 0),
      (None, 1))
      .toDF("score", "y")
    val got = Profile.calibrationBins(df, col("y") === 1,
      floor(col("score") * 1000.0), binDiv = 100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(0L) == ((2L, 1L, 120L, 0.5, 60.0)))
    assert(got(5L) == ((3L, 2L, 1650L, 2.0 / 3.0, 550.0)))
    assert(got.size == 2) // null-score row dropped
  }

  test("liftDeciles: rank-sliced counts, lift, cumulative capture") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 20 rows, scores 20..1 on ids 1..20; positives are the top-5 scores
    val df = (1 to 20).map(i => (i.toLong, 21.0 - i, if (i <= 5) 1 else 0))
      .toDF("id", "score", "y")
    val got = Profile.liftDeciles(df, col("y") === 1, col("score"),
      col("id")).collect().sortBy(_.getLong(0))
    assert(got.length == 10 && got.map(_.getLong(1)).forall(_ == 2L))
    // decile 0 = ids 1,2 (both positive): lift = (2/2)/(5/20) = 4
    assert(got(0).getLong(2) == 2L && got(0).getDouble(3) == 4.0)
    // positives exhaust inside decile 2 (ids 5,6 → one positive)
    assert(got(2).getLong(2) == 1L && got(2).getLong(4) == 5L)
    assert(got(2).getDouble(5) == 1.0 && got(9).getDouble(5) == 1.0)
    assert(got.map(_.getLong(2)).sum == 5L)
  }

  test("liftDeciles: score ties are resolved by the id tie-break") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, 1.0, i % 2)).toDF("id", "s", "y")
    val got = Profile.liftDeciles(df, col("y") === 1, col("s"), col("id"),
      k = 5).collect().sortBy(_.getLong(0))
    // all scores equal → slices are pure id order: (1,2),(3,4)...
    assert(got.length == 5 && got.map(_.getLong(1)).forall(_ == 2L))
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L, 1L, 1L))
  }

  test("cupedAdjust: a perfectly predictive covariate equalizes arms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // y = 2x exactly → θ = 2 and the adjusted means collapse to the
    // same value even though the raw arm means differ wildly
    val units = Seq(("A", 10L, 20L), ("A", 20L, 40L),
      ("B", 30L, 60L), ("B", 40L, 80L)).toDF("arm", "x", "y")
    val got = Profile.cupedAdjust(units, "arm", "x", "y", scale = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("A") == ((2L, 15.0, 30.0, 2.0, 50.0)))
    assert(got("B") == ((2L, 35.0, 70.0, 2.0, 50.0)))
  }

  test("cupedAdjust: zero-variance covariate degrades to plain means") {
    import spark.implicits._
    val units = Seq(("A", 5L, 10L), ("B", 5L, 30L)).toDF("arm", "x", "y")
    val got = Profile.cupedAdjust(units, "arm", "x", "y", scale = 1L)
      .collect().map(r => r.getString(0) -> ((r.isNullAt(4), r.getDouble(5))))
      .toMap
    assert(got("A") == ((true, 10.0)) && got("B") == ((true, 30.0)))
  }

  test("powerMde: textbook MDE from exact moments") {
    import spark.implicits._
    // y in {0, 10} × 50 each: mean 5, var = 100·(1/4)·(100/99)
    val units = (1L to 100L).map(i => (i, if (i <= 50) 0L else 10L))
      .toDF("u", "y")
    val r = Profile.powerMde(units, "y", scale = 1L).collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 50L)
    assert(r.getDouble(2) == 5.0)
    // var = (n·Σy² − S²)/(n(n−1)) = (100·5000 − 500²)/9900 = 2500/99
    assert(math.abs(r.getDouble(3) - 2500.0 / 99.0) < 1e-9)
    val zs = 1.959963984540054 + 0.8416212335729143
    val mde = zs * math.sqrt(2.0 * r.getDouble(3) / 50.0)
    assert(math.abs(r.getDouble(4) - mde) < 1e-12)
    assert(math.abs(r.getDouble(5) - mde / 5.0) < 1e-12)
  }

  test("diffInDiff: cancels baseline and common trend, exact cells") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // control flat (10,20 both periods); treated shifts +15 on average
    val obs = Seq(
      (false, false, 10L), (false, false, 20L),
      (false, true, 10L), (false, true, 20L),
      (true, false, 30L), (true, false, 40L),
      (true, true, 45L), (true, true, 55L))
      .toDF("t", "post", "y")
    val r = Profile.diffInDiff(obs, col("t"), col("post"), "y", scale = 1L)
      .collect().head
    assert((0 to 3).map(r.getLong) == Seq(2L, 2L, 2L, 2L))
    assert(r.getDouble(4) == 15.0 && r.getDouble(5) == 15.0)
    assert(r.getDouble(6) == 35.0 && r.getDouble(7) == 50.0)
    assert(r.getDouble(8) == 15.0)      // the effect
    assert(r.getDouble(9) > 0.0)        // pooled se defined
    assert(r.getDouble(10) == 15.0 / r.getDouble(9))
  }

  test("diffInDiff: singleton cell suppresses did/se/t, keeps means") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val obs = Seq((false, false, 10L), (false, true, 10L),
      (true, false, 10L), (true, true, 25L)).toDF("t", "post", "y")
    val r = Profile.diffInDiff(obs, col("t"), col("post"), "y", scale = 1L)
      .collect().head
    assert(r.getDouble(7) == 25.0)
    assert(r.isNullAt(8) && r.isNullAt(9) && r.isNullAt(10))
  }

  test("srmCheck: exact counts, 1-dof chi-square identity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 100L).toDF("id") // 50 even / 50 odd → chi2 = 0
    val r = Profile.srmCheck(df, col("id") % 2 === 0).collect().head
    assert(r.getLong(0) == 50L && r.getLong(1) == 50L && r.getDouble(2) == 0.0)
    val skew = (1L to 90L).map(i => i -> (i <= 60L)).toDF("id", "a")
    val r2 = Profile.srmCheck(skew, col("a")).collect().head
    // (60-30)^2 / 90 = 10 — far past 3.84: broken assignment
    assert(r2.getDouble(2) == 10.0)
  }

  test("mannWhitneyZ: exact 2U, tie correction, degenerate NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // A = {3,4} beats B = {1,2} completely: U = n_a·n_b = 4,
    // no ties → σ² = 4·(5·4·3)/(12·4·3) = 5/3, z = 2/√(5/3).
    val sep = Seq(("a", 3L), ("a", 4L), ("b", 1L), ("b", 2L))
      .toDF("g", "q")
    val r = Profile.mannWhitneyZ(sep, col("g") === "a", col("q"))
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 8L)
    assert(math.abs(r.getDouble(3) - 2.0 / math.sqrt(5.0 / 3.0)) < 1e-12)
    // Ties: A = {1,1}, B = {1,2} → 2U = 2, T = 3³−3 = 24,
    // σ² = 4·(60−24)/144 = 1, z = (2−4)/2 = −1.
    val tied = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L))
      .toDF("g", "q")
    val r2 = Profile.mannWhitneyZ(tied, col("g") === "a", col("q"))
      .collect().head
    assert(r2.getLong(2) == 2L && r2.getDouble(3) == -1.0)
    // One-sample input → z NULL.
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "q")
    assert(Profile.mannWhitneyZ(one, col("g") === "a", col("q"))
      .collect().head.isNullAt(3))
  }

  test("benjaminiHochbergZ: step-up rejection, m excludes degenerate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // g1: strong lift (50/50 vs 5/50) → tiny p, rejected.
    // g2: no lift (25/50 vs 25/50) → z = 0, p ≈ 1, kept.
    // g3: one-armed → z NULL, excluded from m, never rejected.
    val rows =
      (1 to 50).map(i => ("g1", true, true)) ++
        (1 to 50).map(i => ("g1", false, i <= 5)) ++
        (1 to 50).map(i => ("g2", true, i <= 25)) ++
        (1 to 50).map(i => ("g2", false, i <= 25)) ++
        (1 to 10).map(i => ("g3", true, i <= 3))
    val df = rows.toDF("grp", "a", "c")
    val got = Profile.benjaminiHochbergZ(df, "grp", col("a"), col("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g1").getBoolean(9))
    assert(!got("g2").getBoolean(9))
    assert(got("g3").isNullAt(5) && got("g3").isNullAt(7) &&
      !got("g3").getBoolean(9))
    assert(got.values.forall(_.getLong(8) == 2L)) // m = 2 tested groups
    assert(got("g1").getLong(7) == 1L && got("g2").getLong(7) == 2L)
    // A&S 7.1.26 sanity: p(z≈0) ≈ 1 within the 1.5e-7 envelope.
    assert(math.abs(got("g2").getDouble(6) - 1.0) < 1e-6)
  }

  test("mahalanobis2d: correlation-aware outlier ranks first") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Tight x=y diagonal cloud + one off-diagonal point: (9,1) violates
    // the correlation structure even though both marginals are in-range.
    val rows = (1L to 9L).map(i => (i, i, i)) :+ ((10L, 9L, 1L))
    val df = rows.toDF("id", "x", "y")
    val got = Profile.mahalanobis2d(df, "id", col("x"), col("y"), k = 3)
      .collect()
    assert(got.head.getLong(0) == 10L)
    assert(got.head.getDouble(1) > got(1).getDouble(1))
    assert(got.forall(_.getDouble(1) >= 0.0))
    // Degenerate cloud (constant y → det = 0) emits nothing.
    val flat = (1L to 5L).map(i => (i, i, 1L)).toDF("id", "x", "y")
    assert(Profile.mahalanobis2d(flat, "id", col("x"), col("y"), 3)
      .count() == 0L)
  }

  test("kruskalWallis: hand-check, shift sensitivity, tie correction") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Textbook no-ties case: groups {1,2},{3,4},{5,6} — ranks are
    // exact, H = 12/(6*7) * (3^2/2 + 7^2/2 + 11^2/2) - 21 = 4.5714...
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("g", "v")
    val r = Profile.kruskalWallis(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    val want = 12.0 * (9.0 / 2 + 49.0 / 2 + 121.0 / 2) / 42.0 - 21.0
    assert(math.abs(r.getDouble(2) - want) < 1e-12)
    assert(r.getDouble(3) == r.getDouble(2)) // no ties → same statistic
    // Separated groups score higher than interleaved ones.
    val mixed = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("a", 4L),
      ("b", 5L), ("c", 6L)).toDF("g", "v")
    val hm = Profile.kruskalWallis(mixed, col("g"), col("v"))
      .collect().head.getDouble(2)
    assert(r.getDouble(2) > hm)
    // All values tied: tie denominator hits 0 → h_tie NULL.
    val allTie = Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    val rt = Profile.kruskalWallis(allTie, col("g"), col("v"))
      .collect().head
    assert(rt.isNullAt(3))
    // Single group → NULL (nothing to compare).
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    assert(Profile.kruskalWallis(one, col("g"), col("v"))
      .collect().head.isNullAt(2))
  }

  test("mcnemar: discordant-cell arithmetic and degenerate NULL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Users 1-6 flip A→yes B→no (b), users 7-8 the reverse (c);
    // user 9 concordant-yes (ignored), user 10 concordant-no (ignored).
    val rows =
      (1L to 6L).flatMap(u => Seq((u, "p"))) ++
        (7L to 8L).flatMap(u => Seq((u, "e"))) ++
        Seq((9L, "p"), (9L, "e"), (10L, "x"))
    val df = rows.toDF("u", "t")
    val r = Profile.mcnemar(df, col("u"),
      col("t") === "p", col("t") === "e").collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 16.0 / 8.0) // (6-2)^2 / 8
    assert(r.getDouble(3) == 9.0 / 8.0) // (|6-2|-1)^2 / 8
    // No discordant pairs → NULL statistics.
    val conc = Seq((1L, "p"), (1L, "e"), (2L, "x")).toDF("u", "t")
    val rc = Profile.mcnemar(conc, col("u"),
      col("t") === "p", col("t") === "e").collect().head
    assert(rc.isNullAt(2) && rc.isNullAt(3))
  }

  test("cochranQ: textbook arithmetic, constant rows cancel, degenerate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 4 subjects × 3 treatments; subject s responds to treatment t iff
    // (s,t) listed. C = (3,1,2), R = (2,2,1,1).
    val resp = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"),
      (3L, "a"), (4L, "c"))
    val df = resp.toDF("u", "t")
    val ts = Seq(col("t") === "a", col("t") === "b", col("t") === "c")
    val r = Profile.cochranQ(df, col("u"), ts).collect().head
    // Q = 2*(3*(9+1+4) - 36) / (3*6 - 10) = 2*6/8
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 12.0 / 8.0 && r.getLong(3) == 2L)
    // Adding an all-success and an all-failure subject leaves Q fixed.
    val padded = resp ++ Seq((5L, "a"), (5L, "b"), (5L, "c")) ++
      Seq((6L, "x"))
    val rp = Profile.cochranQ(padded.toDF("u", "t"), col("u"), ts)
      .collect().head
    assert(rp.getDouble(2) == 12.0 / 8.0)
    // Everyone responds to everything → denominator 0 → NULL.
    val allYes = Seq((1L, "a"), (1L, "b"), (1L, "c")).toDF("u", "t")
    assert(Profile.cochranQ(allYes, col("u"), ts).collect().head.isNullAt(2))
  }

  test("brownForsythe: spread difference detected, equal spreads near 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Group a tight around 100, group b wide around 100: same center,
    // very different spread → F large. Groups c/d identical spread → F 0.
    val tight = (1 to 20).map(i => ("a", 100L + (i % 3) - 1L))
    val wide = (1 to 20).map(i => ("b", 100L + ((i % 5) - 2L) * 40L))
    val f1 = Profile.brownForsythe((tight ++ wide).toDF("g", "v"),
      col("g"), col("v")).collect().head
    assert(f1.getLong(0) == 40L && f1.getLong(1) == 2L)
    assert(f1.getDouble(2) > 10.0)
    val c = (1 to 10).map(i => ("c", (i % 5).toLong))
    val d = (1 to 10).map(i => ("d", 50L + (i % 5)))
    val f2 = Profile.brownForsythe((c ++ d).toDF("g", "v"),
      col("g"), col("v")).collect().head
    assert(f2.getDouble(2) == 0.0) // identical |x-med| multisets
    // One group → NULL.
    assert(Profile.brownForsythe(tight.toDF("g", "v"), col("g"), col("v"))
      .collect().head.isNullAt(2))
  }

  test("friedman: textbook ranks, tie cases, consistent-order maximum") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ts(v: org.apache.spark.sql.Column) = Seq(
      (col("t") === "a", v), (col("t") === "b", v), (col("t") === "c", v))
    // Every subject orders a < b < c → perfect consistency: ranks are
    // (1,2,3) for all n=4 blocks → Q = n·k... closed form: S=(2R) sums
    // s0=4·2=8, s1=4·4=16, s2=4·6=24 → Q = (64+256+576)/16 − 48 = 8.
    val consistent = (1L to 4L).flatMap(u =>
      Seq((u, "a", 1L), (u, "b", 2L), (u, "c", 3L)))
    val r = Profile.friedman(consistent.toDF("u", "t", "v"), col("u"),
      ts(col("v"))).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 8.0)
    assert(r.getDouble(3) == 8.0) // no ties → correction is identity
    // All-tied blocks: Q = 0 and the tie denominator collapses → NULL.
    val tied = (1L to 3L).flatMap(u =>
      Seq((u, "a", 5L), (u, "b", 5L), (u, "c", 5L)))
    val rt = Profile.friedman(tied.toDF("u", "t", "v"), col("u"),
      ts(col("v"))).collect().head
    assert(rt.getDouble(2) == 0.0 && rt.isNullAt(3))
    // A pair tie per block: correction inflates Q (denominator shrinks).
    val pair = (1L to 4L).flatMap(u =>
      Seq((u, "a", 1L), (u, "b", 1L), (u, "c", 9L)))
    val rp = Profile.friedman(pair.toDF("u", "t", "v"), col("u"),
      ts(col("v"))).collect().head
    assert(rp.getDouble(3) > rp.getDouble(2))
  }

  test("conformalInterval: coverage honors the guarantee on exchangeable " +
      "data and the pick is the exact order statistic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // One group; values cycle deterministically so splits are
    // exchangeable. alpha=0.1 on n_cal≈250 → coverage ≈ 0.9.
    val rows = (1L to 1000L).map(i =>
      ("g", i, ((i * 37L) % 101L), (i % 4 match {
        case 0L | 1L => 0L; case 2L => 1L; case _ => 2L })))
    val df = rows.toDF("g", "i", "v", "s")
    val r = Profile.conformalInterval(df, col("g"), col("i"), col("v"),
      col("s")).collect().head
    val (nCal, qhat, cov) = (r.getLong(1), r.getDouble(2), r.getDouble(4))
    assert(nCal == 250L)
    assert(cov >= 0.85 && cov <= 0.97, s"coverage $cov")
    // Replay the order-statistic pick on the driver.
    val mu = rows.filter(_._4 == 0L).map(_._3.toDouble).sum /
      rows.count(_._4 == 0L)
    val res = rows.filter(_._4 == 1L)
      .map(t => (math.abs(t._3 - mu), t._2)).sorted
    val k = math.min(nCal, math.ceil((nCal + 1) * 0.9).toLong).toInt
    assert(qhat == res(k - 1)._1)
    // Tighter alpha → wider interval (monotone in 1-alpha).
    val tight = Profile.conformalInterval(df, col("g"), col("i"),
      col("v"), col("s"), alpha = 0.01).collect().head
    assert(tight.getDouble(2) >= qhat)
  }

  test("sprt: decisive streams cross the right boundary, ambiguous " +
      "streams never decide") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def run(flags: Seq[Int]) = Profile.sprt(
      flags.zipWithIndex.map { case (f, i) => (i.toLong, f) }
        .toDF("o", "s"),
      Seq(col("o")), col("s") === 1, p0 = 0.2, p1 = 0.8)
      .collect().head
    // All successes: LLR climbs log(4) per trial → accepts H1 fast.
    val h1 = run(Seq.fill(20)(1))
    assert(h1.getString(4) == "accept_h1")
    assert(h1.getLong(3) == math.ceil(
      math.log(0.95 / 0.05) / math.log(0.8 / 0.2)).toLong)
    // All failures: symmetric → accepts H0.
    val h0 = run(Seq.fill(20)(0))
    assert(h0.getString(4) == "accept_h0")
    // Perfectly alternating at p=0.5 between 0.2 and 0.8: the LLR
    // oscillates near 0 and never exits the band.
    val amb = run(Seq.tabulate(20)(i => i % 2))
    assert(amb.isNullAt(3) && amb.isNullAt(4))
    assert(amb.getLong(0) == 20L && amb.getLong(1) == 10L)
    // Final LLR replay from exact totals.
    val la = math.log((1.0 - 0.8) / (1.0 - 0.2))
    val lb = math.log(0.8 / 0.2)
    assert(amb.getDouble(2) == 10.0 * lb + 10.0 * la)
  }

  test("permutationTest: strong effect hits the p floor, null effect " +
      "does not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 40 subjects; treated half's values are shifted by +1000 — almost
    // no relabeling reproduces that gap (an affine scramble CAN land on
    // a comparably extreme split, so assert near-floor, not floor).
    val strong = (1L to 40L).map(u =>
      (u, if (u <= 20) "t" else "c", if (u <= 20) 1000L + u else u))
    val df = strong.toDF("u", "g", "v")
    val r = Profile.permutationTest(df, col("u"), col("g") === "t",
      col("v")).collect().head
    assert(r.getLong(0) == 40L && r.getLong(1) == 64L)
    assert(r.getDouble(2) > 900.0)
    assert(r.getLong(3) <= 3L)
    assert(r.getDouble(4) == (1.0 + r.getLong(3)) / 65.0)
    // Null effect: treatment is unrelated to the value → many scrambles
    // beat the observed gap.
    val nullEff = (1L to 40L).map(u => (u, if (u % 2 == 0) "t" else "c",
      (u * 37L) % 101L))
    val rn = Profile.permutationTest(nullEff.toDF("u", "g", "v"),
      col("u"), col("g") === "t", col("v")).collect().head
    assert(rn.getLong(3) > 5L && rn.getDouble(4) > 0.09)
    // One-sided universe (everyone treated) → NULL diff and p.
    val only = Seq((1L, "t", 5L), (2L, "t", 6L)).toDF("u", "g", "v")
    val ro = Profile.permutationTest(only.toDF("u", "g", "v"),
      col("u"), col("g") === "t", col("v")).collect().head
    assert(ro.isNullAt(2) && ro.isNullAt(4))
  }

  test("rdd: clean step function recovers a unit effect with zero slopes") {
    val rows = (0 until 200).map { i =>
      val x = 4000L + i * 10L // [4000, 6000) straddles cutoff 5000
      (x, x >= 5000L)
    }
    val df = rows.toDF("x", "y")
    val r = Profile.regressionDiscontinuity(df,
      df("x"), df("y"), cutoffQ = 5000L, bandwidthQ = 1000L)
      .collect().head
    assert(math.abs(r.getAs[Double]("slope_l")) < 1e-12)
    assert(math.abs(r.getAs[Double]("slope_r")) < 1e-12)
    assert(math.abs(r.getAs[Double]("pred_l") - 0.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("pred_r") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("rdd_effect") - 1.0) < 1e-9)
  }

  test("caliper matching: nearest control wins, ties to smaller id, out-of-caliper drops") {
    // treated u1 (x=10,y=100): controls at x=9 (id 20, y=30) and x=11
    //   (id 21, y=50) — both dist 1, tie -> id 20
    // treated u2 (x=14,y=80): nearest control x=12 (id 22, y=10), dist 2 ok
    // treated u3 (x=25,y=70): no control within 2 -> unmatched
    val units = Seq(
      (1L, true, 10L, 100L), (2L, true, 14L, 80L), (3L, true, 25L, 70L),
      (20L, false, 9L, 30L), (21L, false, 11L, 50L), (22L, false, 12L, 10L))
      .toDF("id", "t", "x", "y")
    val r = Profile.caliperMatchAtt(units, units("t"), units("x"),
      units("y"), caliper = 2L, units("id")).collect().head
    assert(r.getAs[Long]("n_treated") == 3L)
    assert(r.getAs[Long]("n_matched") == 2L)
    // diffs: (100-30) + (80-10) = 140 -> att 70
    assert(r.getAs[Long]("sum_dy") == 140L)
    assert(r.getAs[Double]("att") == 70.0)
  }

  test("delta-method ratio: hand-worked cluster variance, equal ratios give z = 0") {
    // arm A units (x=Σq, y=events): (10,2) (20,2) (30,2) → R=10,
    //   s_xx=100, s_xy=s_yy=0, var = 100/(3·4)
    // arm B units: (8,1) (12,1) → R=10, s_xx=8, var = 8/(2·1)
    val rows =
      Seq((1L, 5L), (1L, 5L), (2L, 10L), (2L, 10L), (3L, 15L), (3L, 15L),
        (11L, 8L), (12L, 12L))
    val df = rows.toDF("u", "q")
    val r = Profile.deltaMethodRatio(df, df("u"), df("u") < 10L,
      df("q"), scale = 1.0).collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("ratio_a") == 10.0)
    assert(r.getAs[Double]("ratio_b") == 10.0)
    assert(math.abs(r.getAs[Double]("se_a") - math.sqrt(100.0 / 12.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_b") - 2.0) < 1e-12)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("tostEquivalence: identical tight arms are equivalent, a shifted " +
    "arm is not, degenerate arms yield NULL stats and false") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(19)
    // both arms ~ N-ish around 100 with small spread, margin 5 → equivalent
    val same = (1 to 400).map(i =>
      (i % 2 == 0, 100L + rng.nextInt(5) - 2L)).toDF("a", "q")
    val r1 = Profile.tostEquivalence(same, col("a"), col("q"), 1.0, 5.0)
      .collect().head
    assert(r1.getAs[Boolean]("equivalent"))
    assert(math.abs(r1.getAs[Double]("diff")) < 5.0)
    // B shifted by 50 with the same spread → decisively NOT equivalent
    val far = (1 to 400).map { i =>
      val a = i % 2 == 0
      (a, (if (a) 100L else 150L) + rng.nextInt(5) - 2L)
    }.toDF("a", "q")
    val r2 = Profile.tostEquivalence(far, col("a"), col("q"), 1.0, 5.0)
      .collect().head
    assert(!r2.getAs[Boolean]("equivalent"))
    assert(r2.getAs[Double]("t_upper") < -1.6448536269514722 &&
      r2.getAs[Double]("t_lower") < 0.0)
    // one-row arm → NULLs and false
    val tiny = Seq((true, 1L), (false, 2L), (false, 3L)).toDF("a", "q")
    val r3 = Profile.tostEquivalence(tiny, col("a"), col("q"), 1.0, 5.0)
      .collect().head
    assert(r3.isNullAt(2) && r3.isNullAt(4) && !r3.getAs[Boolean]("equivalent"))
  }

  test("jonckheereTerpstra: hand-computed doubled U per ordered pair, " +
    "with ties counted once") {
    val df = Seq(
      (1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 4L), (3L, 5L))
      .toDF("g", "v")
    val got = Profile.jonckheereTerpstra(df,
      org.apache.spark.sql.functions.col("g"),
      org.apache.spark.sql.functions.col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_lo"), r.getAs[Long]("n_hi"), r.getAs[Long]("u2"))))
      .toMap
    // (1,2): less {(1,2),(1,3),(2,3)}=3, tie {(2,2)}=1 -> u2 = 7
    assert(got((1L, 2L)) == ((2L, 2L, 7L)))
    assert(got((1L, 3L)) == ((2L, 2L, 8L)))
    assert(got((2L, 3L)) == ((2L, 2L, 8L)))
  }

  test("eventStudy: pre periods read zero under parallel trends, post " +
    "periods read the true dynamic effect net of a level gap") {
    import org.apache.spark.sql.functions.{col => c}
    // treated baseline 20, control 10 (constant gap 10 = parallel
    // trends); treatment at k>=0 adds 5 at k=0 and 7 at k=1
    val rows = for {
      k <- -2L to 1L
      (t, base) <- Seq((true, 20L), (false, 10L))
      rep <- 1 to 3
    } yield (t, base + (if (t && k == 0) 5L else if (t && k == 1) 7L
      else 0L), k)
    val df = rows.toDF("t", "y", "k")
    val got = Profile.eventStudy(df, c("t"), c("y"), c("k"))
      .collect().map(r => r.getAs[Long]("rel_period") ->
        r.getAs[Double]("effect")).toMap
    assert(got(-2L) == 0.0 && got(-1L) == 0.0, "parallel pre-trends")
    assert(got(0L) == 5.0 && got(1L) == 7.0, "dynamic effects recovered")
  }

  test("ipwAte recovers a confounded effect that the naive difference " +
    "misses, and excludes no-overlap strata") {
    import org.apache.spark.sql.functions.{col => c}
    // stratum 0: baseline 10, stratum 1: baseline 100; treatment adds 5
    // everywhere, but treatment is concentrated in stratum 1 (3 of 4)
    // while stratum 0 is mostly control -> naive diff is inflated by
    // the baseline gap; IPW recovers exactly +5.
    val rows = Seq(
      (true, 15L, 0L), (false, 10L, 0L), (false, 10L, 0L), (false, 10L, 0L),
      (true, 105L, 1L), (true, 105L, 1L), (true, 105L, 1L), (false, 100L, 1L),
      (true, 7L, 2L), (true, 7L, 2L)) //    stratum 2: all treated -> OUT
      .toDF("t", "y", "s")
    val r = Profile.ipwAte(rows, c("t"), c("y"), c("s")).collect().head
    assert(r.getAs[Long]("n_strata_included") == 2L)
    assert(r.getAs[Long]("n_strata_excluded") == 1L)
    assert(r.getAs[Long]("n_rows_included") == 8L)
    assert(math.abs(r.getAs[Double]("ate") - 5.0) < 1e-12,
      s"IPW must deconfound to +5, got ${r.getAs[Double]("ate")}")
    // the naive pooled difference is badly wrong (far from 5)
    val naive = (15.0 + 105.0 * 3) / 4 - (10.0 * 3 + 100.0) / 4
    assert(math.abs(naive - 5.0) > 20.0)
  }

  test("hodgesLehmann: lower median of all pairwise differences, " +
    "element pick with multiplicities") {
    import org.apache.spark.sql.functions.{col => c}
    // A = {10, 20}, B = {1, 2}: diffs {8, 9, 18, 19} -> lower median
    // at rank (4+1) div 2 = 2 -> 9
    val df = Seq((true, 10L), (true, 20L), (false, 1L), (false, 2L))
      .toDF("a", "q")
    val r = Profile.hodgesLehmann(df, c("a"), c("q")).collect().head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Long]("hl_shift") == 9L)
    // multiplicity: A = {5, 5, 5}, B = {1}: diffs {4 x3} -> 4
    val m = Seq((true, 5L), (true, 5L), (true, 5L), (false, 1L))
      .toDF("a", "q")
    assert(Profile.hodgesLehmann(m, c("a"), c("q"))
      .collect().head.getAs[Long]("hl_shift") == 4L)
    // swapping groups: diffs {-19,-18,-9,-8}, lower median (rank 2)
    // is -18 — the lower-median convention is NOT antisymmetric, which
    // is exactly why the convention must be pinned
    val sw = Profile.hodgesLehmann(df, !c("a"), c("q")).collect().head
    assert(sw.getAs[Long]("hl_shift") == -18L)
  }

  test("cliffsDelta: hand-computed dominance counts, full separation " +
    "hits +-1, identical groups hit 0") {
    import org.apache.spark.sql.functions.{col => c}
    // A = {3, 5}, B = {1, 4}: gt pairs (3,1),(5,1),(5,4)=3, lt (3,4)=1
    val df = Seq((true, 3L), (true, 5L), (false, 1L), (false, 4L))
      .toDF("a", "q")
    val r = Profile.cliffsDelta(df, c("a"), c("q")).collect().head
    assert(r.getAs[Long]("n_gt") == 3L && r.getAs[Long]("n_lt") == 1L)
    assert(r.getAs[Double]("delta") == (3.0 - 1.0) / 4.0)
    val sep = Seq((true, 10L), (true, 11L), (false, 1L), (false, 2L))
      .toDF("a", "q")
    assert(Profile.cliffsDelta(sep, c("a"), c("q"))
      .collect().head.getAs[Double]("delta") == 1.0)
    val same = Seq((true, 7L), (false, 7L)).toDF("a", "q")
    assert(Profile.cliffsDelta(same, c("a"), c("q"))
      .collect().head.getAs[Double]("delta") == 0.0)
  }

  test("runsTest: alternating series counts every run; z matches the " +
    "driver-side replay of the pinned formula") {
    val vals = Seq(1L, 9L, 1L, 9L, 1L, 9L, 1L, 9L, 2L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "o", "v")
    val r = Profile.runsTest(df, "k", "o", "v").collect().head
    // lower median of the 9 values is 2 (rank 5 of the sorted list);
    // the tie row is dropped, leaving 8 alternating signs -> 8 runs
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Long]("runs") == 8L)
    val p = 2.0 * 4.0 * 4.0; val nn = 8.0
    val mu = p / nn + 1.0
    val s2 = (p * (p - nn)) / (nn * nn * (nn - 1.0))
    assert(r.getAs[Double]("z") == (8.0 - mu) / math.sqrt(s2))
    // a perfectly streaky series (lows, one median row, highs) has 2
    // runs once the median row drops
    val streak = (Seq.fill(4)(1L) ++ Seq(5L) ++ Seq.fill(4)(9L)).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "o", "v")
    val s = Profile.runsTest(streak, "k", "o", "v").collect().head
    assert(s.getAs[Long]("runs") == 2L)
    assert(s.getAs[Double]("z") < -2.0, "streaks give a deeply negative z")
    // one-sided series -> NULL z
    val one = Seq(("k", 0L, 5L), ("k", 1L, 5L), ("k", 2L, 7L))
      .toDF("k", "o", "v")
    val o = Profile.runsTest(one, "k", "o", "v").collect().head
    assert(o.isNullAt(o.fieldIndex("z")))
  }

  test("mantelHaenszel: single stratum reduces to the plain odds ratio; " +
      "a confounded pair of strata pulls OR_MH toward 1") {
    import org.apache.spark.sql.functions.col
    // one stratum: a=30 d=20, b=10 c=15 -> OR = (30*20/75)/(10*15/75) = 4
    def rows(s: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val single = rows(0L, 30, 10, 15, 20).toDF("s", "tr", "oc")
    val r1 = Profile.mantelHaenszel(single, col("s"), col("tr"), col("oc"))
      .head()
    assert(r1.getAs[Long]("n_strata") == 1L)
    assert(r1.getAs[Double]("mh_or") == 4.0)
    // two strata, each with NO within-stratum effect (OR=1), but
    // opposite base rates: MH stays 1 where the pooled table would not
    val conf = (rows(0L, 40, 10, 40, 10) ++ rows(1L, 5, 20, 5, 20))
      .toDF("s", "tr", "oc")
    val r2 = Profile.mantelHaenszel(conf, col("s"), col("tr"), col("oc"))
      .head()
    assert(r2.getAs[Double]("mh_or") == 1.0,
      s"stratification must remove the confounding: ${r2}")
  }

  test("cochranArmitage: a clean positive dose-response gives t_num > 0; " +
      "a flat response gives exactly 0") {
    import org.apache.spark.sql.functions.col
    def grp(s: Long, succ: Int, fail: Int) =
      Seq.fill(succ)((s, true)) ++ Seq.fill(fail)((s, false))
    val up = (grp(0L, 1, 9) ++ grp(1L, 5, 5) ++ grp(2L, 9, 1))
      .toDF("s", "oc")
    val r = Profile.cochranArmitage(up, col("s"), col("oc")).head()
    assert(r.getAs[Long]("t_num") > 0L)
    assert(r.getAs[Long]("total_success") == 15L)
    assert(r.getAs[Long]("total_n") == 30L)
    // flat: same proportion everywhere -> N*Σsa == A*Σsn exactly
    val flat = (grp(0L, 3, 7) ++ grp(1L, 3, 7) ++ grp(2L, 3, 7))
      .toDF("s", "oc")
    val rf = Profile.cochranArmitage(flat, col("s"), col("oc")).head()
    assert(rf.getAs[Long]("t_num") == 0L)
  }
}
