package graft

import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.ops.Features

/** Model-input feature construction: hashing-trick buckets and
  * leave-one-out target encoding. */
class FeaturesSpec extends SparkSpec {

  import spark.implicits._

  test("hashBucket: stable, in range, equals the mod-P fold mod buckets") {
    val df = Seq("et=click", "et=view", "et=click").toDF("f")
      .select(col("f"), Features.hashBucket(col("f"), 64).as("b"),
        TextHash.wordHash(col("f")).as("h"))
    val rows = df.collect()
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0L && b < 64L)
      assert(b == ((r.getLong(2) % 64L) + 64L) % 64L)
    }
    // same value -> same bucket, regardless of row
    assert(rows(0).getLong(1) == rows(2).getLong(1))
    intercept[IllegalArgumentException] {
      Features.hashBucket(col("f"), 0)
    }
  }

  test("targetEncodeLoo: excludes self, exact on 2^-20-representable " +
    "targets, NULL for singleton categories") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 4.5), // LOO means: 3.25, 2.75, 1.5
      ("b", 7.0)) //                         singleton -> NULL
      .toDF("cat", "y")
    val got = Features.targetEncodeLoo(df, "cat", "y")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("a", 1.0)) == Some(3.25))
    assert(got(("a", 2.0)) == Some(2.75))
    assert(got(("a", 4.5)) == Some(1.5))
    assert(got(("b", 7.0)).isEmpty)
  }

  test("imputeByGroupMedian: fills nulls with the group median, flags " +
    "them, leaves all-null groups null") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", Some(100.0)), ("a", None),
      ("b", Some(7.0)), ("b", None),
      ("c", None), ("c", None)).toDF("g", "v")
    val got = Features.imputeByGroupMedian(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getBoolean(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    // a: median of (1, 3, 100) = 3 — the robust choice, not the mean
    assert(got.filter(t => t._1 == "a" && t._2) ==
      Seq(("a", true, Some(3.0))))
    assert(got.filter(t => t._1 == "b" && t._2) ==
      Seq(("b", true, Some(7.0))))
    // all-null group: nothing to impute from
    assert(got.filter(_._1 == "c").forall(t => t._2 && t._3.isEmpty))
    assert(got.count(!_._2) == 4) //        non-missing rows pass through
  }

  test("targetEncodeLoo: partitioning-invariant (exact integer moments)") {
    val rng = new scala.util.Random(31)
    val rows = (0 until 500).map(i =>
      (s"c${i % 7}", rng.nextDouble() * 100.0))
    val run = (p: Int) =>
      Features.targetEncodeLoo(
        rows.toDF("cat", "y").repartition(p), "cat", "y")
        .collect().map(r => (r.getString(0), r.getDouble(1),
          r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(13))
  }

  test("woeEncode: smoothed WoE and IV terms from exact counts") {
    import org.apache.spark.sql.functions._
    // cat a: 3 pos / 1 neg; cat b: 1 pos / 3 neg → tp=4, tn=4
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0)).toDF("c", "y")
    val got = Features.woeEncode(df, "c", col("y") === 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val woeA = java.math.BigDecimal.valueOf(math.log((3.5 / 4.5) / (1.5 / 4.5)))
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got("a")._1 == 4L && got("a")._2 == 3L && got("a")._3 == 1L)
    assert(got("a")._4 == woeA)
    // symmetric corpus → b's woe is exactly -woe(a), IV terms equal
    assert(got("b")._4 == -woeA)
    assert(got("a")._5 == got("b")._5 && got("a")._5 > 0.0)
  }

  test("woeEncode: one-class corpus yields NULL iv, finite woe") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 1), ("b", 1)).toDF("c", "y")
    val rows = Features.woeEncode(df, "c", col("y") === 1).collect()
    assert(rows.forall(r => !r.isNullAt(4))) // smoothing keeps woe finite
    assert(rows.forall(_.isNullAt(5)))       // no IV without both classes
  }

  test("quantileBin: SQL ntile semantics (first bins take the extra " +
    "rows), id tie-break, NULL passthrough, partitioning-invariant") {
    import spark.implicits._
    // 10 rows into 4 bins → sizes 3,3,2,2 in (value, id) order
    val df = (1L to 10L).map(i => (i, "g", Some((i * 7 % 10).toDouble)))
      .toDF("id", "g", "x")
      .unionByName(Seq((99L, "g", Option.empty[Double])).toDF("id", "g", "x"))
    val got = Features.quantileBin(df, "g", "x", "id", bins = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(99L).isEmpty)
    val order = (1L to 10L).sortBy(i => ((i * 7 % 10).toDouble, i))
    val sizes = Seq(3, 3, 2, 2)
    val expected = sizes.zipWithIndex.flatMap { case (sz, b) =>
      Seq.fill(sz)(b + 1L)
    }
    order.zip(expected).foreach { case (id, b) =>
      assert(got(id).contains(b), s"id $id expected bin $b, got ${got(id)}")
    }
    val p13 = Features.quantileBin(df.repartition(13), "g", "x", "id", 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(p13 == got)
  }

  // A linearly separable fixture: y = 1 iff x1 > 0.5, with x2 noise
  // decorrelated from y. Big enough that the quantized Hessian is
  // comfortably non-singular.
  private def logregFixture(n: Int) = {
    val rows = (1 to n).map { i =>
      val x1 = (i % 101).toDouble / 100.0
      val x2 = ((i * 37) % 97).toDouble / 97.0
      (x1, x2, if (x1 > 0.5) 1.0 else 0.0)
    }
    rows.toDF("x1", "x2", "y")
  }

  test("irlsLogreg: bit-identical weights across partitionings (the " +
      "floor-quantized BIGINT moment lane is order-independent)") {
    val df = logregFixture(500)
    val base = Features.irlsLogreg(df, "x1", "x2", "y", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    Seq(1, 7, 32).foreach { p =>
      val got = Features.irlsLogreg(df.repartition(p), "x1", "x2", "y", 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1)
      // == on Double tuples: bit-identity, not approximate equality
      assert(got.sameElements(base), s"weights drifted at p=$p")
    }
  }

  test("irlsLogreg: learns the separating direction and improves " +
      "round over round on a separable fixture") {
    val df = logregFixture(500)
    val w = Features.irlsLogreg(df, "x1", "x2", "y", rounds = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (_, w1r1, _) = w(1L)
    val (w0, w1, w2) = w(2L)
    assert(w1r1 > 0.0, "round-1 x1 weight should already be positive")
    assert(w1 > w1r1, "Newton step 2 should sharpen the x1 weight")
    assert(math.abs(w2) < w1 / 2,
      "noise feature x2 should carry much less weight than x1")
    // The learned boundary classifies the fixture well: check accuracy
    val rows = df.collect()
    val acc = rows.count { r =>
      val z = w0 + w1 * r.getDouble(0) + w2 * r.getDouble(1)
      (z > 0) == (r.getDouble(2) > 0.5)
    }.toDouble / rows.length
    assert(acc > 0.9, s"post-round-2 training accuracy $acc <= 0.9")
  }

  test("irlsLogreg: rejects rounds < 1 and a singular Hessian fails " +
      "loud (constant features)") {
    intercept[IllegalArgumentException] {
      Features.irlsLogreg(logregFixture(10), "x1", "x2", "y", rounds = 0)
    }
    val degenerate = Seq((1.0, 1.0, 1.0), (1.0, 1.0, 0.0))
      .toDF("x1", "x2", "y")
    intercept[IllegalArgumentException] {
      Features.irlsLogreg(degenerate, "x1", "x2", "y", rounds = 1).collect()
    }
  }
}
