package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.ops.Similarity

/** Unit specs for embedding similarity (dot/norm/bucket/top-k) and the
  * multimodal decode plumbing. */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("groupCentroids: exact element-wise means in long layout") {
    val df = Seq(
      (1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0)),     // means (2.0, 3.0)
      (2, Seq(-1.5, 0.25))).toDF("label", "embedding")
    val got = Similarity.groupCentroids(df, "label", "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // all inputs are exact binary fractions → fixed point is lossless
    assert(got((1, 0L)) == (2L, 2.0))
    assert(got((1, 1L)) == (2L, 3.0))
    assert(got((2, 0L)) == (1L, -1.5))
    assert(got((2, 1L)) == (1L, 0.25))
  }

  test("pcaPowerIteration recovers the dominant axis of an " +
    "anisotropic cloud, unit norm, partitioning-invariant") {
    val rng = new scala.util.Random(5)
    // variance 100x larger along dim 2 of 4; noise elsewhere
    val rows = (1 to 400).map { _ =>
      Seq(rng.nextGaussian() * 0.01, rng.nextGaussian() * 0.01,
        rng.nextGaussian() * 0.5, rng.nextGaussian() * 0.01)
    }.toDF("embedding")
    val v = Similarity.pcaPowerIteration(rows, "embedding", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v.size == 4)
    val norm = math.sqrt(v.values.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    assert(math.abs(v(2L)) > 0.99,
      s"dominant axis not recovered: $v")
    val again = Similarity.pcaPowerIteration(
      rows.repartition(13), "embedding", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == v)
  }

  test("centroidOutliers flags the planted far point and nothing in " +
    "the tight cluster below the threshold") {
    val rng = new scala.util.Random(3)
    // 200 points near the origin + one planted far outlier
    val near = (1L to 200L).map(i =>
      (i, 0, Seq(rng.nextGaussian() * 0.01, rng.nextGaussian() * 0.01)))
    val far = Seq((999L, 0, Seq(5.0, 5.0)))
    val df = (near ++ far).toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "label",
      "embedding")
      .collect().map(_.getLong(0)).toSet
    assert(out.contains(999L), s"planted outlier not flagged: $out")
    // p99 of 201 points flags at most a handful
    assert(out.size <= 4, s"too many flagged: ${out.size}")
  }

  test("pcaProjection: scores are the centered projection onto the " +
    "dominant axis — anisotropic cloud scores track that dim") {
    val rng = new scala.util.Random(9)
    val rows = (1L to 300L).map { i =>
      (i, Seq(rng.nextGaussian() * 0.01, rng.nextGaussian() * 0.5,
        rng.nextGaussian() * 0.01))
    }.toDF("vec_id", "embedding")
    val scores = Similarity.pcaProjection(rows, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.size == 300)
    // projection onto the dim-1 axis (up to sign): |score| correlates
    // with |x_1 - mean_1|; check via the raw data
    val raw = rows.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)(1)).toMap
    val m1 = raw.values.sum / raw.size
    val corr = {
      val xs = raw.keys.toSeq.sorted.map(k => raw(k) - m1)
      val ys = raw.keys.toSeq.sorted.map(scores)
      val num = xs.zip(ys).map { case (a, b) => a * b }.sum
      math.abs(num) / (math.sqrt(xs.map(a => a * a).sum) *
        math.sqrt(ys.map(b => b * b).sum))
    }
    assert(corr > 0.99, s"projection not aligned with dominant dim: $corr")
  }

  test("centroidDrift: pairwise cosines between exact group centroids, " +
    "a < b ordering") {
    val df = Seq(
      (0, Seq(1.0, 0.0)), (0, Seq(1.0, 0.0)), // centroid (1, 0)
      (1, Seq(0.0, 2.0)),                     // centroid (0, 2)
      (2, Seq(2.0, 0.0)))                     // centroid (2, 0)
      .toDF("label", "embedding")
    val got = Similarity.centroidDrift(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((0, 1), (0, 2), (1, 2)))
    assert(got((0, 1)) == 0.0) // orthogonal
    assert(got((0, 2)) == 1.0) // parallel
    assert(got((1, 2)) == 0.0)
  }

  test("dot and norm fold left-to-right over array columns") {
    val df = emb((1L, Seq(1.0, 2.0, 3.0)))
      .select(
        Similarity.dot(col("embedding"), col("embedding")).as("d"),
        Similarity.norm(col("embedding")).as("n"))
    val r = df.head()
    assert(r.getDouble(0) == 14.0)
    assert(r.getDouble(1) == math.sqrt(14.0))
  }

  test("hyperplaneBucket is deterministic and within [0, 2^planes)") {
    val df = emb(
      (1L, Seq.tabulate(8)(i => i.toDouble)),
      (2L, Seq.tabulate(8)(i => i.toDouble)),
      (3L, Seq.tabulate(8)(i => -i.toDouble)))
      .select(col("vec_id"),
        Similarity.hyperplaneBucket(col("embedding"), 8, 4).as("b"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L)) // identical vectors → identical bucket
    assert(m.values.forall(b => b >= 0 && b < 16))
    assert(m(1L) != m(3L)) // opposite vector flips every nonzero projection
  }

  test("randomProject: ±1 signs on one-hot inputs, linear, deterministic") {
    // one-hot e_0: each projection is exactly the ±1 sign of plane i at j=0
    val oneHot = emb((1L, 1.0 +: Seq.fill(7)(0.0)))
    val p1 = Similarity.randomProject(oneHot, "vec_id", "embedding", 8, 4)
      .drop("vec_id").head().toSeq.map(_.asInstanceOf[Double])
    assert(p1.forall(v => v == 1.0 || v == -1.0))
    // linearity: project(2v) = 2 * project(v)
    val v = Seq.tabulate(8)(i => (i + 1).toDouble)
    val both = emb((1L, v), (2L, v.map(_ * 2)))
    val rows = Similarity.randomProject(both, "vec_id", "embedding", 8, 4)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => r.getDouble(i))).toMap
    assert(rows(2L) == rows(1L).map(_ * 2))
    // deterministic across evaluations
    val again = Similarity.randomProject(both, "vec_id", "embedding", 8, 4)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => r.getDouble(i))).toMap
    assert(again == rows)
  }

  test("bruteForceTopK ranks by exact cosine, excludes self") {
    val df = emb(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(2.0, 0.0)),  // cos=1 with query
      (2L, Seq(1.0, 1.0)),  // cos≈0.707
      (3L, Seq(0.0, 1.0)))  // cos=0
    val got = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") === 0, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("lshTopK only ranks same-bucket candidates; ranking matches brute force there") {
    val vecs = (0L until 40L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 40)
    val lsh = Similarity.lshTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 40, dim = 8, planes = 2)
    // every LSH neighbor appears in brute-force order: relative order preserved
    val bruteOrder = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.sortBy(_._3).map(_._2).toSeq }
    val lshOrder = lsh.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.sortBy(_._3).map(_._2).toSeq }
    lshOrder.foreach { case (q, neighbors) =>
      val filtered = bruteOrder(q).filter(neighbors.contains)
      assert(filtered == neighbors) // same relative order as exact ranking
    }
  }

  test("sq8TopK with rerank = corpus size reproduces brute force exactly") {
    val vecs = (0L until 30L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 10)
    val sq8 = Similarity.sq8TopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 10, rerank = 30)
    assertSameRows(sq8, brute) // full-rerank = exact, quantization only prunes
  }

  test("pqTopK with rerank = corpus size reproduces brute force exactly") {
    val vecs = (0L until 40L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 10)
    val pq = Similarity.pqTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 10, dim = 8, mSub = 2, kCodes = 8,
      rerank = 40)
    assertSameRows(pq, brute) // full-rerank = exact; PQ only prunes
  }

  test("pqTopK achieves reasonable recall at modest rerank") {
    val vecs = (0L until 80L).map(i =>
      (i, Seq.tabulate(8)(j => math.cos(i * 3 + j * 1.7 + 1.0))))
    val df = emb(vecs: _*)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 5, dim = 8, mSub = 2, kCodes = 8,
      rerank = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ recall $recall below floor")
  }

  test("ivfPqTopK: nprobe = all cells + corpus-wide rerank reproduces " +
      "brute force exactly; modest probe/rerank keeps useful recall") {
    val vecs = (0L until 80L).map(i =>
      (i, Seq.tabulate(8)(j => math.cos(i * 3 + j * 1.7 + 1.0))))
    val df = emb(vecs: _*)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 5)
    // exhaustive config: every cell probed, rerank = corpus — IVF-PQ
    // only PRUNES, so this must equal brute force
    val full = Similarity.ivfPqTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 5, dim = 8, kCells = 4, coarseIters = 1,
      nprobe = 4, mSub = 2, kCodes = 8, rerank = 80)
    assertSameRows(full, brute)
    val bruteSet = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 5, dim = 8, kCells = 4, coarseIters = 1,
      nprobe = 2, mSub = 2, kCodes = 8, rerank = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteSet intersect ivfpq).size.toDouble / bruteSet.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall below floor")
  }

  test("pqTopK rejects rerank < k and non-dividing subspaces") {
    val df = emb(1L -> Seq(1.0, 0.0))
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(df, "vec_id", "embedding", col("vec_id") < 1,
        k = 5, dim = 2, rerank = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(df, "vec_id", "embedding", col("vec_id") < 1,
        k = 1, dim = 2, mSub = 3, rerank = 1)
    }
  }

  test("sq8TopK achieves high recall at modest rerank") {
    val vecs = (0L until 60L).map(i =>
      (i, Seq.tabulate(8)(j => math.cos(i * 3 + j * 1.7 + 1.0))))
    val df = emb(vecs: _*)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Similarity.sq8TopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 5, rerank = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & sq8).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("sq8TopK rejects rerank < k") {
    val df = emb((0L, Seq(1.0)), (1L, Seq(1.0)))
    intercept[IllegalArgumentException] {
      Similarity.sq8TopK(df, "vec_id", "embedding", col("vec_id") < 1,
        k = 5, rerank = 3)
    }
  }

  test("ivfCells assigns every vector to exactly one cell of a centroid") {
    val vecs = (0L until 30L).map(i =>
      (i, Seq.tabulate(8)(j => math.cos(i * 8 + j + 0.5))))
    val cells = Similarity.ivfCells(emb(vecs: _*), "vec_id", "embedding", 4)
    val rows = cells.collect().map(r => r.getLong(0) -> r.getLong(3))
    assert(rows.length == 30)                       // one row per vector
    assert(rows.map(_._2).forall(c => c >= 0 && c < 4)) // cell ∈ centroid ids
    // a centroid lands in its own cell (cos with itself = 1, the max)
    val own = rows.toMap
    (0L until 4L).foreach(c => assert(own(c) == c))
  }

  test("ivfTopK ranking matches brute force within the query's cell") {
    val vecs = (0L until 40L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.sortBy(_._3).map(_._2).toSeq }
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding",
      col("vec_id") < 3, k = 40, nCentroids = 4, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.sortBy(_._3).map(_._2).toSeq }
    ivf.foreach { case (q, neighbors) =>
      assert(brute(q).filter(neighbors.contains) == neighbors)
    }
  }

  /** Recall vs brute force: fraction of exact top-k found, averaged. */
  private def recall(
      approx: Map[Long, Seq[Long]], exact: Map[Long, Seq[Long]], k: Int): Double = {
    val per = exact.map { case (q, top) =>
      val gold = top.take(k).toSet
      approx.getOrElse(q, Nil).count(gold).toDouble / gold.size
    }
    per.sum / per.size
  }

  private def topMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, a) => q -> a.sortBy(_._3).map(_._2).toSeq }

  test("multi-probe LSH and nprobe IVF monotonically improve recall") {
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    val pred = col("vec_id") < 8
    val k = 10
    val exact = topMap(Similarity.bruteForceTopK(df, "vec_id", "embedding", pred, k))
    def lshRecall(p: Int) = recall(topMap(Similarity.lshTopK(
      df, "vec_id", "embedding", pred, k, dim = 8, planes = 3, probes = p)), exact, k)
    def ivfRecall(np: Int) = recall(topMap(Similarity.ivfTopK(
      df, "vec_id", "embedding", pred, k, nCentroids = 6, nprobe = np)), exact, k)
    val (l1, l4) = (lshRecall(1), lshRecall(4))
    val (i1, i3) = (ivfRecall(1), ivfRecall(3))
    assert(l4 >= l1, s"multi-probe must not lose recall: $l4 < $l1")
    assert(i3 >= i1, s"nprobe must not lose recall: $i3 < $i1")
    // and on this seeded corpus the knobs actually BUY recall
    assert(l4 > l1, s"probes=4 should find more than probes=1 (got $l1 -> $l4)")
    assert(i3 > i1, s"nprobe=3 should find more than nprobe=1 (got $i1 -> $i3)")
  }

  test("kmeans centroids are deterministic, learned, and keep k rows") {
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    def snap(c: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Double])] =
      c.select(col("cid"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    val a = snap(Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 6, iters = 2))
    val b = snap(Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 6, iters = 2))
    assert(a == b, "two identical trainings must be bit-identical")
    assert(a.map(_._1) == (0L until 6L))
    val init = snap(Similarity.firstNCentroids(df, "vec_id", "embedding", 6))
    assert(a.map(_._2) != init.map(_._2), "Lloyd's iterations must move centroids")
  }

  test("learned-cell IVF recall meets the first-N baseline") {
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    val pred = col("vec_id") < 8
    val k = 10
    val exact = topMap(Similarity.bruteForceTopK(df, "vec_id", "embedding", pred, k))
    val learned = Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 6, iters = 2)
    val rLearned = recall(topMap(Similarity.ivfTopK(
      df, "vec_id", "embedding", pred, k, learned, nprobe = 2)), exact, k)
    val rFirstN = recall(topMap(Similarity.ivfTopK(
      df, "vec_id", "embedding", pred, k, nCentroids = 6, nprobe = 2)), exact, k)
    assert(rLearned >= rFirstN,
      s"learned cells should not lose recall vs first-N ($rLearned < $rFirstN)")
  }

  test("kmeans samplePercent trains on the hash sample but still yields k cells") {
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))))
    val df = emb(vecs: _*)
    val c = Similarity.kmeansCentroids(
      df, "vec_id", "embedding", k = 4, iters = 1, samplePercent = 50)
    assert(c.count() == 4)
  }

  test("cosineNearDupPairs finds a planted duplicate pair") {
    val base = Seq.tabulate(8)(i => (i + 1).toDouble)
    val df = emb(
      (1L, base),
      (2L, base.map(_ * 2.0)),          // same direction → cos = 1
      (3L, Seq.tabulate(8)(i => math.cos(i * 3.7))))
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      dim = 8, planes = 2, minCos = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("multimodal decode: deterministic stub metadata, binary column dropped") {
    val df = Seq(
      (1L, "image", "abc"),
      (2L, "video", "abc"),
      (3L, "audio", "xyz"))
      .toDF("id", "mtype", "payload")
      .withColumn("content", col("payload").cast("binary"))
    val out = Multimodal.decodeFrame(df, "id", "content", "mtype")
    assert(out.columns.toSeq ==
      Seq("id", "mediaType", "nBytes", "checksum", "width", "height", "nFrames"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    // checksum of "abc": ((7*31+97)*31+98)*31+99 % P
    val ck = "abc".foldLeft(7L)((a, c) => (a * 31 + c) % 1000000007L)
    assert(rows(1L)._3 == ck)
    assert(rows(2L)._3 == ck)        // same bytes → same checksum
    assert(rows(1L)._6 == 1)         // image: 1 frame
    assert(rows(2L)._6 == (ck % 240L + 1L).toInt) // video frames from checksum
    assert(rows(1L)._2 == 3L)
  }

  test("resize plan preserves aspect ratio, never upscales, floors at 1px") {
    val meta = Seq(
      (1L, 640, 480),   // downscale, limited by width: 320x240
      (2L, 100, 100),   // smaller than target: unchanged (no upscale)
      (3L, 2000, 10),   // extreme aspect: width-bound, height floors at 1
      (4L, 10, 2000))   // extreme aspect the other way
      .toDF("id", "width", "height")
    val out = Multimodal.resizePlan(meta, 320, 240)
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) == ((320, 240)))
    assert(out(2L) == ((100, 100)))
    assert(out(3L)._1 == 320 && out(3L)._2 >= 1)
    assert(out(4L)._2 == 240 || out(4L)._2 >= 1)
    // aspect ratio of the width-bound case is exactly preserved
    assert(out(1L)._1 * 480 == out(1L)._2 * 640)
  }

  test("frame sampling: k evenly spaced indices, short clips keep all frames") {
    val meta = Seq((1L, 240), (2L, 3), (3L, 1)).toDF("id", "nFrames")
    val out = Multimodal.frameSamplePlan(meta, 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(out(1L) == Seq(0L, 59L, 119L, 179L, 239L))
    assert(out(2L) == Seq(0L, 1L, 2L))
    assert(out(3L) == Seq(0L))
  }

  test("feature plan emits dim deterministic doubles in [0, 1)") {
    val meta = Seq((1L, 12345L), (2L, 12345L), (3L, 999L)).toDF("id", "checksum")
    val out = Multimodal.featurePlan(meta, 3)
    assert(out.columns.toSeq == Seq("id", "checksum", "f0", "f1", "f2"))
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows(1L) == rows(2L)) // same checksum → same features
    assert(rows(1L) != rows(3L))
    rows.values.foreach { case (a, b, c) =>
      Seq(a, b, c).foreach(x => assert(x >= 0.0 && x < 1.0))
    }
  }

  test("decode batches partitions without dropping or duplicating rows") {
    val n = 257 // deliberately not a multiple of the batch size
    val ds = spark.range(n).select(
      col("id"),
      lit("image").as("mediaType"),
      col("id").cast("string").cast("binary").as("content"))
      .as[Multimodal.MediaRecord]
    val out = Multimodal.decode(ds, batchSize = 64)
    assert(out.count() == n)
    assert(out.select("id").distinct().count() == n)
  }

  private def kcenter(df: org.apache.spark.sql.DataFrame, k: Int) =
    Similarity.farthestPointSample(df, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("farthestPointSample: seeds at min id, then picks by least cosine") {
    // Unit vectors at 0°, 5°, 90°, 180°: seed 1, then the antipode 4
    // (cos -1), then the orthogonal 3 (max-cos 0 beats 2's 0.996).
    val df = emb(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.996, 0.087),
      3L -> Seq(0.0, 1.0), 4L -> Seq(-1.0, 0.0))
    assert(kcenter(df, 3) == Seq((0L, 1L), (1L, 4L), (2L, 3L)))
  }

  test("farthestPointSample: picks are distinct; k > n stops early") {
    val df = emb(7L -> Seq(1.0, 0.0), 9L -> Seq(0.0, 1.0))
    val got = kcenter(df, 5)
    assert(got == Seq((0L, 7L), (1L, 9L)))
  }

  private def kcenterScalable(
      df: org.apache.spark.sql.DataFrame, k: Int, ell: Int, rounds: Int) =
    Similarity.farthestPointSampleScalable(
      df, "vec_id", "embedding", k, ell, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("farthestPointSampleScalable equals exact greedy when the " +
    "candidate budget covers the corpus") {
    val rnd = new scala.util.Random(42)
    val df = emb((1L to 30L).map(i =>
      i -> Seq.fill(4)(rnd.nextGaussian())): _*)
    // 1 + 16*2 = 33 >= 30: candidates are the whole corpus
    assert(kcenterScalable(df, 6, ell = 16, rounds = 2) == kcenter(df, 6))
  }

  test("farthestPointSampleScalable: k distinct picks; objective within " +
    "2x of greedy on random data even when oversampling truncates") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 120L).map(i => i -> Seq.fill(6)(rnd.nextGaussian()))
    val df = emb(pts: _*)
    val exact = kcenter(df, 8).map(_._2)
    val approx = kcenterScalable(df, 8, ell = 4, rounds = 3).map(_._2)
    assert(approx.distinct.size == 8)
    assert(approx.forall(id => pts.exists(_._1 == id)))
    // max-over-points of min angular distance to the chosen centers
    def cosOf(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def objective(centers: Seq[Long]): Double = {
      val cv = centers.map(id => pts.find(_._1 == id).get._2)
      pts.map { case (_, v) =>
        1.0 - cv.map(c => cosOf(v, c)).max // min distance = 1 - max cos
      }.max
    }
    assert(objective(approx) <= 2.0 * objective(exact) + 1e-9)
  }

  test("semanticDedup: min-id representative per in-cell near-dup set") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cid", "cv").withColumn("cnrm", lit(1.0))
    val df = emb(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.99, 0.05), 5L -> Seq(0.95, 0.1),
      3L -> Seq(0.6, 0.8), 4L -> Seq(0.05, 1.0))
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
        cents, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // cell 0 = {1, 2, 5}: pairwise cos > 0.99 → only min id 1 survives
    assert(got(1L) == (0L, true))
    assert(got(2L) == (0L, false))
    assert(got(5L) == (0L, false))
    // cell 1 = {3, 4}: cos(3,4) ≈ 0.83 < 0.9 → both survive
    assert(got(3L) == (1L, true))
    assert(got(4L) == (1L, true))
  }

  test("semanticDedup: a zero vector neither absorbs its cell nor is absorbed") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cid", "cv").withColumn("cnrm", lit(1.0))
    // the zero vector has the LOWEST id — unguarded NaN >= τ would mark
    // every other cell member a duplicate of it
    val df = emb(
      1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 0.0), 3L -> Seq(0.1, 0.9),
      4L -> Seq(0.99, 0.02))
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
        cents, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(1L))            // zero vector survives
    assert(got(2L) && got(3L)) // dissimilar real vectors survive
    assert(!got(4L))           // true near-dup of 2 still pruned
  }

  test("semanticDedup: identical across partitionings") {
    val rng = new scala.util.Random(17)
    val rows = (0L until 300L).map(i => i -> Seq.fill(8)(rng.nextGaussian()))
    val run = (parts: Int) => {
      val df = emb(rows: _*).repartition(parts)
      Similarity.semanticDedup(df, "vec_id", "embedding",
          Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 4, iters = 2),
          threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    }
    assert(run(1) == run(11))
  }

  test("farthestPointSample: identical across partitionings") {
    val rng = new scala.util.Random(3)
    val rows = (0L until 200L).map(i =>
      i -> Seq.fill(8)(rng.nextGaussian()))
    val a = kcenter(emb(rows: _*).repartition(1), 6)
    val b = kcenter(emb(rows: _*).repartition(13), 6)
    assert(a == b && a.map(_._2).distinct.size == 6)
  }

  test("hardMining: most-similar other-label, least-similar same-label") {
    import org.apache.spark.sql.functions._
    // anchor 0 (label 0) at e1; same-label 1 (0.9-ish aligned), 2 (orthogonal-ish)
    // other-label 3 (nearly aligned = hardest negative), 4 (opposite)
    val df = Seq(
      (0L, Seq(1.0, 0.0), 0),
      (1L, Seq(0.9, 0.1), 0),
      (2L, Seq(0.1, 0.9), 0),
      (3L, Seq(0.95, 0.05), 1),
      (4L, Seq(-1.0, 0.0), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardMining(df, "vec_id", "embedding", "label",
      col("vec_id") === 0L).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 3L) // hardest negative: closest other-label
    assert(r.getLong(2) == 2L) // hardest positive: farthest same-label
  }

  test("nearestCentroidAccuracy: clean clusters classify perfectly, " +
    "a crossover misclassifies") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (0L, Seq(1.0, 0.0), 0), (1L, Seq(0.9, 0.1), 0),
      (2L, Seq(0.0, 1.0), 1), (3L, Seq(0.1, 0.9), 1),
      (4L, Seq(0.05, 0.95), 0)) // label-0 point sitting in cluster 1
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.nearestCentroidAccuracy(
      df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 2L)))        // cluster 1 all correct
    assert(got(0L)._1 == 3L && got(0L)._2 <= 2L) // the stray drags 0 down
  }

  test("knnLabelAccuracy: majority vote, ties to the smallest label") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (0L, Seq(1.0, 0.0), 0),    // query, label 0
      (1L, Seq(0.99, 0.01), 0),  // close, label 0
      (2L, Seq(0.98, 0.02), 0),  // close, label 0
      (3L, Seq(0.0, 1.0), 1))    // far, label 1
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.knnLabelAccuracy(df, "vec_id", "embedding",
      "label", col("vec_id") === 0L, k = 3).collect().head
    assert(r.getInt(1) == 0 && r.getInt(2) == 0 && r.getLong(3) == 2L)
    assert(r.getBoolean(4))
    // 1-1 vote tie → smaller label wins
    val tie = Seq((0L, Seq(1.0, 0.0), 9),
      (1L, Seq(0.9, 0.1), 5), (2L, Seq(0.8, 0.2), 3))
      .toDF("vec_id", "embedding", "label")
    val r2 = Similarity.knnLabelAccuracy(tie, "vec_id", "embedding",
      "label", col("vec_id") === 0L, k = 2).collect().head
    assert(r2.getInt(2) == 3 && !r2.getBoolean(4))
  }

  test("sampleCoverage: self-match pins sample rows, quantized exact sum") {
    import org.apache.spark.sql.functions._
    // sample = {id 0}: e1; corpus rows at e1 (cos 1), e2 (cos 0)
    val df = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(2.0, 0.0)), (2L, Seq(0.0, 3.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.sampleCoverage(df, "vec_id", "embedding",
      col("vec_id") === 0L).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    // covers: 1e8 (self), 1e8 (parallel), 0 (orthogonal)
    assert(r.getLong(2) == 200000000L && r.getLong(3) == 0L)
    assert(r.getDouble(4) == 2.0e8 / 3.0 / 1.0e8)
  }

  test("hardMining: anchors without an other-label candidate drop") {
    import org.apache.spark.sql.functions._
    val df = Seq((0L, Seq(1.0, 0.0), 0), (1L, Seq(0.5, 0.5), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardMining(df, "vec_id", "embedding", "label",
      col("vec_id") === 0L).count() == 0L)
  }

  test("labelSilhouette: orthogonal clusters score 1, single label empty") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.0, 0.0), 0), (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(0.0, 1.0), 1), (3L, Seq(0.0, 1.0), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelSilhouette(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3)))).toMap
    // a = 0 (vector IS the centroid), b = 1 (orthogonal) → s = 1 exactly.
    assert(got(0L) == ((2L, 1.0)) && got(1L) == ((2L, 1.0)))
    // A vector midway between centroids drags its label's mean below 1.
    val noisy = df.union(
      Seq((4L, Seq(0.8, 0.6), 0)).toDF("vec_id", "embedding", "label"))
    val m = Similarity
      .labelSilhouette(noisy, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(0L) < 1.0 && m(0L) > 0.0 && m(1L) <= 1.0)
    // One label only → no "other" centroid → empty result.
    val single = Seq((0L, Seq(1.0, 0.0), 0), (1L, Seq(0.9, 0.1), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.labelSilhouette(single, "vec_id", "embedding",
      "label").count() == 0L)
  }

  test("bqTopK: sign-bit shortlist still surfaces the exact nearest; " +
      "recall tracks brute force at full rerank width") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val emb = (0L until 60L).map(i =>
      (i, Seq.fill(64)(rng.nextGaussian()))).toDF("vec_id", "embedding")
    val bq = Similarity.bqTopK(emb, "vec_id", "embedding",
      col("vec_id") < 3, k = 5, rerank = 59)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1))
      .toMap
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("vec_id") < 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1))
      .toMap
    // With rerank covering the whole corpus, the exact-rerank stage
    // makes BQ equal brute force — the shortlist cannot lose anyone.
    assert(bq == brute)
    // A narrow shortlist still recalls most true neighbors (sign bits
    // preserve angular neighborhoods on gaussian data).
    val narrow = Similarity.bqTopK(emb, "vec_id", "embedding",
      col("vec_id") < 3, k = 5, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val inter = narrow.intersect(brute.keySet)
    assert(inter.size >= 9, s"recall too low: ${inter.size}/15")
  }

  test("mmrSelect: diversity term demotes the redundant runner-up") {
    import spark.implicits._
    // Query along x. Candidate 1 is nearly the query (top relevance);
    // candidate 2 is almost identical to 1 (high relevance, redundant);
    // candidate 3 is at 45° (lower relevance, novel). Pure top-2 by
    // relevance = {1, 2}; MMR at λ=0.5 must pick {1, 3}.
    val emb = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(1.0, 0.3)),
      (2L, Seq(1.0, 0.31)),
      (3L, Seq(1.0, -0.3)),
      (9L, Seq(0.0, 0.0))) // zero-norm: excluded, never poisons a max
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(emb, "vec_id", "embedding",
      queryId = 0L, k = 3, poolSize = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L) // the query itself is its own best match
    assert(got(1L) == 1L)
    assert(got(2L) == 3L) // novelty beats redundancy at pick 3
    // k capped by pool; picks are distinct.
    val all = Similarity.mmrSelect(emb, "vec_id", "embedding",
      queryId = 0L, k = 8, poolSize = 8).collect()
    assert(all.length == 4) // 4 nonzero vectors
    assert(all.map(_.getLong(1)).distinct.length == 4)
  }

  test("nnDescentRound: exactly k ranked rows per node, and recall vs " +
      "brute-force kNN clears a floor the bare LSH buckets cannot") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
    val k = 4
    val refined = Similarity.nnDescentRound(
      emb, "vec_id", "embedding", dim = 64, planes = 4, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perSrc = refined.groupBy(_._1).view.mapValues(_.size)
    assert(perSrc.forall(_._2 <= k), "no node exceeds k neighbors")
    assert(perSrc.count(_._2 == k) > perSrc.size / 2,
      "most nodes reach the full k after candidate expansion")
    // brute-force truth on the driver
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val truth = vecs.keys.map { s =>
      s -> vecs.keys.filter(_ != s).toSeq
        .sortBy(t => (-cos(vecs(s), vecs(t)), t)).take(k).toSet
    }.toMap
    def recall(g: Set[(Long, Long)]): Double = {
      val hits = g.count { case (s, t) => truth(s).contains(t) }
      hits.toDouble / (truth.size * k)
    }
    // seed graph recall: the same LSH-bucket kNN the op starts from,
    // derived on the driver with the op's own bucket function
    val buckets = emb.select(col("vec_id"),
        Similarity.hyperplaneBucket(
          col("embedding").cast("array<double>"), 64, 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seed = vecs.keys.flatMap { s =>
      vecs.keys.filter(t => t != s && buckets(t) == buckets(s)).toSeq
        .sortBy(t => (-cos(vecs(s), vecs(t)), t)).take(k).map(s -> _)
    }.toSet
    val (rSeed, rRefined) = (recall(seed), recall(refined))
    assert(rRefined > rSeed,
      s"one NN-descent round must beat the seed: seed=$rSeed refined=$rRefined")
    assert(rRefined > 0.1, s"refined recall too low: $rRefined")
  }

  test("tripletMining: colinear hand fixture — the FaceNet band " +
      "(d2_pos, 2*d2_pos] admits exactly the planted semi-hard " +
      "negative; anchors with none surface NULLs") {
    import spark.implicits._
    // All vectors colinear (c * u) -> identical hyperplane signs ->
    // ONE bucket regardless of the hash; dyadic scalars make the
    // floor(x*2^20) quantization exact, so distances are exactly
    // (ca-cb)^2 * S in quantized space.
    val u = Seq(1.0, 0.5, 0.25, 0.125)
    val cs = Map(1L -> 1.0, 2L -> 1.25, 3L -> 1.3125, 4L -> 2.0)
    val emb = cs.toSeq.map { case (id, c) => (id, u.map(_ * c)) }
      .toDF("vec_id", "embedding")
    def qv(id: Long): Seq[Long] =
      u.map(x => math.floor(x * cs(id) * 1048576.0).toLong)
    def d2(a: Long, b: Long): Long =
      qv(a).zip(qv(b)).map { case (p, q) => (p - q) * (p - q) }.sum
    val got = graft.ops.Similarity
      .tripletMining(emb, "vec_id", "embedding", dim = 4, planes = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "one row per anchor with a +1 positive")
    // anchor 1 (pos 2): candidate 3 has d2 in (d2_pos, 2*d2_pos]; 4 is too far
    assert(got(1L).getLong(2) == d2(1L, 2L))
    assert(got(1L).getLong(3) == 1L)
    assert(got(1L).getLong(4) == 3L && got(1L).getLong(5) == d2(1L, 3L))
    assert(d2(1L, 3L) > d2(1L, 2L) && d2(1L, 3L) <= 2L * d2(1L, 2L))
    // anchors 2 and 3: nothing lands in the band -> zero + NULLs
    assert(got(2L).getLong(3) == 0L && got(2L).isNullAt(4))
    assert(got(3L).getLong(3) == 0L && got(3L).isNullAt(4))
  }

  test("hubnessCensus: colinear hand fixture — exact k-occurrence " +
      "histogram including the zero-occurrence antihub") {
    import spark.implicits._
    // c in {1,2,3,4,5,100} on one direction (one bucket): kNN(k=2) by
    // |dc| gives occurrences 1->1, 2->2, 3->4, 4->3, 5->2, 100->0
    // -> histogram {0:1, 1:1, 2:2, 3:1, 4:1}
    val u = Seq(1.0, 0.5, 0.25, 0.125)
    val emb = Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0,
      5L -> 5.0, 6L -> 100.0)
      .map { case (id, c) => (id, u.map(_ * c)) }
      .toDF("vec_id", "embedding")
    val got = graft.ops.Similarity
      .hubnessCensus(emb, "vec_id", "embedding", k = 2, dim = 4, planes = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("anisotropyCensus: orthonormal basis -> avg_cos exactly 0; " +
      "identical vectors -> avg_cos ~ 1; zero vectors excluded; " +
      "partitioning-invariant") {
    import spark.implicits._
    // 4 orthonormal basis vectors: every component of each unit vector
    // is exactly 0 or 1, so quantization is lossless and the pairwise
    // cosine sum is exactly zero. A zero vector must be dropped.
    val basis = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0),
      Seq(0.0, 0.0, 0.0, 0.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val b = Similarity.anisotropyCensus(basis, "vec_id", "embedding")
      .collect().head
    assert(b.getLong(0) == 4L)
    assert(b.getDouble(1) == 0.0)
    assert(math.abs(b.getDouble(2) - 0.25) < 1e-5) // R^2 = n/n^2
    val same = (1 to 50).map(i => (i.toLong, Seq(3.0, 4.0, 0.0, 12.0)))
      .toDF("vec_id", "embedding")
    val s = Similarity.anisotropyCensus(same, "vec_id", "embedding")
      .collect().head
    assert(s.getDouble(1) > 0.999 && s.getDouble(1) <= 1.0)
    assert(s.getDouble(2) > 0.999)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = Similarity.anisotropyCensus(emb, "vec_id", "embedding")
      .collect().head
    val p7 = Similarity.anisotropyCensus(
      emb.repartition(7), "vec_id", "embedding").collect().head
    assert(base.getLong(0) == p7.getLong(0) &&
      base.getDouble(1) == p7.getDouble(1) &&
      base.getDouble(2) == p7.getDouble(2))
  }

  test("kmeansParallelInit: weights partition the corpus, rounds are " +
      "bounded, seed is the min id, and everything is " +
      "partitioning-invariant") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = Similarity
      .kmeansParallelInit(df, "vec_id", "embedding", ell = 8, rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val got = run(emb)
    val n = emb.count()
    // every corpus point assigns to exactly one center
    assert(got.map(_._3).sum == n, s"weights must partition the corpus")
    assert(got.map(_._2).forall(r => r >= 0L && r <= 2L))
    // the seed (round 0) is the minimum vec_id, by construction
    val minId = emb.agg(min(col("vec_id"))).head().getLong(0)
    assert(got.filter(_._2 == 0L).map(_._1).toSeq == Seq(minId))
    // independent coins admit ~ell per round (loose envelope, not luck:
    // sum of n Bernoullis with Σp ≈ ell)
    val admitted = got.count(_._2 > 0L)
    assert(admitted >= 2 && admitted <= 40, s"admitted $admitted")
    Seq(1, 13).foreach { p =>
      assert(run(emb.repartition(p)).sameElements(got), s"drifted at p=$p")
    }
  }

  test("bitextMarginMine: near-colinear hand fixture — each source " +
      "pairs with its closest target, margins brute-force verified, " +
      "partitioning-invariant") {
    import spark.implicits._
    // All vectors u + a*w with tiny |a| and w ⊥ u share one hyperplane
    // bucket (the hubnessCensus colinearity trick: perturbations can't
    // flip any plane sign). cos(u+aw, u+bw) is monotone in how close
    // a and b are, so src a=0.001 pairs with tgt a=0.0011 and src
    // a=-0.002 with tgt a=-0.0019.
    val u = Seq(1.0, 0.5, 0.25, 0.125)
    val w = Seq(0.125, -0.25, 0.5, -1.0) // u·w = 0 exactly
    def vec(a: Double) = u.zip(w).map { case (x, y) => x + a * y }
    val rows = Seq(
      (1L, vec(0.001), 1), (2L, vec(-0.002), 1),            // sources
      (10L, vec(0.0011), 0), (11L, vec(-0.0019), 0),        // targets
      (12L, vec(0.01), 0))
    val emb = rows.toDF("vec_id", "embedding", "is_src")
    def run(df: org.apache.spark.sql.DataFrame) = Similarity
      .bitextMarginMine(df, "vec_id", "embedding",
        col("is_src") === 1, k = 4, dim = 4, planes = 2, minMargin = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    val got = run(emb)
    assert(got.map(g => g._1 -> g._2).toSeq == Seq(1L -> 10L, 2L -> 11L))
    // brute-force margin recomputation (no LSH, rank-ordered folds)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dotSeq(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      dotSeq(a, b) / (math.sqrt(dotSeq(a, a)) * math.sqrt(dotSeq(b, b)))
    }
    val srcs = rows.filter(_._3 == 1).map(r => r._1 -> r._2)
    val tgts = rows.filter(_._3 == 0).map(r => r._1 -> r._2)
    def topMean(self: Seq[Double], others: Seq[(Long, Seq[Double])]) = {
      val cs = others.map { case (id, v) => (cos(self, v), id) }
        .sortBy { case (c, id) => (-c, id) }.take(4).map(_._1)
      cs.foldLeft(0.0)(_ + _) / cs.size
    }
    got.foreach { case (sid, tid, gcos, gmargin) =>
      val sv = srcs.find(_._1 == sid).get._2
      val tv = tgts.find(_._1 == tid).get._2
      assert(math.abs(gcos - cos(sv, tv)) < 1e-12)
      val m = cos(sv, tv) / ((topMean(sv, tgts) + topMean(tv, srcs)) / 2.0)
      assert(math.abs(gmargin - m) < 1e-12, s"margin $gmargin vs brute $m")
      assert(gmargin > 1.0)
    }
    // bit-identical across partitionings
    Seq(1, 7).foreach { p =>
      assert(run(emb.repartition(p)).sameElements(got),
        s"drifted at p=$p")
    }
  }
}
