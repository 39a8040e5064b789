package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Model-input feature construction — the last hop of a training-data
  * pipeline before rows become tensors: categorical values need stable
  * integer ids without a fitted vocabulary, and categorical signals need
  * numeric encodings that do not leak the row's own label.
  *
  * Both operators here are row-local or single-aggregate shapes that hold
  * at 100 TB: no vocabulary broadcast, no per-category state on the
  * driver, no shuffle beyond one map-side-combinable hash aggregate.
  */
object Features {

  /** Hashing-trick feature index: `pmod(hash(name || '=' || value),
    * buckets)` — the stateless replacement for a fitted StringIndexer.
    * No vocabulary to build, broadcast, or version: any executor (and
    * any ENGINE — the polynomial mod-P fold is [[TextHash.wordHash]],
    * mirrored in SQL by `OracleSql.wordHash`) maps the same value to the
    * same bucket, so train/serve skew is impossible by construction.
    * Collisions are the accepted trade (buckets is the knob); crossed
    * features are just a longer feature string. Row-local — zero
    * shuffles, survives any scale. */
  def hashBucket(feature: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    pmod(TextHash.wordHash(feature), lit(buckets.toLong))
  }

  /** Leave-one-out target encoding: each row gets the mean target of its
    * category EXCLUDING itself — `(Σ_cat - x) / (n_cat - 1)` — the
    * standard leakage-free encoding for high-cardinality categoricals.
    * Categories with a single row emit NULL (no leave-one-out mean
    * exists).
    *
    * Determinism contract (same as [[Normalize.zscore]]): the target
    * quantizes to `floor(x * 2^20)` BIGINT and Σ_cat accumulates as an
    * exact integer sum — partition-order independent, mirrored exactly
    * by an oracle window sum — and the encoding is ONE double division
    * from those integers. Headroom: |x| < 8e12 before Σ of a trillion
    * rows threatens BIGINT; wider targets drop the scale.
    *
    * Cost: one hash aggregate keyed by category (map-side combinable),
    * one broadcast join back (one row per category — set
    * `broadcastMoments=false` to shuffle instead when categories number
    * in the millions). Output: input columns + `te` (double). */
  def targetEncodeLoo(
      df: DataFrame, catCol: String, targetCol: String,
      broadcastMoments: Boolean = true): DataFrame = {
    val q = 1048576L // 2^20, the corpus-wide fixed-point scale
    val qx = floor(col(targetCol) * lit(q.toDouble)).cast("long")
    val moments = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("__n"), sum(qx).as("__s"))
    val joined = df.join(
      if (broadcastMoments) broadcast(moments) else moments, catCol)
    joined
      .withColumn("te",
        when(col("__n") === 1, lit(null).cast("double"))
          .otherwise((col("__s") - qx).cast("double") /
            ((col("__n") - 1).cast("double") * lit(q.toDouble))))
      .drop("__n", "__s")
  }

  /** Missing-value imputation by per-group exact median — the standard
    * repair pass before featurization (median, not mean: robust to the
    * heavy tails corpus stats always have). Adds `was_missing` (the flag
    * models usually want alongside the filled value) and
    * `<valueCol>_imputed`; a group whose values are ALL null keeps null
    * (there is nothing to impute from — flag stays true).
    *
    * Determinism: Spark `percentile` == DuckDB `quantile_cont`, both
    * null-skipping. Scale: one per-group aggregate (groups reduce
    * map-side) + one join back — broadcast by AQE when the group frame
    * is small, shuffle otherwise; no window over the data rows. */
  def imputeByGroupMedian(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    df.join(med, Seq(groupCol))
      .withColumn("was_missing", col(valueCol).isNull)
      .withColumn(s"${valueCol}_imputed", coalesce(col(valueCol), col("__med")))
      .drop("__med")
  }

  /** Hashing-trick TF vectorizer — the stateless text twin of
    * [[hashBucket]]: each document becomes a sparse term-frequency
    * vector over `dim` hash buckets (token → word-hash mod dim), emitted
    * in sparse triplet form (idCol, bucket, tf). No fitted vocabulary
    * means no train/serve skew and no vocabulary broadcast — the
    * classic trade (hash collisions fold rare terms together) accepted
    * by every production hashing vectorizer.
    *
    * Scale: tokenize + hash are row-local (the shared codegen
    * [[graft.functions.TextHash]] kernels — the oracle replays bucket
    * ids exactly); the only shuffle is the (doc, bucket)-keyed count,
    * map-side combinable. Dense downstream consumers pivot the triplets
    * per doc; sparse ones (cosine, linear models) join on bucket. */
  def hashingTfVectorizer(
      df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    df.select(col(idCol),
        explode(graft.functions.TextHash.wordHashes(lower(col(textCol))))
          .as("__wh"))
      .select(col(idCol), pmod(col("__wh"), lit(dim.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Weight-of-evidence category encoding + information value — the
    * credit-scoring-lineage categorical encoder:
    * `woe(c) = ln( (pos_c + ½)/(POS + ½) ÷ (neg_c + ½)/(NEG + ½) )`
    * (the ½ is Laplace smoothing so empty cells stay finite), and each
    * category's IV term `(pos_c/POS − neg_c/NEG) · woe` sums to the
    * feature's predictive-power score.
    *
    * Emits per category: (category, n, n_pos, n_neg, woe, iv_term).
    *
    * Determinism: the four counts are exact BIGINTs off one aggregate;
    * `woe` is ONE `ln` over a fixed-shape ratio, pinned `round(·, 8)`
    * (the engine-wide libm discipline — BM25/entropy precedent), and
    * `iv_term` composes the pinned woe with two exact-count divisions,
    * itself pinned at 8.
    *
    * Scale: one map-side-combinable aggregate to O(categories) rows,
    * then a broadcast 1-row crossJoin for the global totals (the
    * engine's standard global-scalar application — never a collect). */
  def woeEncode(
      df: DataFrame, categoryCol: String, labelPred: org.apache.spark.sql.Column)
      : DataFrame = {
    val perCat = df
      .select(col(categoryCol).as("category"),
        when(labelPred, 1L).otherwise(0L).as("__y"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        (count(lit(1)) - sum(col("__y"))).as("n_neg"))
    val totals = perCat.agg(
      coalesce(sum(col("n_pos")), lit(0L)).as("__tp"),
      coalesce(sum(col("n_neg")), lit(0L)).as("__tn"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val woe = round(log(
      ((d(col("n_pos")) + 0.5) / (d(col("__tp")) + 0.5)) /
        ((d(col("n_neg")) + 0.5) / (d(col("__tn")) + 0.5))), 8)
    perCat.crossJoin(broadcast(totals))
      .withColumn("woe", woe)
      // a one-class corpus has no finite share difference: NULL, not a
      // division by zero (ANSI double x/0 throws — engine-wide guard)
      .withColumn("iv_term",
        when(col("__tp") === 0L || col("__tn") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            (d(col("n_pos")) / d(col("__tp")) -
              d(col("n_neg")) / d(col("__tn"))) * col("woe"), 8)))
      .drop("__tp", "__tn")
  }

  /** Per-group equal-frequency binning (quantile bins): each non-null
    * row gets `bins` and its 1-based `bin` via `ntile` over the
    * deterministic (value, id) total order — the discretizer a
    * downstream WOE/monotonic model wants, immune to outliers in a way
    * equal-width bins are not. SQL-standard ntile semantics (the first
    * `n mod bins` bins take the extra row) are identical across
    * engines, and the unique id tie-break pins every boundary, so bin
    * assignments are engine-exact. NULL values pass through with NULL
    * bin. Output: input columns + bin.
    *
    * Scale: ONE shuffle on the group key; ntile is a running counter
    * over the sorted partition — no second pass, no percentile state.
    * Groups must individually fit a partition's sort (the usual
    * per-group window bound; salt or pre-aggregate far skewed groups). */
  def quantileBin(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val binned = df.where(col(valueCol).isNotNull)
      .withColumn("bin", ntile(bins).over(w).cast("long"))
    df.where(col(valueCol).isNull)
      .withColumn("bin", lit(null).cast("long"))
      .unionByName(binned)
  }

  /** Quantization denominator for the IRLS moment lane (2²⁰, the
    * [[graft.ops.TextAnalysis.LogQ]] convention as a double). */
  val IrlsQ: Double = 1048576.0

  /** Logistic-regression TRAINING by IRLS (Newton–Raphson on the
    * log-likelihood) — the fastText-style quality-classifier loop run
    * where the data lives: per round ONE corpus pass aggregates the
    * 3×3 Hessian XᵀRX and gradient Xᵀ(y−μ), the driver solves the
    * 3-variable normal equations in closed form (Cramer), and the new
    * weights broadcast back as literals. Features here: intercept,
    * x1 ∈ (0,1], x2 bounded; caller supplies the two feature columns
    * and the 0/1 label column as DOUBLE.
    *
    * Determinism (the [[Normalize.zscore]] moment discipline, lifted to
    * a trained model): every per-row Hessian/gradient contribution is
    * floor-quantized to BIGINT — floor(((xᵢ·xⱼ)·r)·2²⁰) — BEFORE the
    * sum, so the aggregates are exact integers, order- and
    * partitioning-independent; the driver-side Cramer solve is a pinned
    * IEEE op sequence the oracle replays token-for-token; and round 1's
    * μ = 0.5, r = 0.25 are exact (w⁰ = 0), so the only libm call is
    * round 2's exp — whose cross-engine parity the q_anderson_darling /
    * survival-curve gates already prove. Output: one row per round,
    * (round, w0, w1, w2) — the weights AFTER that round's update.
    *
    * Scale: per round one map-side-combinable aggregate (9 BIGINT
    * sums), one O(1) collect, zero joins — rounds × one corpus scan. */
  def irlsLogreg(
      feats: DataFrame, x1Col: String, x2Col: String, yCol: String,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = feats.sparkSession
    import spark.implicits._
    val f = feats.select(col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2"), col(yCol).cast("double").as("y"))
    var w = (0.0, 0.0, 0.0)
    val out = Seq.newBuilder[(Long, Double, Double, Double)]
    (1 to rounds).foreach { round =>
      val z = lit(w._1) + lit(w._2) * col("x1") + lit(w._3) * col("x2")
      val mu = lit(1.0) / (lit(1.0) + exp(-z))
      val r = mu * (lit(1.0) - mu)
      def q(e: Column): Column = sum(floor(e * lit(IrlsQ)).cast("long"))
      val row = f.agg(
        q(r).as("h00"), q(col("x1") * r).as("h01"), q(col("x2") * r).as("h02"),
        q((col("x1") * col("x1")) * r).as("h11"),
        q((col("x1") * col("x2")) * r).as("h12"),
        q((col("x2") * col("x2")) * r).as("h22"),
        q(col("y") - mu).as("g0"),
        q(col("x1") * (col("y") - mu)).as("g1"),
        q(col("x2") * (col("y") - mu)).as("g2")).head()
      def d(i: Int): Double = row.getLong(i).toDouble / IrlsQ
      val (a00, a01, a02, a11, a12, a22) = (d(0), d(1), d(2), d(3), d(4), d(5))
      val (b0, b1, b2) = (d(6), d(7), d(8))
      // Cramer, token-for-token the oracle's formulas (IEEE-exact twins)
      val det = a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02) +
        a02 * (a01 * a12 - a11 * a02)
      val d0 = b0 * (a11 * a22 - a12 * a12) - a01 * (b1 * a22 - a12 * b2) +
        a02 * (b1 * a12 - a11 * b2)
      val d1 = a00 * (b1 * a22 - a12 * b2) - b0 * (a01 * a22 - a12 * a02) +
        a02 * (a01 * b2 - b1 * a02)
      val d2 = a00 * (a11 * b2 - b1 * a12) - a01 * (a01 * b2 - b1 * a02) +
        b0 * (a01 * a12 - a11 * a02)
      require(det != 0.0, "IRLS: singular quantized Hessian")
      w = (w._1 + d0 / det, w._2 + d1 / det, w._3 + d2 / det)
      out += ((round.toLong, w._1, w._2, w._3))
    }
    out.result().toDF("round", "w0", "w1", "w2")
  }
}
