package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature normalization — the numeric-cleaning counterpart of
  * the text-quality stack: before a column feeds a model (sampling rate,
  * quality weight, reward), it usually wants centering/scaling WITHIN its
  * group (per domain, per event type), not globally.
  *
  * Determinism contract (the hard part at scale): mean and variance come
  * from EXACT integer moments — each value quantizes to
  * `floor(x * 2^20)`, and Σq and Σq² accumulate as DECIMAL(38,0), which
  * Spark sums exactly (128-bit) in any partition order and DuckDB mirrors
  * in HUGEINT. The float mean/std are then ONE division / ONE sqrt from
  * those exact integers, so z-scores are bit-identical across runs,
  * partitionings, and engines — a naive double `avg`/`stddev` differs in
  * the last ulps under shuffle reordering and breaks hash-exact gates.
  *
  * Headroom: Σq² needs ~2·(digits(x)+6)+digits(n) < 38 decimal digits —
  * |x| < 1e9 with a trillion rows per group fits. For wider values drop
  * the quantization scale (the `q` parameter) accordingly.
  *
  * Cost shape: one hash-aggregate per group (map-side combinable — the
  * moments are sums), one broadcast-or-shuffle join back, one row-local
  * expression. The join side holds one row per group — broadcast it
  * unless groups number in the millions.
  */
object Normalize {

  private val Q = 1048576L // 2^20, same fixed-point scale as Similarity

  /** Attach `z` = (x - mean_g) / std_g (population std) to every row.
    * Zero-variance groups emit NULL z (no meaningful scale). Output: the
    * input columns + (n_group, z). */
  def zscore(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val qx = floor(col(valCol) * lit(Q.toDouble)).cast("decimal(38,0)")
    val moments = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_group"),
        sum(qx).as("__s1"),
        sum(qx * qx).as("__s2"))
    // num = n*s2 - s1^2 = n^2 * (population variance) * Q^2, exactly.
    val joined = df.join(broadcast(moments), groupCol)
    val n = col("n_group").cast("decimal(38,0)")
    val num = (n * col("__s2") - col("__s1") * col("__s1"))
    val mean = col("__s1").cast("double") /
      (col("n_group").cast("double") * lit(Q.toDouble))
    val std = sqrt(num.cast("double") /
      (col("n_group").cast("double") * col("n_group").cast("double") *
        lit((Q * Q).toDouble)))
    joined
      .withColumn("__num", num)
      .withColumn("z",
        when(col("__num") <= 0, lit(null).cast("double"))
          .otherwise((col(valCol) - mean) / std))
      .drop("__s1", "__s2", "__num")
  }

  /** The DuckDB mirror of [[zscore]]'s arithmetic, for oracle authoring:
    * identical quantization, exact HUGEINT moments, identical float
    * expression shape. `table` must expose `$groupCol` and `$valCol`. */
  def zscoreSql(
      table: String, groupCol: String, valCol: String,
      outCols: String): String = {
    val qx = s"CAST(floor($valCol * $Q.0) AS HUGEINT)"
    s"WITH mo AS (SELECT $groupCol, count(*) AS n_group, " +
      s"sum($qx) AS s1, sum($qx * $qx) AS s2 FROM $table GROUP BY $groupCol), " +
      s"j AS (SELECT t.*, mo.n_group, " +
      "mo.n_group * mo.s2 - mo.s1 * mo.s1 AS num, " +
      s"CAST(mo.s1 AS DOUBLE) / (CAST(mo.n_group AS DOUBLE) * $Q.0) AS mean, " +
      "sqrt(CAST(mo.n_group * mo.s2 - mo.s1 * mo.s1 AS DOUBLE) / " +
      s"(CAST(mo.n_group AS DOUBLE) * CAST(mo.n_group AS DOUBLE) * ${Q * Q}.0)) " +
      s"AS std FROM $table t JOIN mo USING ($groupCol)) " +
      s"SELECT $outCols, CASE WHEN num <= 0 THEN NULL " +
      s"ELSE ($valCol - mean) / std END AS z FROM j"
  }
}
