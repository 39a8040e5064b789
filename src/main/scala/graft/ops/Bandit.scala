package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Off-policy bandit REPLAY (the Li et al. 2011 offline-evaluation
  * method): run a deterministic epsilon-greedy policy over a logged
  * per-period reward grid and report what it would have chosen and
  * earned — the counterfactual readout an experimentation platform
  * wants before deploying a policy.
  *
  * Everything is EXACT INTEGERS: rewards are integer aggregates, the
  * exploit step compares running means by CROSS-MULTIPLICATION
  * (sᵢ·cⱼ vs sⱼ·cᵢ — no division anywhere), exploration is a hash of
  * the period (no RNG), and cold-start arms are optimistic (an
  * unplayed arm wins the exploit argmax, ties to arm order) — so the
  * DuckDB oracle replays the walk bit-for-bit as a recursive CTE.
  *
  * Scale shape: the corpus collapses to a periods×arms reward grid
  * (one aggregate); the sequential walk is driver-side over that
  * bounded grid (O(days·arms) rows — the documented collect), which is
  * the honest cost of a sequential policy. */
object Bandit {

  val HashA = 1103515245L
  val HashC = 45567L
  val HashP = 1000000007L

  /** One replay step per period: (period, t, explored, chosen_arm,
    * reward, cum_reward). `grid` rows are (period, arm, reward);
    * missing (period, arm) cells pay 0. Explore when
    * h(period) % 4 == 0 (rate 1/4), exploring arm (h div 4) % k. */
  def epsilonGreedyReplay(grid: DataFrame, periodCol: String,
      armCol: String, rewardCol: String, arms: Seq[String]): DataFrame = {
    val spark = grid.sparkSession
    val rows = grid.select(col(periodCol).cast("long"),
        col(armCol).cast("string"), col(rewardCol).cast("long"))
      .collect() // bounded: periods × arms cells
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val periods = rows.keys.map(_._1).toSeq.distinct.sorted
    val k = arms.size
    val sums = Array.fill(k)(0L)
    val counts = Array.fill(k)(0L)
    var cum = 0L
    val out = periods.zipWithIndex.map { case (p, t) =>
      val h = ((p * HashA + HashC) % HashP + HashP) % HashP
      val explore = h % 4L == 0L
      val chosen =
        if (explore) ((h / 4L) % k).toInt
        else {
          // optimistic cold start: first unplayed arm wins; else the
          // cross-multiplied mean argmax, ties to the smaller index
          val cold = counts.indexWhere(_ == 0L)
          if (cold >= 0) cold
          else (1 until k).foldLeft(0) { (best, i) =>
            if (sums(i) * counts(best) > sums(best) * counts(i)) i else best
          }
        }
      val r = rows.getOrElse((p, arms(chosen)), 0L)
      sums(chosen) += r
      counts(chosen) += 1L
      cum += r
      (p, t.toLong + 1L, if (explore) 1 else 0, arms(chosen), r, cum)
    }
    spark.createDataFrame(out)
      .toDF("period", "t", "explored", "chosen_arm", "reward", "cum_reward")
  }
}
