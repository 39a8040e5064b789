package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the co-occurrence miner behind
  * "customers who bought X also bought Y" and, in a corpus pipeline, the
  * document-level version of [[TextRank.topCollocations]]'s token-level
  * lift: which sources/tags/domains co-occur in the same basket far more
  * than independence predicts.
  *
  * Emits one row per DIRECTED rule a→b (both directions of each
  * co-occurring pair): (antecedent, consequent, s_ab, s_a, s_b, support,
  * confidence, lift) where `support = s_ab/n`, `confidence = s_ab/s_a`,
  * `lift = n·s_ab/(s_a·s_b)` over basket counts.
  *
  * Determinism: every count is an exact integer from a distinct
  * (basket, item) projection; each measure is ONE division (or one
  * division of two exact products) — bit-identical across engines.
  *
  * Scale: the pair enumeration is a per-basket self-join — Σ|basket|²
  * work, the same bound as the triangle gate's wedge build; it is NOT
  * all-pairs-of-items. Item supports are O(items) and broadcast back
  * onto the (minPairCount-pruned) rule set; the basket count is one
  * broadcast scalar row. Prune FIRST (s_ab filter), then annotate. */
object Associations {

  def associationRules(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val b = baskets
      .select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct().persist()
    try {
      val n = b.agg(countDistinct(col("__bk")).as("__n"))
      val si = b.groupBy(col("__it")).agg(count(lit(1)).as("__s"))
      val pairs = b.as("x")
        .join(b.as("y"),
          col("x.__bk") === col("y.__bk") && col("x.__it") < col("y.__it"))
        .groupBy(col("x.__it").as("a"), col("y.__it").as("b"))
        .agg(count(lit(1)).as("s_ab"))
        .filter(col("s_ab") >= minPairCount)
      val dir = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b"), col("s_ab")))
      dir
        .join(broadcast(si.select(col("__it").as("a"), col("__s").as("s_a"))),
          "a")
        .join(broadcast(si.select(col("__it").as("b"), col("__s").as("s_b"))),
          "b")
        .crossJoin(broadcast(n))
        .select(col("a").as("antecedent"), col("b").as("consequent"),
          col("s_ab"), col("s_a"), col("s_b"),
          (col("s_ab").cast("double") / col("__n").cast("double"))
            .as("support"),
          (col("s_ab").cast("double") / col("s_a").cast("double"))
            .as("confidence"),
          ((col("__n") * col("s_ab")).cast("double") /
            (col("s_a") * col("s_b")).cast("double")).as("lift"))
    } finally { b.unpersist(); () }
  }
}
