package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins. AQE's skew-join handles sort-merge
  * splits at runtime (on via GraftSession), but salting is the portable
  * answer when the dimension is too big to broadcast and a handful of hot
  * keys would otherwise pin a shuffle partition: the hot key's rows spread
  * over `salts` partitions, at the cost of replicating the dimension
  * `salts` times — choose salts ≈ (hot-key share × cluster cores), keep
  * the dimension small enough that salts × |dim| still shuffles cheaply.
  */
object Skew {

  /** Inner/left join of a skewed `big` frame against `dim` on `keys`,
    * salted: big rows get a deterministic salt from `saltSource` (any
    * well-distributed column, e.g. a row id), the dimension is replicated
    * once per salt, and the join runs on (keys, salt) — row-for-row the
    * same result as the plain join, but the hot key occupies `salts`
    * shuffle partitions instead of one. */
  def saltedJoin(
      big: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSource: Column, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(keys.nonEmpty, "saltedJoin requires join keys")
    // right/full-outer would emit each unmatched dim row once PER SALT
    // REPLICA — only joins that never emit unmatched dim rows are safe
    require(Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType " +
        "(outer-on-dim joins would duplicate unmatched dim rows per salt)")
    val saltCol = "__graft_salt"
    val b = big.withColumn(saltCol, pmod(hash(saltSource), lit(salts)))
    val d = dim.withColumn(saltCol,
      explode(array((0 until salts).map(lit(_)): _*)))
    b.join(d, keys :+ saltCol, joinType).drop(saltCol)
  }
}
