package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted joins must be row-identical to the plain join while spreading
  * hot keys across salt partitions. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private val big = Seq.tabulate(200)(i =>
    (i.toLong, if (i % 10 == 0) "cold" else "hot")).toDF("id", "k")
  private val dim = Seq(("hot", 1.0), ("cold", 2.0)).toDF("k", "weight")

  test("salted inner join equals the plain inner join") {
    val plain = big.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(big, dim, Seq("k"), col("id"), salts = 7)
    assertSameRows(plain, salted)
  }

  test("salted left join keeps unmatched rows exactly once") {
    val withOrphan = big.unionByName(Seq((999L, "nowhere")).toDF("id", "k"))
    val plain = withOrphan.join(dim, Seq("k"), "left")
    val salted = Skew.saltedJoin(withOrphan, dim, Seq("k"), col("id"),
      salts = 7, joinType = "left")
    assertSameRows(plain, salted)
  }

  test("a hot key's rows carry multiple distinct salts") {
    val salts = big.withColumn("s", pmod(hash(col("id")), lit(7)))
      .where(col("k") === "hot")
      .select(countDistinct(col("s")))
      .head().getLong(0)
    assert(salts > 1, "hot key must spread over several salt partitions")
  }
}
