package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators.{Scored, TopK}

/** The bounded top-k Aggregator must agree with the window-rank rewrite
  * and stay correct under partial aggregation (many partitions). */
class AggregatorsSpec extends SparkSpec {

  import spark.implicits._

  test("top-k equals window-rank on random data across many partitions") {
    val rng = new scala.util.Random(77)
    val rows = List.fill(500)((
      s"g${rng.nextInt(4)}", rng.nextInt(50).toDouble, rng.nextLong().abs))
      .distinctBy(r => (r._1, r._2, r._3))
    val df = rows.toDF("grp", "value", "id").repartition(13)

    val topk = udaf(new TopK(5))
    val viaAgg = df.groupBy("grp").agg(topk($"value", $"id").as("top"))
      .select($"grp", posexplode($"top").as(Seq("pos", "row")))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getStruct(2).getDouble(0), r.getStruct(2).getLong(1)))
      .toSet

    val model = rows.groupBy(_._1).flatMap { case (g, members) =>
      members.sortBy(m => (-m._2, m._3)).take(5).zipWithIndex
        .map { case ((_, v, id), i) => (g, i, v, id) }
    }.toSet
    assert(viaAgg == model)
  }

  test("merge is associative: one partition vs many give identical buffers") {
    val agg = new TopK(3)
    val items = (1L to 20L).map(i => Scored((i % 7).toDouble, i))
    val oneShot = items.foldLeft(agg.zero)(agg.reduce)
    val (a, b) = items.splitAt(9)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(oneShot) == agg.finish(merged))
    assert(agg.finish(oneShot).size == 3)
  }
}
