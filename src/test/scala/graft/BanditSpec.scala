package graft

import graft.ops.Bandit

/** Epsilon-greedy replay against a hand grid: cold start visits every
  * arm, exploitation locks onto the dominant arm, exploration days are
  * exactly the hash-selected ones, and the state arithmetic is a
  * driver-replayable integer walk. */
class BanditSpec extends SparkSpec {

  import spark.implicits._

  test("replay: cold start then exploitation of the dominant arm; " +
      "cum_reward is the exact running sum") {
    val arms = Seq("a", "b")
    // periods chosen so no exploration fires (h % 4 != 0 for all)
    val periods = (0L to 20L).filter(p =>
      ((p * Bandit.HashA + Bandit.HashC) % Bandit.HashP) % 4 != 0).take(6)
    // arm b always pays 10, arm a pays 1
    val grid = periods.flatMap(p => Seq((p, "a", 1L), (p, "b", 10L)))
      .toDF("period", "arm", "r")
    val out = Bandit.epsilonGreedyReplay(grid, "period", "arm", "r", arms)
      .collect()
    assert(out.length == periods.size)
    assert(out.forall(_.getAs[Int]("explored") == 0))
    // cold start: t=1 plays a (first unplayed), t=2 plays b, then b wins
    val chosen = out.sortBy(_.getAs[Long]("t")).map(_.getAs[String]("chosen_arm"))
    assert(chosen(0) == "a" && chosen(1) == "b")
    assert(chosen.drop(2).forall(_ == "b"),
      s"exploitation must lock onto the dominant arm: ${chosen.toSeq}")
    val cum = out.sortBy(_.getAs[Long]("t")).map(_.getAs[Long]("cum_reward"))
    assert(cum.last == 1L + 10L * (periods.size - 1))
  }

  test("replay: exploration fires exactly on hash-selected periods and " +
      "pays the explored arm's reward (0 when unlogged)") {
    val arms = Seq("a", "b")
    val expl = (0L to 60L).filter(p =>
      ((p * Bandit.HashA + Bandit.HashC) % Bandit.HashP) % 4 == 0)
    assert(expl.nonEmpty, "fixture needs at least one exploring period")
    val grid = expl.take(2).map(p => (p, "a", 5L)).toDF("period", "arm", "r")
    val out = Bandit.epsilonGreedyReplay(grid, "period", "arm", "r", arms)
      .collect()
    assert(out.forall(_.getAs[Int]("explored") == 1))
    out.foreach { r =>
      val p = r.getAs[Long]("period")
      val h = (p * Bandit.HashA + Bandit.HashC) % Bandit.HashP
      val want = arms(((h / 4) % arms.size).toInt)
      assert(r.getAs[String]("chosen_arm") == want)
      val paid = if (want == "a") 5L else 0L
      assert(r.getAs[Long]("reward") == paid)
    }
  }
}
