package graft

import org.apache.spark.sql.Row

import graft.ops.CorpusFilters

/** Hand-built documents hitting every Gopher/C4 rule's FAIL path —
  * including the two rules (bullet, ellipsis) the synthetic corpus
  * fixture never trips. */
class CorpusFiltersSpec extends SparkSpec {

  import spark.implicits._

  private def gopher(text: String): Row =
    CorpusFilters.gopherQuality(Seq((1L, text)).toDF("id", "text"),
      "id", "text").head()

  private def c4(text: String): Row =
    CorpusFilters.c4LineFilter(Seq((1L, text)).toDF("id", "text"),
      "id", "text").head()

  private val fiftyWords =
    (1 to 50).map(i => "word" + (i % 7)).mkString(" ")

  test("gopher: a clean 50-word doc with stopwords passes everything") {
    val r = gopher(fiftyWords + " the of and")
    assert(r.getAs[Int]("gopher_keep") == 1,
      s"expected pass: $r")
  }

  test("gopher: word-count rule fails below 50 words") {
    val r = gopher("the of short doc")
    assert(r.getAs[Int]("r_word_count") == 0)
    assert(r.getAs[Int]("gopher_keep") == 0)
  }

  test("gopher: bullet rule fails when >90% of lines are bullets") {
    val lines = (1 to 20).map(i => s"- item $i the of").mkString("\n")
    val r = gopher(lines + "\n" + fiftyWords + " the of")
    // 20 bullet lines of 21 -> 200 > 189
    assert(r.getAs[Int]("r_bullet") == 0)
  }

  test("gopher: ellipsis rule fails when >30% of lines trail off") {
    val r = gopher(
      "the of something trails..." + "\n" + fiftyWords)
    // 1 of 2 lines -> 10 > 6
    assert(r.getAs[Int]("r_ellipsis") == 0)
  }

  test("gopher: symbol rule fails on hash spam; mean-word-length on " +
      "single-char soup; alpha on digit soup; stopwords when absent") {
    val hashy = gopher(("# " * 30) + fiftyWords + " the of")
    assert(hashy.getAs[Int]("r_symbol_ratio") == 0)
    val soup = gopher(("a " * 60) + "the of")
    assert(soup.getAs[Int]("r_mean_wlen") == 0)
    val digits = gopher(("42 " * 30) + fiftyWords + " the of")
    assert(digits.getAs[Int]("r_alpha_words") == 0)
    val nostop = gopher(fiftyWords)
    assert(nostop.getAs[Int]("r_stopwords") == 0)
  }

  test("c4: line keep wants terminal punctuation AND >=5 tokens AND no " +
      "javascript") {
    val r = c4(Seq(
      "this line has five good tokens.", // kept
      "short line here.", // < 5 tokens
      "no terminal punctuation on this line at all", // no punct
      "please enable JavaScript to see this content.", // banned word
      "a question with enough tokens works too?" // kept
    ).mkString("\n"))
    assert(r.getAs[Long]("n_lines") == 5L)
    assert(r.getAs[Long]("n_lines_kept") == 2L)
  }

  test("c4: lorem ipsum or a brace bans the whole document; fewer than " +
      "3 sentences bans it too") {
    val good = c4("one full sentence right here now. another one " +
      "follows directly after. and a third closes it out.")
    assert(good.getAs[Int]("c4_keep") == 1)
    val lorem = c4("one full sentence right here now. another one " +
      "follows directly after. and lorem ipsum closes it out.")
    assert(lorem.getAs[Int]("c4_keep") == 0)
    val brace = c4("one full sentence right here now. another one " +
      "follows directly after. and a brace { closes it out.")
    assert(brace.getAs[Int]("c4_keep") == 0)
    val short = c4("just two sentences in here. that is all you get.")
    assert(short.getAs[Int]("c4_keep") == 0)
  }

  test("c4: kept_chars sums exactly the kept lines") {
    val l1 = "this line has five good tokens."
    val l2 = "and a second keeper line too."
    val r = c4(Seq(l1, "drop me", l2).mkString("\n") +
      "\nneeds one more sentence to pass.")
    assert(r.getAs[Long]("kept_chars") ==
      l1.length + l2.length + "needs one more sentence to pass.".length)
  }
}
