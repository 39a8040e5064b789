package graft

import org.apache.spark.sql.functions._

import graft.ops.Unigram

/** Unigram-LM tokenizer trainer: hand-checked Viterbi semantics,
  * partition invariance (the bit-identical bar every trained model must
  * clear), and the train/encode consistency contract. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  // Viterbi tie/argmin semantics, hand-computed. Corpus of one word
  // "abab" ×2: census (freq-weighted, multiplicity):
  //   a:4 b:4 ab:4 ba:2 aba:2 bab:2 — all multi pieces fit vocab=64.
  test("train: Viterbi picks the cheapest segmentation and the learned " +
      "counts are freq-weighted piece uses") {
    val docs = Seq("abab", "abab").toDF("text")
    val out = Unigram.train(docs, "text", multiVocab = 64, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 'ab' is the most frequent multi-char piece; the cheapest cover of
    // abab is ab|ab, so after EM only 'ab' carries usage: 2 uses/doc ×
    // 2 docs = 4.
    assert(out == Map("ab" -> 4L))
  }

  test("train: single chars are always usable — a word with no " +
      "multi-char support still segments") {
    val docs = Seq("xyz qq qq qq").toDF("text")
    val out = Unigram.train(docs, "text", multiVocab = 1, rounds = 1)
      .collect().map(r => r.getString(0)).toSet
    // multiVocab=1 keeps only 'qq'; xyz must fall back to chars.
    assert(Set("x", "y", "z").subsetOf(out) && out.contains("qq"))
  }

  test("train and encode are partition-invariant (exact integer counts " +
      "+ driver-side cost updates leave nothing order-dependent)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = Unigram.train(docs.repartition(1), "text")
    val b = Unigram.train(docs.repartition(13), "text")
    assertSameRows(a, b)
    val ea = Unigram.encodeTokenCounts(docs.repartition(1), "doc_id", "text")
    val eb = Unigram.encodeTokenCounts(docs.repartition(7), "doc_id", "text")
    assertSameRows(ea, eb)
  }

  test("encode: token counts are bounded by chars and at least words, " +
      "and total usage in train equals total pieces emitted by a " +
      "same-model segmentation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val enc = Unigram.encodeTokenCounts(docs, "doc_id", "text")
    val bad = enc.filter(col("n_tokens") < col("n_words")).count()
    assert(bad == 0L, "every word yields >= 1 piece")
    val chars = docs.select(col("doc_id"),
      length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("nc"))
    val over = enc.join(chars, "doc_id")
      .filter(col("n_tokens") > col("nc")).count()
    assert(over == 0L, "a word never yields more pieces than characters")
  }

  test("trainPruned: kept multis are a subset of the trained model's " +
      "top multis, singles survive, keepMulti=0 degenerates to " +
      "chars-only, and the refit is partition-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val full = Unigram.train(docs, "text", multiVocab = 64, rounds = 2)
      .collect().map(r => r.getString(0)).toSet
    val pruned = Unigram.trainPruned(docs, "text",
      multiVocab = 64, rounds = 2, keepMulti = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val multis = pruned.filter(_._1.length >= 2)
    assert(multis.length <= 8)
    // every kept multi was in the trained model's used vocab
    assert(multis.forall(m => full.contains(m._1)),
      s"pruned multis must come from the trained vocab")
    assert(pruned.forall(_._2 > 0L))
    val charsOnly = Unigram.trainPruned(docs, "text",
      multiVocab = 64, rounds = 2, keepMulti = 0)
      .collect().map(_.getString(0))
    assert(charsOnly.forall(_.length == 1), "keepMulti=0 leaves only chars")
    val p7 = Unigram.trainPruned(docs.repartition(7), "text",
      multiVocab = 64, rounds = 2, keepMulti = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(p7.sortBy(_._1).sameElements(pruned.sortBy(_._1)))
  }
}
