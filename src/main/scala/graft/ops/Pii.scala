package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for training corpora — the scrub pass every
  * large-scale text pipeline runs before anything else ships: find
  * emails, IPv4s, phone numbers, and Luhn-valid card numbers; count them
  * per document (routing signal: quarantine vs redact vs pass) and
  * rewrite the text with typed placeholders.
  *
  * Design constraints, in order:
  *  - **Pattern dialect portability.** Every regex here uses only the
  *    syntax common to Java's engine (Spark) and RE2 (DuckDB oracle,
  *    also Go/C++ scanners): character classes, bounded repeats, `\b`.
  *    No lookarounds, no backreferences — which also guarantees
  *    linear-time scans on adversarial corpus bytes (RE2 semantics; a
  *    catastrophic-backtracking PII pass is a real outage mode at
  *    100 TB).
  *  - **Match-then-validate.** The regex is the cheap recall net; exact
  *    arithmetic validation (octet ≤ 255, Luhn mod-10) runs only on the
  *    few candidates it yields. Counting valid-vs-candidate separately
  *    is deliberate: the gap is the false-positive-rate monitor.
  *  - **Row-local, codegen'd.** Scan and redact are pure column
  *    expressions over the text column — no shuffle, no UDF; the
  *    whole-stage-codegen span covers the regex work.
  */
object Pii {

  /** Shared pattern constants (Java + RE2 common subset; see above). */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePat = "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b"
  val CardPat = "\\b\\d{13,16}\\b"

  private def matches(txt: Column, pat: String): Column =
    regexp_extract_all(txt, lit(pat), lit(0))

  /** Luhn mod-10 check over a digit-string column (SQL lambda shared
    * shape with the oracle): digits indexed from the RIGHT, every
    * second doubled, >9 folds back by −9, sum divisible by 10. */
  private def luhnOk(d: Column): Column =
    aggregate(
      sequence(lit(0), length(d) - 1),
      lit(0L),
      (acc, i) => {
        val dig =
          substring(d, (length(d) - i).cast("int"), lit(1)).cast("long")
        acc + when(i % 2 === 1,
          when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)).otherwise(dig)
      }) % 10 === 0

  /** Per-document PII counts: candidate emails/phones (regex hits),
    * IPv4s split into regex candidates vs octet-valid, card-shaped
    * digit runs vs Luhn-valid. Exact integers; (candidates − valid) is
    * the false-positive monitor. */
  def scan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    df.select(
      col(idCol),
      size(matches(txt, EmailPat)).cast("long").as("n_emails"),
      size(matches(txt, Ipv4Pat)).cast("long").as("n_ipv4_candidates"),
      size(filter(matches(txt, Ipv4Pat), s =>
        forall(split(s, "\\."), o => o.cast("int") <= 255)))
        .cast("long").as("n_ipv4_valid"),
      size(matches(txt, PhonePat)).cast("long").as("n_phones"),
      size(matches(txt, CardPat)).cast("long").as("n_card_candidates"),
      size(filter(matches(txt, CardPat), luhnOk(_)))
        .cast("long").as("n_cards_luhn"))
  }

  /** Redact all four PII classes with typed placeholders, in a FIXED
    * pass order (email, ip, phone, card — later passes see earlier
    * placeholders, so the order is part of the contract and the oracle
    * replays it verbatim). Emits the redacted text plus its md5 and
    * length — the verifiable fingerprint a sink can store instead of
    * shipping redacted bodies to the compare. */
  def redact(df: DataFrame, idCol: String, textCol: String,
      keepText: Boolean = true): DataFrame = {
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailPat, "<EMAIL>"),
          Ipv4Pat, "<IP>"),
        PhonePat, "<PHONE>"),
      CardPat, "<CARD>")
    val base = df.select(
      col(idCol),
      length(red).cast("long").as("redacted_len"),
      md5(red.cast("binary")).as("redacted_md5"),
      red.as("redacted_text"))
    if (keepText) base else base.drop("redacted_text")
  }
}
