package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NYSIIS phonetic key — PINNED VARIANT, expressed as one shared
  * rewrite-step table that BOTH engines fold over (the engine as Spark
  * `regexp_replace` columns, the oracle as DuckDB `regexp_replace(...,
  * 'g')` calls), so the two implementations cannot drift: any rule
  * change edits exactly one Seq.
  *
  * The variant is the classic New York State Identification and
  * Intelligence System code (head transforms, vowel flattening to A,
  * consonant classes, run collapse, tail cleanup) with two documented
  * simplifications shared by several public implementations:
  *  - H is dropped everywhere after the head rules (the reference rule
  *    keeps H only between vowels; after vowel flattening that is the
  *    rare AHA context — dropping it entirely is a coarser but stable
  *    blocking key);
  *  - the key is truncated to 6 characters (the common truncating
  *    variant; true NYSIIS keeps the full key).
  * Every pattern is RE2-compatible (no backreferences — the run
  * collapse is 26 per-letter rules for exactly this reason) and is
  * applied as a GLOBAL leftmost-non-overlapping replace, which Java
  * regex and RE2 implement identically.
  *
  * Blocking-key use: same-sounding names land in one key, so the
  * entity-resolution candidate join is per-block instead of all-pairs —
  * the same scale contract as the Soundex gate. */
object Nysiis {

  /** Head rules: applied to the whole uppercase letters-only string. */
  val headSteps: Seq[(String, String)] = Seq(
    "^MAC" -> "MCC",
    "^KN" -> "NN",
    "^K" -> "C",
    "^(PH|PF)" -> "FF",
    "^SCH" -> "SSS",
    "(EE|IE)$" -> "Y",
    "(DT|RT|RD|NT|ND)$" -> "D")

  /** Body rules: applied to the substring AFTER the (kept) first
    * letter, in this exact order. */
  val bodySteps: Seq[(String, String)] = Seq(
    "EV" -> "AF",
    "[AEIOU]" -> "A",
    "Q" -> "G",
    "Z" -> "S",
    "M" -> "N",
    "KN" -> "N",
    "K" -> "C",
    "SCH" -> "SSS",
    "PH" -> "FF",
    "H" -> "",
    "AW" -> "A") ++
    ('A' to 'Z').map(c => s"$c$c+" -> c.toString) ++ Seq(
    "S$" -> "",
    "AY$" -> "Y",
    "A$" -> "")

  /** Column form: uppercase letters-only input → key (empty for empty
    * input). Codegen'd regexp chain, row-local. */
  def keyCol(in: Column): Column = {
    val up = regexp_replace(upper(in), "[^A-Z]", "")
    val headed = headSteps.foldLeft(up) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    val body = bodySteps.foldLeft(substring(headed, 2, 1000000)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    when(length(up) === 0, lit(""))
      .otherwise(substring(concat(substring(headed, 1, 1), body), 1, 6))
  }

  /** DuckDB form of the same chain over the SQL expression `in`. */
  def keySql(in: String): String = {
    val up = s"regexp_replace(upper($in), '[^A-Z]', '', 'g')"
    val headed = headSteps.foldLeft(up) { case (e, (p, r)) =>
      s"regexp_replace($e, '$p', '$r', 'g')"
    }
    val body = bodySteps.foldLeft(s"substr($headed, 2)") {
      case (e, (p, r)) => s"regexp_replace($e, '$p', '$r', 'g')"
    }
    s"CASE WHEN length($up) = 0 THEN '' " +
      s"ELSE substr(substr($headed, 1, 1) || $body, 1, 6) END"
  }
}
