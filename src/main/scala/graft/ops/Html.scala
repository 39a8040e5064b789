package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → visible text extraction — the step between WARC ingestion and
  * every text operator (a crawl corpus is HTML; the LM trains on the
  * rendered text). Trafilatura-lite, composed ENTIRELY from codegen'd
  * built-ins (regexp_replace/replace/trim — the "compose existing ops"
  * rung of the extension ladder, no kernel needed): drop script/style
  * blocks, strip tags, decode the five core entities (&lt; &gt; &quot;
  * &#39; first, &amp; LAST — the order that cannot double-decode),
  * collapse whitespace. Patterns are Java∩RE2-portable constants shared
  * VERBATIM with the DuckDB oracle (the Pii discipline), so both
  * engines run the same automaton.
  *
  * Scale: row-local map over the html column — no shuffle, the raw
  * html never survives past the operator. */
object Html {

  /** (?s) so script bodies spanning lines die; lazy .*? so adjacent
    * blocks don't merge; both supported by Java regex AND RE2. */
  val ScriptPat = "(?s)<script\\b[^>]*>.*?</script>"
  val StylePat = "(?s)<style\\b[^>]*>.*?</style>"
  val CommentPat = "(?s)<!--.*?-->"
  val TagPat = "<[^>]+>"
  val TitlePat = "(?s)<title[^>]*>(.*?)</title>"
  val LinkPat = "(?s)<a\\s[^>]*href"

  /** The visible-text column for a given html column — exposed so
    * composed pipelines (crawl capstone) can chain it inline. */
  def visibleText(html: Column): Column = {
    val noComment = regexp_replace(html, CommentPat, " ")
    val noScript = regexp_replace(noComment, ScriptPat, " ")
    val noStyle = regexp_replace(noScript, StylePat, " ")
    val noTags = regexp_replace(noStyle, TagPat, " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (from, to)) => call_function("replace", c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document extraction row: title (first <title> body, trimmed),
    * link count, and the visible text with its length + md5 — the
    * verifiable fingerprint (a production sink keeps the text column
    * itself; `keepText = true`). */
  def extract(
      df: DataFrame, idCol: String, htmlCol: String,
      keepText: Boolean = false): DataFrame = {
    val text = visibleText(col(htmlCol))
    val base = df.select(
      col(idCol),
      trim(regexp_extract(col(htmlCol), TitlePat, 1)).as("title"),
      // occurrence count via split (a Column-API codegen built-in;
      // regexp_extract_all has no Column form): parts − 1 == matches
      (size(split(col(htmlCol), LinkPat, -1)) - 1)
        .cast("long").as("n_links"),
      length(text).cast("long").as("text_len"),
      md5(text.cast("binary")).as("text_md5"),
      text.as("text"))
    if (keepText) base else base.drop("text")
  }
}
