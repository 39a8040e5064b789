package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** robots.txt evaluation (RFC 9309) — the crawl-pipeline gatekeeper:
  * which of a frontier's URLs may be fetched at all. Real semantics,
  * not a prefix grep:
  *
  *  - groups: consecutive `User-agent:` lines share the rule block
  *    that follows; a crawler uses the groups naming ITS product token
  *    (case-insensitive exact match) and falls back to `*` groups ONLY
  *    when no specific group exists — a `/tmp` ban in the `*` group
  *    does NOT bind a bot that has its own group;
  *  - rules: `Allow`/`Disallow` path patterns with `*` wildcards and a
  *    `$` end anchor (both MUST-support in the RFC); an empty
  *    `Disallow:` is "allow everything", i.e. no rule;
  *  - precedence: the matching rule with the MOST OCTETS in its
  *    pattern wins; ties break to Allow; no match ⇒ allowed.
  *
  * The kernel parses the robots text once per partition and compiles
  * each pattern to an anchored regex (quoted literals joined by `.*`)
  * — evaluation is then one regex test per rule. Row-local; the gate's
  * oracle replays the decision procedure over the same fixed rule
  * table as generated SQL. */
object Robots {

  private[graft] final case class Rule(allow: Boolean, pattern: String) {
    val len: Int = pattern.length
    private val anchored = pattern.endsWith("$")
    private val body = if (anchored) pattern.dropRight(1) else pattern
    private val rx = java.util.regex.Pattern.compile(
      "^" + body.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*") + (if (anchored) "$" else ""))
    def matches(path: String): Boolean = rx.matcher(path).lookingAt()
  }

  /** Parse robots.txt into (agent-token -> rule list) groups and
    * select the rules binding `agent` per the RFC: all groups naming
    * the agent exactly (case-insensitive), else all `*` groups. */
  private[graft] def rulesFor(robots: String, agent: String): Seq[Rule] = {
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(Set[String], scala.collection.mutable.ArrayBuffer[Rule])]
    var currentAgents = Set.empty[String]
    var inHeader = false
    // the header closes on the first NON-header directive (any line
    // that is not another User-agent) or at EOF — not only on the
    // first Allow/Disallow. A group holding nothing but ignored
    // directives (e.g. just `Crawl-delay:`) must still REGISTER: per
    // RFC 9309 a matching specific group with zero rules means
    // allow-all and SUPPRESSES the `*` group.
    def closeHeader(): Unit =
      if (inHeader) {
        if (currentAgents.nonEmpty)
          groups += ((currentAgents,
            scala.collection.mutable.ArrayBuffer.empty[Rule]))
        inHeader = false
      }
    for (raw <- robots.split("\n")) {
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val directive = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        directive match {
          case "user-agent" =>
            if (!inHeader) currentAgents = Set.empty // new group header
            currentAgents += value.toLowerCase
            inHeader = true
          case "allow" | "disallow" =>
            closeHeader()
            // empty Disallow = "allow all" = no rule; empty Allow too
            if (groups.nonEmpty && value.nonEmpty &&
              groups.last._1 == currentAgents)
              groups.last._2 += Rule(directive == "allow", value)
          case _ => closeHeader() // crawl-delay etc: ignored, ends header
        }
      }
    }
    closeHeader()
    val a = agent.toLowerCase
    val specific = groups.filter(_._1.contains(a))
    val chosen = if (specific.nonEmpty) specific
      else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2).toSeq
  }

  private[graft] def allowed(rules: Seq[Rule], path: String): Boolean = {
    var allowLen = -1
    var disLen = -1
    for (r <- rules if r.matches(path)) {
      if (r.allow) { if (r.len > allowLen) allowLen = r.len }
      else if (r.len > disLen) disLen = r.len
    }
    allowLen >= disLen // ties -> Allow; no match (-1 >= -1) -> allowed
  }

  /** Tag each row's URL path with the fetch decision for `agent` under
    * a fixed robots.txt (one text per host shard — broadcast-sized by
    * nature). Rules parse once per partition. */
  def filterAllowed(
      df: DataFrame, idCol: String, pathCol: String, robotsTxt: String,
      agent: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(pathCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rules = rulesFor(robotsTxt, agent)
        it.map { case (id, path) => (id, path, allowed(rules, path)) }
      }
      .toDF(idCol, pathCol, "allowed")
  }
}
