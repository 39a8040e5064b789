package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Robots

/** RFC 9309 semantics the prefix-grep shortcut gets wrong: specific
  * groups suppress '*' fallback entirely, longest pattern wins with
  * Allow on ties, wildcards and $-anchors match, empty Disallow is no
  * rule. */
class RobotsSpec extends AnyFunSuite {

  private val robots =
    """# fixture
      |User-agent: botA
      |User-agent: botB
      |Disallow: /a/
      |Allow: /a/ok/
      |Disallow: /*.php$
      |Allow:
      |
      |User-agent: *
      |Disallow: /star
      |""".stripMargin

  private def allow(agent: String, path: String): Boolean = {
    val rules = Robots.rulesFor(robots, agent)
    Robots.allowed(rules, path)
  }

  test("group selection: shared header binds both agents, specific " +
      "group suppresses * fallback, unknown agent gets *") {
    assert(!allow("botA", "/a/x"))
    assert(!allow("BOTB", "/a/x")) //             case-insensitive match
    assert(allow("botA", "/star/x")) //  '*' group does NOT bind botA
    assert(!allow("cRaWlEr", "/star/x")) //        unknown agent -> '*'
    assert(allow("crawler", "/a/x")) //   '*' group has no /a/ rule
  }

  test("longest match wins; tie goes to Allow; no match allows") {
    assert(allow("botA", "/a/ok/page")) //     Allow len 6 beats len 3
    assert(allow("botA", "/elsewhere"))
    // tie: craft equal-length rules
    val r = Robots.rulesFor(
      "User-agent: x\nDisallow: /p/\nAllow: /p/\n", "x")
    assert(Robots.allowed(r, "/p/q"), "equal length -> Allow wins")
  }

  test("a specific group holding ONLY ignored directives still " +
      "registers: RFC 9309 allow-all, and it SUPPRESSES the '*' group") {
    val txt = "User-agent: bot\nCrawl-delay: 10\n\n" +
      "User-agent: *\nDisallow: /\n"
    val r = Robots.rulesFor(txt, "bot")
    assert(r.isEmpty, "registered group, zero rules")
    assert(Robots.allowed(r, "/anything"), "no rules -> allow-all")
    // '*' still binds agents with no specific group
    assert(!Robots.allowed(Robots.rulesFor(txt, "other"), "/x"))
    // rules arriving AFTER an ignored directive still attach to the group
    val txt2 = "User-agent: bot\nCrawl-delay: 10\nDisallow: /p/\n"
    assert(!Robots.allowed(Robots.rulesFor(txt2, "bot"), "/p/x"))
    // a trailing header group at EOF registers too
    val txt3 = "User-agent: *\nDisallow: /\n\nUser-agent: bot\n"
    assert(Robots.allowed(Robots.rulesFor(txt3, "bot"), "/x"))
  }

  test("wildcards and $ anchor; empty Disallow/Allow is no rule") {
    assert(!allow("botA", "/cgi/run.php"))
    assert(allow("botA", "/cgi/run.php?x=1"), "$ anchors the END")
    assert(allow("botA", "/phpinfo"), "pattern needs the .php suffix")
    val r = Robots.rulesFor("User-agent: y\nDisallow:\n", "y")
    assert(Robots.allowed(r, "/anything"), "empty Disallow = allow all")
    // a rules-less specific group still suppresses '*'
    val r2 = Robots.rulesFor(
      "User-agent: z\nDisallow:\n\nUser-agent: *\nDisallow: /\n", "z")
    assert(Robots.allowed(r2, "/x"))
  }
}
