package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextKernels

/** robots.txt evaluation ([[Robots]], q246): the parser's group
  * selection and directive handling, the `robots_match` glob kernel's
  * RFC 9309 semantics (anchored prefix, `*`, `$`), and the
  * longest-match / Allow-ties-win decision — each pinned on
  * RFC-style cases the closed-form q246 oracle does not re-derive. */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parser: group selection prefers the exact agent over *") {
    val txt =
      """User-agent: graftbot
        |Disallow: /private/
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(Robots.parseRules(txt, "graftbot") ==
      Vector((false, "/private/")))
    assert(Robots.parseRules(txt, "otherbot") == Vector((false, "/")))
  }

  test("parser: stacked user-agent lines share one group; a UA line " +
      "after rules starts a NEW group") {
    val txt =
      """User-agent: a
        |User-agent: b
        |Disallow: /x
        |User-agent: c
        |Disallow: /y
        |""".stripMargin
    assert(Robots.parseRules(txt, "a") == Vector((false, "/x")))
    assert(Robots.parseRules(txt, "b") == Vector((false, "/x")))
    assert(Robots.parseRules(txt, "c") == Vector((false, "/y")))
    // RFC 9309 §2.6: other records must not interfere with group
    // parsing — a Crawl-delay BETWEEN stacked UA lines must not split
    // the group (it used to start a fresh one, stranding agent d
    // with zero rules and shadowing its * fallback)
    val interleaved =
      """User-agent: d
        |Crawl-delay: 10
        |User-agent: e
        |Disallow: /z
        |""".stripMargin
    assert(Robots.parseRules(interleaved, "d") == Vector((false, "/z")))
    assert(Robots.parseRules(interleaved, "e") == Vector((false, "/z")))
  }

  test("parser: comments, blank lines, case-insensitive directives, " +
      "unknown directives, empty Disallow, headless rules") {
    val txt =
      """# policy
        |DISALLOW: /headless  # ignored: before any User-agent
        |User-Agent: GraftBot  # agent tokens compare lowercased
        |Crawl-delay: 10
        |Sitemap: https://x/s.xml
        |disallow: /a  # trailing comment
        |ALLOW: /a/ok
        |Disallow:
        |""".stripMargin
    assert(Robots.parseRules(txt, "graftbot") ==
      Vector((false, "/a"), (true, "/a/ok")))
    // no group matches an unknown agent and there is no * group
    assert(Robots.parseRules(txt, "nobody") == Vector())
  }

  private def m(pat: String, path: String): Boolean =
    TextKernels.robotsMatch(
      org.apache.spark.unsafe.types.UTF8String.fromString(pat),
      org.apache.spark.unsafe.types.UTF8String.fromString(path))

  test("glob kernel: anchored prefix, * spans, $ anchors the end") {
    assert(m("/q", "/q"))
    assert(m("/q", "/q/deep?x=1"))
    assert(!m("/q", "/p/q")) // anchored at 0, not a substring search
    assert(m("/fish*.php", "/fishheads/catfish.php?a=1"))
    assert(m("/*.php", "/index.php"))
    assert(!m("/*.php$", "/index.php?x=1"))
    assert(m("/*.php$", "/index.php"))
    assert(m("/fish$", "/fish"))
    assert(!m("/fish$", "/fishheads"))
    // backtracking: the first * landing must be revisitable
    assert(m("/a*bc", "/axbxbc"))
    assert(!m("/a*bd", "/axbxbc"))
    // case-sensitive octets
    assert(!m("/Fish", "/fish"))
  }

  test("longest match wins; Allow wins exact-length ties; no match " +
      "and no robots default to allowed") {
    val robots = Seq(
      ("t1.example", "User-agent: *\nDisallow: /p\nAllow: /page\n"),
      // exact-length tie: Allow and Disallow patterns both length 3
      ("t2.example", "User-agent: *\nDisallow: /ab\nAllow: /ab\n"),
      ("t3.example", "User-agent: *\nDisallow: /only\n"))
      .toDF("domain", "robots_txt")
    val rules = Robots.rules(robots, "domain", "robots_txt", "graftbot")
    val urls = Seq(
      (1L, "https://t1.example/page/1"),  // Allow /page (4) > Disallow /p (2)
      (2L, "https://t1.example/private"), // only /p matches -> blocked
      (3L, "https://t2.example/abc"),     // tie -> Allow wins
      (4L, "https://t3.example/other"),   // rules exist, none match
      (5L, "https://norobots.example/x")) // no robots row
      .toDF("doc_id", "url")
    val out = Robots.verdicts(urls, "doc_id", "url", rules)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), Option(r.getString(3)))))
      .toMap
    assert(out(1L) == (("allowed", Some("/page"))))
    assert(out(2L) == (("blocked", Some("/p"))))
    assert(out(3L) == (("allowed", Some("/ab"))))
    assert(out(4L) == (("allowed", None)))
    assert(out(5L) == (("allowed", None)))
  }

  test("parseCrawlDelay: exact group beats *, first value wins, " +
      "garbage ignored, stacking untouched") {
    // exact-agent group wins over the * group's value (rules between
    // the groups genuinely separate them)
    val twoGroups = "User-agent: graftbot\nCrawl-delay: 0.5\n" +
      "Disallow: /private\n" +
      "User-agent: *\nCrawl-delay: 10\nDisallow: /tmp\n"
    assert(Robots.parseCrawlDelay(twoGroups, "graftbot") == Some(0.5))
    assert(Robots.parseCrawlDelay(twoGroups, "otherbot") == Some(10.0))
    // WITHOUT rules between them the two User-agent lines STACK into
    // one group (a crawl-delay does not terminate stacking — the
    // pinned group model), so both agents share the first delay
    assert(Robots.parseCrawlDelay(
      "User-agent: graftbot\nCrawl-delay: 0.5\n" +
        "User-agent: *\nCrawl-delay: 10\n", "otherbot") == Some(0.5))
    // first value in the group wins; later lines ignored
    assert(Robots.parseCrawlDelay(
      "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 9\n", "x") == Some(2.0))
    // garbage / negative values ignored entirely
    assert(Robots.parseCrawlDelay(
      "User-agent: *\nCrawl-delay: fast\n", "x").isEmpty)
    assert(Robots.parseCrawlDelay(
      "User-agent: *\nCrawl-delay: -1\n", "x").isEmpty)
    // no robots / no group / delay before any group
    assert(Robots.parseCrawlDelay("", "x").isEmpty)
    assert(Robots.parseCrawlDelay("Crawl-delay: 3\n", "x").isEmpty)
    // a crawl-delay between User-agent lines must NOT terminate
    // stacking: the rule AND the delay apply to both agents (the
    // pinned parseRules behavior, now shared through one group walk)
    val stacked = "User-agent: a\nCrawl-delay: 4\nUser-agent: b\n" +
      "Disallow: /x\n"
    assert(Robots.parseRules(stacked, "b") == Vector((false, "/x")))
    assert(Robots.parseCrawlDelay(stacked, "a") == Some(4.0))
    assert(Robots.parseCrawlDelay(stacked, "b") == Some(4.0))
  }

  test("pathQueryOf: scheme/authority stripped, fragment dropped, " +
      "empty path is /") {
    val got = Seq(
      (1L, "https://h.example:8080/a/b?c=d#frag"),
      (2L, "http://h.example"),
      (3L, "https://h.example/#f"))
      .toDF("id", "u")
      .select(col("id"), Robots.pathQueryOf(col("u")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "/a/b?c=d")
    assert(got(2L) == "/")
    assert(got(3L) == "/")
  }
}
