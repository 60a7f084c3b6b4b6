package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand fixtures for [[Domains]]: host extraction, longest-suffix wins,
  * PSL fallback for unknown TLDs, blocklist verdicts, and the
  * deterministic per-domain cap ledger. */
class DomainsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val psl = Seq("com", "uk", "co.uk", "ac.uk").toDF("suffix")

  private def reg(host: String): (String, String) = {
    val df = Seq((1L, host)).toDF("id", "host")
    val r = Domains.registrableDomain(df, "id", "host", psl).collect()(0)
    (r.getAs[String]("suffix"), r.getAs[String]("domain"))
  }

  test("hostOf extracts and lowers the authority") {
    val got = Seq("https://WWW.Example.COM/p/1?q=2#f", "ftp://a.b/x")
      .toDF("url").select(Domains.hostOf(col("url")).as("h"))
      .as[String].collect().toSeq
    assert(got == Seq("www.example.com", "a.b"))
  }

  test("longest public suffix wins: co.uk beats uk") {
    assert(reg("www.example.co.uk") == ("co.uk", "example.co.uk"))
    assert(reg("deep.sub.example.ac.uk") == ("ac.uk", "example.ac.uk"))
    // bare uk when no multi-label suffix matches
    assert(reg("example.uk") == ("uk", "example.uk"))
    assert(reg("a.example.com") == ("com", "example.com"))
  }

  test("unknown TLD falls back to last label + last two labels") {
    assert(reg("www.example.dev") == ("dev", "example.dev"))
    assert(reg("localhost") == ("localhost", "localhost"))
  }

  test("blocklist verdicts") {
    val df = Seq((1L, "bad.com"), (2L, "good.com")).toDF("id", "domain")
    val got = Domains.withBlocklist(df, "domain",
        Seq("bad.com").toDF("domain"))
      .orderBy("id").select("verdict").as[String].collect().toSeq
    assert(got == Seq("blocked", "kept"))
  }

  test("canonicalizeUrl: ports, case, fragments, tracking params, ordering, slash") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(Domains.canonicalizeUrl(col("u")).as("c"))
        .as[String].collect()(0)
    // all variants of the same page collapse
    val want = "https://example.com/path/p7?a=1&b=2"
    assert(canon("https://Example.COM:443/path/p7/?b=2&utm_source=x&a=1#frag") == want)
    assert(canon("https://example.com/path/p7?a=1&b=2") == want)
    assert(canon("https://example.com/path/p7/?utm_campaign=z&b=2&a=1") == want)
    // http default port; all params tracking → bare path, no '?'
    assert(canon("http://Other.ORG:80/q?utm_x=1&fbclid=z") == "http://other.org/q")
    // trackers strip case-insensitively and value-less (bare fbclid);
    // a merely tracker-PREFIXED name is NOT a tracker
    assert(canon("https://a.com/p?UTM_SOURCE=x&b=2") == "https://a.com/p?b=2")
    assert(canon("https://a.com/p?fbclid&b=2") == "https://a.com/p?b=2")
    assert(canon("https://a.com/p?fbclidxyz=1") == "https://a.com/p?fbclidxyz=1")
    // a param with a TRAILING NEWLINE is consistently NOT a tracker on
    // either engine: the anchor is \z, because Java's $ matches before
    // a final line terminator while RE2's does not — anchoring on $
    // would strip on Spark and keep on DuckDB
    assert(canon("https://a.com/p?fbclid\n&b=2") == "https://a.com/p?b=2&fbclid\n")
    // newline-bearing fragments/queries parse under (?s) — a bare-$
    // chain would leave the whole tail in the path on both engines
    // (and a $-anchored fragment strip would DIVERGE between them)
    assert(canon("https://a.com/p#frag\nmore") == "https://a.com/p")
    assert(canon("https://A.com/p?b=2\n&a=1#f\nx") == "https://a.com/p?a=1&b=2\n")
    // NON-default port survives; path case survives
    assert(canon("https://a.com:8443/CaseSensitive/") ==
      "https://a.com:8443/CaseSensitive")
    // no query, no fragment: identity modulo lowering
    assert(canon("https://A.com/x") == "https://a.com/x")
  }

  test("capPerDomain: full ledger, exactly cap kept per domain, stable order") {
    val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "a.com" else "b.com"))
      .toDF("id", "domain")
    val out = Domains.capPerDomain(df, "id", "domain", cap = 3).collect()
    assert(out.length == 20)
    val kept = out.filter(_.getAs[Boolean]("kept"))
    assert(kept.count(_.getAs[String]("domain") == "a.com") == 3)
    assert(kept.count(_.getAs[String]("domain") == "b.com") == 3)
    // pick_order is a permutation of 1..10 within each domain
    val orders = out.filter(_.getAs[String]("domain") == "a.com")
      .map(_.getAs[Long]("pick_order")).sorted.toSeq
    assert(orders == (1L to 10L))
    // deterministic across reruns
    val again = Domains.capPerDomain(df, "id", "domain", cap = 3).collect()
    assert(out.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }
}
