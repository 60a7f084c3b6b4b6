package graft

import org.scalatest.funsuite.AnyFunSuite

/** Headline-compaction contract for [[Bench.fitHeadline]]: the driver
  * parses only the last ~2000 stdout chars, so the line must fit 1990
  * chars at ANY query count. Tier 1 = full names, tier 2 = unique qNN
  * prefixes, tier 3 = no per-query map (times in bench_detail.json
  * only) — tier 3 bounds the line by the failed list alone, closing
  * the per-round headroom re-check. */
class BenchHeadlineSpec extends AnyFunSuite {

  // THE live template (Bench.renderHeadline) with fixed telemetry
  // values — the asserted tier cutovers track the real line by
  // construction, not by a hand-synced copy.
  private def mk(qs: String, fl: String): String =
    Bench.renderHeadline(12.345, 3, 0.150, 0.550, "0.1")(qs, fl)

  private def entries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q${i}%d_some_operator_name", 1.23))

  test("small sweeps keep full query names (tier 1)") {
    val (line, tier) = Bench.fitHeadline(mk, entries(10), Nil)
    assert(tier == 1)
    assert(line.contains("\"q3_some_operator_name\":1.23"))
    assert(line.length <= 1990)
  }

  test("mid-size sweeps compact to unique qNN prefixes (tier 2)") {
    val (line, tier) = Bench.fitHeadline(mk, entries(150), Nil)
    assert(tier == 2)
    assert(line.contains("\"q100\":1.23") && line.contains("\"q10\":1.23"),
      "prefix compaction must keep q100 and q10 distinct")
    assert(!line.contains("some_operator_name"))
    assert(line.length <= 1990)
  }

  test("very large sweeps drop the per-query map entirely (tier 3)") {
    val (line, tier) = Bench.fitHeadline(mk, entries(400),
      Seq("q7_some_operator_name"))
    assert(tier == 3)
    assert(line.contains("\"queries\":{}"), "schema keys must not vanish")
    assert(line.contains("\"failed\":[\"q7\"]"))
    assert(line.length <= 1990)
  }

  test("tier-3 length is bounded for any query count") {
    val (l1, _) = Bench.fitHeadline(mk, entries(400), Nil)
    val (l2, _) = Bench.fitHeadline(mk, entries(4000), Nil)
    assert(l1.length == l2.length)
  }
}
