package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Verdict semantics for incremental-ingest dedup (the near-dup pair
  * relation is injected directly, so every arm is exercised even when
  * the synthetic corpus lacks exact duplicates). */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact beats near; near requires a boundary-crossing pair") {
    val oldDocs = Seq((1L, "the same text"), (2L, "corpus doc two"))
      .toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, "the same text"),     // exact dup of 1 (also paired with 2)
      (11L, "nearly doc two"),    // near dup via pair (2,11)
      (12L, "fresh a"),           // paired only with new doc 13 -> new
      (13L, "fresh b"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 11L), (10L, 2L), (12L, 13L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.incrementalDedup(newDocs, oldDocs, pairs,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "dup_exact", 11L -> "dup_near",
      12L -> "new", 13L -> "new"))
  }

  test("Bloom pre-filter on the exact arm changes nothing, even at fpp ~ 1") {
    val oldDocs = (1L to 40L).map(i => (i, s"corpus doc number $i"))
      .toDF("doc_id", "text")
    val newDocs = Seq(
      (100L, "corpus doc number 7"),   // exact dup
      (101L, "corpus doc number 7"),   // exact dup (same text twice)
      (102L, "near of thirteen"),      // near via pair
      (103L, "genuinely new text"))
      .toDF("doc_id", "text")
    val pairs = Seq((13L, 102L)).toDF("doc_a", "doc_b")
    def run(fpp: Double) = Dedup.incrementalDedup(newDocs, oldDocs, pairs,
        "doc_id", "text", bloomFpp = fpp)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exact = run(0.0)
    assert(exact == Map(100L -> "dup_exact", 101L -> "dup_exact",
      102L -> "dup_near", 103L -> "new"))
    // false positives only ever reach the exact semi-join: verdicts are
    // identical at a tight fpp and at a uselessly loose one
    assert(run(0.01) == exact)
    assert(run(0.99) == exact)
  }

  test("duplicate pair evidence yields one verdict row per new doc") {
    val oldDocs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val newDocs = Seq((10L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 10L), (2L, 10L), (10L, 1L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.incrementalDedup(newDocs, oldDocs, pairs,
      "doc_id", "text").collect()
    assert(out.length == 1 && out.head.getString(1) == "dup_near")
  }
}
