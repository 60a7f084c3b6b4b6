package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Every data-contract rule fires on planted violations, and the
  * norm-outlier band flags exactly the extremes. */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("documentsContract: each rule counts its planted violation") {
    val rows = Seq(
      (Some(1L), "good text here", "en", "src1", 14L),
      (Some(1L), "dup id", "en", "src2", 6L),          // id_unique
      (None, "no id", "en", "src1", 5L),               // id_not_null
      (Some(3L), "  ", "en", "src1", 2L),              // text_not_empty
      (Some(4L), "bad count", "en", "src1", 99L),      // n_chars_consistent
      (Some(5L), "bad lang", "xx", "src1", 8L),        // lang_allowed
      (Some(6L), "bad source", "en", "web1", 10L))     // source_format
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Contract.documentsContract(rows, Seq("en", "de"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("id_not_null") == ((1L, false)))
    assert(out("id_unique") == ((1L, false)))
    assert(out("text_not_empty") == ((1L, false)))
    // the planted n_chars mismatches: 99 vs 9; rows with honest counts
    // (including the empty-text and bad-lang rows) don't count
    assert(out("n_chars_consistent")._1 >= 1L)
    assert(out("lang_allowed") == ((1L, false)))
    assert(out("source_format") == ((1L, false)))
  }

  test("documentsContract: a clean frame passes every rule") {
    val rows = Seq((1L, "alpha beta", "en", "src1", 10L),
      (2L, "gamma delta", "de", "src2", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Contract.documentsContract(rows, Seq("en", "de")).collect()
    assert(out.length == 6 && out.forall(_.getBoolean(2)))
  }

  test("embeddingsContract: each rule counts its planted violation; clean frame passes") {
    val rows = Seq(
      (Some(1L), Array(0.1f, 0.2f), Some(3)),
      (Some(1L), Array(0.3f, 0.4f), Some(4)),          // id_unique
      (None, Array(0.5f, 0.6f), Some(1)),              // id_not_null
      (Some(3L), Array.empty[Float], Some(1)),         // vector_not_empty
      (Some(4L), Array(0.1f, 0.2f, 0.3f), Some(2)),    // dims_consistent
      (Some(5L), Array(Float.NaN, 0.1f), Some(2)),     // components_finite
      (Some(6L), Array(0f, 0f), Some(2)),              // no_zero_vectors
      (Some(7L), Array(0.7f, 0.8f), None))             // label_not_null
      .toDF("vec_id", "embedding", "label")
    val out = Contract.embeddingsContract(rows)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("id_not_null") == ((1L, false)))
    assert(out("id_unique") == ((1L, false)))
    assert(out("vector_not_empty") == ((1L, false)))
    assert(out("dims_consistent") == ((1L, false))) // 2 dims observed (2,3) → 1 extra
    assert(out("components_finite") == ((1L, false)))
    assert(out("no_zero_vectors") == ((1L, false)))
    assert(out("label_not_null") == ((1L, false)))
    val clean = Seq((1L, Array(0.1f, 0.2f), 0), (2L, Array(0.3f, 0.4f), 1))
      .toDF("vec_id", "embedding", "label")
    val res = Contract.embeddingsContract(clean).collect()
    assert(res.length == 7 && res.forall(_.getBoolean(2)))
  }

  test("chatContract: every rule fires on its planted violation, clean convs validate") {
    val turns = Seq(
      // conv 1: clean 2-turn conversation -> valid
      (1L, 1L, "user", "hi"), (1L, 2L, "assistant", "hello"),
      // conv 2: starts with assistant
      (2L, 1L, "assistant", "hi"), (2L, 2L, "user", "x"),
      (2L, 3L, "assistant", "y"),
      // conv 3: ends on user (truncated generation)
      (3L, 1L, "user", "a"), (3L, 2L, "assistant", "b"), (3L, 3L, "user", "c"),
      // conv 4: role repeat mid-conversation
      (4L, 1L, "user", "a"), (4L, 2L, "user", "b"), (4L, 3L, "assistant", "c"),
      (4L, 4L, "assistant", "d"),
      // conv 5: empty turn (whitespace only)
      (5L, 1L, "user", "a"), (5L, 2L, "assistant", "  "))
      .toDF("conv", "idx", "role", "content").repartition(5)
    val out = Contract.chatContract(turns, "conv", "idx", "role", "content")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))).toMap
    assert(out(1L) == ((2L, true, true, 0L, 0L, true)))
    assert(out(2L) == ((3L, false, true, 0L, 0L, false)))
    assert(out(3L) == ((3L, true, false, 0L, 0L, false)))
    assert(out(4L) == ((4L, true, true, 2L, 0L, false)))
    assert(out(5L) == ((2L, true, true, 0L, 1L, false)))
  }

  test("normOutliers flags exactly the vectors outside the [p1,p99] rank band") {
    // 100 vectors with strictly increasing norms: p1 bound = rank 1,
    // p99 bound = rank 99 -> outliers = the single largest norm
    val vecs = (1L to 100L).map(i => (i, Array(i.toFloat / 100f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.normOutliers(vecs, "vec_id", "embedding")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(100L))
  }

  test("applySnapshot: upsert/delete rewrite with per-row verdicts; applying twice is a no-op") {
    val current = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val refresh = Seq(
      (1L, "alpha"),       // unchanged
      (2L, "beta v2"),     // changed
      (5L, "epsilon"))     // added; 3 and 4 are deleted
      .toDF("doc_id", "text")
    val merged = Contract.applySnapshot(current, refresh, "doc_id", "text")
    val got = merged.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> (("alpha", "unchanged")),
      2L -> (("beta v2", "changed")),
      5L -> (("epsilon", "added"))))
    // idempotency: the merged corpus re-refreshed with the SAME snapshot
    // is byte-identical content with every verdict 'unchanged'
    val again = Contract.applySnapshot(merged.drop("status"), refresh,
      "doc_id", "text")
    val got2 = again.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got2.keySet == got.keySet)
    assert(got2.forall { case (id, (txt, st)) =>
      st == "unchanged" && txt == got(id)._1 })
    // audit counts match the diff verdicts, including the deletions the
    // merged relation no longer carries
    val audit = Contract.refreshAudit(current, refresh, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map("added" -> 1L, "changed" -> 1L, "removed" -> 2L,
      "unchanged" -> 1L))
  }

  test("scd2History: runs close on content change AND absence gaps") {
    // id 1: stable across all three versions → one current interval
    // id 2: changed at v2 → [1,1] + [2,3] current
    // id 3: removed at v2, re-added at v3 with the SAME text → two
    //       intervals (presence history splits identical content)
    // id 4: added at v2 → [2,3] current
    // id 5: removed after v1 → [1,1], not current
    val versioned = Seq(
      (1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "a"),
      (1L, 2L, "b"), (2L, 2L, "b2"), (3L, 2L, "b2"),
      (1L, 3L, "c"), (3L, 3L, "c"),
      (2L, 4L, "d"), (3L, 4L, "d"),
      (1L, 5L, "e"))
      .toDF("ver", "doc_id", "text")
    val got = Contract.scd2History(versioned.repartition(5), "doc_id",
        "ver", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, 1L, 3L, 1L),
      (2L, 1L, 1L, 0L), (2L, 2L, 3L, 1L),
      (3L, 1L, 1L, 0L), (3L, 3L, 3L, 1L),
      (4L, 2L, 3L, 1L),
      (5L, 1L, 1L, 0L)))
  }
}
