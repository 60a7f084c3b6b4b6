package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed fixtures for PQ-ADC retrieval and kNN label purity.
  * All embedding components are exact binary fractions so the 1e6
  * quantization is predictable (floor(0.75 * 1e6) = 750000 exactly). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pqTopK: codes quantize to the nearest codeword, ADC ranks by table sum") {
    // 4-dim vectors, 2 subspaces x 2 dims. Codebook = v0 (1,0,0,1) and
    // v9 (0,1,1,0); codeword ids renumber to 0 (v0) and 1 (v9).
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),                 // codes (0,0)
      (9L, Array(0f, 1f, 1f, 0f)),                 // codes (1,1)
      (1L, Array(0.75f, 0.25f, 0.25f, 0.75f)),     // codes (0,0), the query
      (2L, Array(0.25f, 0.75f, 0.75f, 0.25f)),     // codes (1,1)
      (3L, Array(0.75f, 0.25f, 0.75f, 0.25f)))     // codes (0,1)
      .toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs, vecs.filter($"vec_id" === 1L),
        vecs.filter($"vec_id" === 0L || $"vec_id" === 9L),
        "vec_id", "embedding", numSubspaces = 2, subDim = 2, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // query subvectors quantize to (750000, 250000) and (250000, 750000);
    // ADC lookup per subspace: dot vs codeword 0 = 750000*1e6, vs
    // codeword 1 = 250000*1e6 (both subspaces, by symmetry)
    val hi = 750000L * 1000000L
    val lo = 250000L * 1000000L
    assert(out.toSeq == Seq(
      (1L, 0L, hi + hi),   // codes (0,0)
      (2L, 3L, hi + lo),   // codes (0,1)
      (3L, 2L, lo + lo),   // codes (1,1) — ties with v9, lower id first
      (4L, 9L, lo + lo)))
  }

  test("ivfPqResidualTopK: residual codes, first-order term, cell pruning") {
    // 4-dim, 2 subspaces x 2 dims, two given cells. All components are
    // exact binary fractions so quantization is predictable. Cell-0
    // members share the centroid prefix (0.875, 0.125) and differ only
    // in their RESIDUAL tail — exactly the regime residual PQ encodes.
    val corpus = Seq(
      (0L, Array(0.875f, 0.125f, 0.5f, 0.0f)),   // codebook row, code 0
      (1L, Array(0.875f, 0.125f, 0.0f, 0.5f)),   // codebook row, code 1
      (2L, Array(0.875f, 0.125f, 0.375f, 0.125f)), // residual codes (0,0)
      (3L, Array(0.875f, 0.125f, 0.125f, 0.375f)), // residual codes (0,1)
      (9L, Array(0.125f, 0.875f, 0.5f, 0.5f)))     // cell 1 — pruned away
      .toDF("vec_id", "embedding")
    val trained = Seq(
      (0L, Array(875000L, 125000L, 0L, 0L)),
      (1L, Array(125000L, 875000L, 0L, 0L))).toDF("cent_id", "cv")
    val query = Seq((100L, Array(0.875f, 0.125f, 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfPqResidualTopK(corpus, query, trained,
        corpus.filter($"vec_id" < 2L), "vec_id", "embedding",
        numSubspaces = 2, subDim = 2, k = 10, nprobe = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // dot(q, c0) = 875000^2 + 125000^2 = 781250000000; subspace-0 LUT is
    // 0 for both codewords (zero residual prefixes); subspace-1 LUT:
    // code 0 -> 500000*500000 = 2.5e11, code 1 -> 250000*500000 = 1.25e11.
    // Scores: codes (0,0) -> 1031250000000 (v0, v2 — tie, lower id
    // first); codes (0,1) -> 906250000000 (v1, v3). Cell 1's v9 never
    // reaches scoring: rows_scanned = 4, not 5.
    assert(out.toSeq == Seq(
      (1L, 0L, 1031250000000L, 4L),
      (2L, 2L, 1031250000000L, 4L),
      (3L, 1L, 906250000000L, 4L),
      (4L, 3L, 906250000000L, 4L)))
  }

  test("exactRerank: exact dots reorder stage-1 candidates, both ranks kept") {
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.5f, 0.5f, 0f, 0f)),
      (2L, Array(0.25f, 0.75f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val query = Seq((100L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    // stage-1 ranking is deliberately wrong (approx scores inverted);
    // exact dots are 0, 5e11, 7.5e11 — rerank must flip the order
    val cand = Seq(
      (100L, 1L, 0L, 900L), (100L, 2L, 1L, 800L), (100L, 3L, 2L, 700L))
      .toDF("query_id", "rank", "corpus_id", "dot_rpq")
    val out = Similarity.exactRerank(cand, corpus, query,
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 2L, 750000000000L, 700L, 3L),
      (2L, 1L, 500000000000L, 800L, 2L),
      (3L, 0L, 0L, 900L, 1L)))
  }

  test("pq encode errors: flat vs residual closed forms; residual wins") {
    // the ivfPqResidualTopK fixture corpus — residuals concentrate, so
    // the same 2-codeword budget reconstructs residuals far better
    val corpus = Seq(
      (0L, Array(0.875f, 0.125f, 0.5f, 0.0f)),
      (1L, Array(0.875f, 0.125f, 0.0f, 0.5f)),
      (2L, Array(0.875f, 0.125f, 0.375f, 0.125f)),
      (3L, Array(0.875f, 0.125f, 0.125f, 0.375f)),
      (9L, Array(0.125f, 0.875f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val trained = Seq(
      (0L, Array(875000L, 125000L, 0L, 0L)),
      (1L, Array(125000L, 875000L, 0L, 0L))).toDF("cent_id", "cv")
    val cb = corpus.filter($"vec_id" < 2L)
    val flat = Similarity.pqEncodeError(corpus, cb, "vec_id", "embedding",
      numSubspaces = 2, subDim = 2).collect().head.getLong(0)
    val resid = Similarity.pqResidualEncodeError(corpus, trained, cb,
      "vec_id", "embedding", numSubspaces = 2, subDim = 2)
      .collect().head.getLong(0)
    // flat: v0/v1 exact (they ARE the codebook), v2/v3 3.125e10 each,
    // v9 pays the full cross-cluster prefix 1.125e12 + 2.5e11
    assert(flat == 2L * 31250000000L + 1375000000000L)
    // residual: v2/v3 3.125e10 each, v9's residual tail 2.5e11
    assert(resid == 2L * 31250000000L + 250000000000L)
    assert(resid < flat)
  }

  test("maxSimRerank: cross-positioned sub-vector match outranks pooled dot") {
    // 4-dim = 2 sub-vectors x 2 dims. d3 swaps the query's sub-vectors:
    // the pooled dot is 0, but every query sub-vector finds its match
    // under MaxSim — the late-interaction scorer must rank it FIRST.
    val corpus = Seq(
      (1L, Array(0.5f, 0f, 0f, 0.5f)),  // aligned, maxsim 1e12
      (2L, Array(1f, 0f, 1f, 0f)),      // sub 0 matches twice, maxsim 1e12
      (3L, Array(0f, 1f, 1f, 0f)))      // swapped: pooled dot 0, maxsim 2e12
      .toDF("vec_id", "embedding")
    val query = Seq((100L, Array(1f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val cand = Seq((100L, 1L, 1L), (100L, 2L, 2L), (100L, 3L, 3L))
      .toDF("query_id", "rank", "corpus_id")
    val out = Similarity.maxSimRerank(cand, corpus, query,
        "vec_id", "embedding", numVectors = 2, subDim = 2, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2000000000000L, 3L),
      (2L, 1L, 1000000000000L, 1L),
      (3L, 2L, 1000000000000L, 2L)))
    // pooled exact dot on the same candidates ranks d3 LAST — the two
    // scorers disagree exactly where late interaction should win
    import org.apache.spark.sql.functions.lit
    val pooled = Similarity.exactRerank(
        cand.withColumn("dot_rpq", lit(0L)), corpus, query,
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(pooled.map(_._2) == Seq(1L, 2L, 3L) ||
      pooled.map(_._2) == Seq(2L, 1L, 3L))
  }

  test("index delta: base∪delta∖deletes serves identically to a full rebuild") {
    val corpus = Seq(
      (0L, Array(0.875f, 0.125f, 0.5f, 0.0f)),
      (1L, Array(0.875f, 0.125f, 0.0f, 0.5f)),
      (2L, Array(0.875f, 0.125f, 0.375f, 0.125f)),
      (3L, Array(0.875f, 0.125f, 0.125f, 0.375f)),
      (9L, Array(0.125f, 0.875f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val trained = Seq(
      (0L, Array(875000L, 125000L, 0L, 0L)),
      (1L, Array(125000L, 875000L, 0L, 0L))).toDF("cent_id", "cv")
    val cb = corpus.filter($"vec_id" < 2L)
    val query = Seq((100L, Array(0.875f, 0.125f, 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    def idx(part: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqResidualIndex(part, trained, cb, "vec_id",
        "embedding", numSubspaces = 2, subDim = 2)
    // v3 arrives as a delta; v2 gets tombstoned
    val merged = idx(corpus.filter($"vec_id" =!= 3L))
      .unionByName(idx(corpus.filter($"vec_id" === 3L)))
      .join(Seq(2L).toDF("corpus_id"), Seq("corpus_id"), "left_anti")
    val probes = Similarity.ivfProbes(query, trained, "vec_id",
      "embedding", nprobe = 1)
    def serve(index: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqResidualServe(index, probes, query, trained, cb,
          "vec_id", "embedding", numSubspaces = 2, subDim = 2, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val rebuilt = serve(idx(corpus.filter($"vec_id" =!= 2L)))
    val incremental = serve(merged)
    assert(incremental == rebuilt)
    // the tombstoned vector is really gone, the delta vector is present
    assert(!incremental.exists(_._3 == 2L))
    assert(incremental.exists(_._3 == 3L))
  }

  test("labelPurity: per-label edge counts and same-label fraction") {
    val graph = Seq(
      (1L, 1L, 2L, 10L), (1L, 2L, 3L, 9L),  // src 1: nbrs 2 (same), 3 (diff)
      (2L, 1L, 1L, 10L),                     // src 2: nbr 1 (same)
      (3L, 1L, 1L, 8L))                      // src 3: nbr 1 (diff)
      .toDF("src_id", "rank", "nbr_id", "dot_q")
    val labels = Seq((1L, 7), (2L, 7), (3L, 8)).toDF("vec_id", "label")
    val out = Similarity.labelPurity(graph, labels, "vec_id", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(7L) == ((3L, 2L, 0.666667))) // 2/3 rounded in decimal domain
    assert(out(8L) == ((1L, 0L, 0.0)))
  }
}
