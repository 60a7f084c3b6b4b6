package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-modal keep-list semantics (q207): per-stage canonicals from
  * planted pair relations, first-drop attribution in pipeline order, and
  * the packed single-loop clustering device. Pairs are injected directly
  * so each scenario is constructed, not hoped for — including the two
  * the composition exists for: a document that survives text dedup but
  * dies image dedup, and the reverse. */
class CrossModalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("unique-text doc dies image-only; duplicate-text doc dies text-only") {
    // 0,1: image twins with DIFFERENT texts (text keeps both; image
    //      elects 0) -> 1 survives text, dies image.
    // 2,3: same text, different pixels (text elects 2; image keeps
    //      both) -> 3 dies text, survives image.
    // 4: untouched everywhere -> kept.
    val textPairs = Seq((2L, 3L)).toDF("doc_a", "doc_b")
    val imagePairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val packed = Dedup.crossModalClusters(ids(5), "doc_id",
      Seq("image" -> imagePairs))
    val tagged = Dedup.nearDupClusters(ids(5), textPairs, "doc_id")
      .select(org.apache.spark.sql.functions.lit("text").as("stage"),
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("cluster_id"))
      .unionByName(packed)
    val out = Dedup.crossModalKeepList(ids(5), "doc_id", tagged,
        Seq("text", "image"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3), r.getString(4), r.getLong(5)))).toMap
    assert(out(0L) == ((true, "kept", 0L)))   // image-cluster canonical
    assert(out(1L) == ((false, "image", 0L))) // survives text, dies image
    assert(out(2L) == ((true, "kept", 2L)))   // text-cluster canonical
    assert(out(3L) == ((false, "text", 2L)))  // dies text, survives image
    assert(out(4L) == ((true, "kept", 4L)))
  }

  test("first-drop attribution follows stage order, not drop count") {
    // doc 1 dies in BOTH stages with different canonicals: reason and
    // canonical_id must come from the FIRST stage in the given order.
    val aPairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val bPairs = Seq((2L, 1L)).toDF("doc_a", "doc_b")
    def keep(order: Seq[String]) = {
      val tagged = Dedup.crossModalClusters(ids(3), "doc_id",
        Seq("alpha" -> aPairs, "beta" -> bPairs))
      Dedup.crossModalKeepList(ids(3), "doc_id", tagged, order)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(4), r.getLong(5)))).toMap
    }
    assert(keep(Seq("alpha", "beta"))(1L) == (("alpha", 0L)))
    // beta's component {1,2} elects min id 1 — doc 1 IS beta's
    // canonical, so even under beta-first order doc 1 falls at alpha;
    // the order switch shows on doc 2, which only beta drops.
    assert(keep(Seq("beta", "alpha"))(1L) == (("alpha", 0L)))
    assert(keep(Seq("beta", "alpha"))(2L) == (("beta", 1L)))
  }

  test("packed clustering equals per-stage clustering and rejects bad ids") {
    val p1 = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b") // chain
    val p2 = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    val packed = Dedup.crossModalClusters(ids(6), "doc_id",
        Seq("s1" -> p1, "s2" -> p2))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val solo1 = Dedup.nearDupClusters(ids(6), p1, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val solo2 = Dedup.nearDupClusters(ids(6), p2, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 6L).foreach { d =>
      assert(packed(("s1", d)) == solo1(d))
      assert(packed(("s2", d)) == solo2(d))
    }
    val bad = Seq((-1L, 2L)).toDF("doc_a", "doc_b")
    val ex = intercept[Exception] {
      Dedup.crossModalClusters(ids(3), "doc_id", Seq("s" -> bad))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("joint clusters merge ACROSS modality pair sets; keep-best elects by quality") {
    // text links 0-1, image links 1-2: the joint closure must put
    // {0,1,2} in ONE cluster even though no single modality saw all
    // three (the q214 semantics, vs q207's per-modality closures)
    val textPairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val imgPairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.nearDupClusters(ids(4),
      textPairs.unionByName(imgPairs), "doc_id")
    val lbl = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L))
    // quality rule: cluster {0,1,2} elects doc 2 (quality 1.0 beats
    // 0.0; n_chars 9 beats 5), NOT the min id
    val quality = Seq((0L, 0.0, 10L), (1L, 1.0, 5L), (2L, 1.0, 9L),
      (3L, 1.0, 3L)).toDF("doc_id", "quality", "n_chars")
    val kb = Dedup.keepBestPerCluster(clusters, quality, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("keep_best")).toMap
    assert(kb == Map(0L -> false, 1L -> false, 2L -> true, 3L -> true))
  }

  test("absent (stage, doc) rows keep the document at that stage") {
    // tagged carries only stage 'x' labels for docs 0..1; doc 2 has no
    // row at all -> every stage canonical defaults to itself.
    val tagged = Seq(("x", 0L, 0L), ("x", 1L, 0L)).toDF(
      "stage", "doc_id", "cluster_id")
    val out = Dedup.crossModalKeepList(ids(3), "doc_id", tagged,
        Seq("x", "y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((0L, 1L, false, "x")))
    assert(out(2L) == ((2L, 2L, true, "kept")))
  }
}
