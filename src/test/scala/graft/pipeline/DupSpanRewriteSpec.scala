package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Reconstruction pin for [[TextMetrics.dupSpanRewrite]] (the Lee et
  * al. 2022 ExactSubstr rewrite): the distributed splice must equal a
  * naive single-threaded recompute — per-token covered flags from a
  * brute-force duplicated-window scan — on hand fixtures with
  * arbitrary-boundary duplicates AND on the real sf0.001 corpus. */
class DupSpanRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: brute-force k-window fingerprints, covered
    * flags, splice. Returns (n_tokens, n_removed, n_after, n_segments,
    * cleaned text or null). */
  private def reference(docs: Seq[(Long, String)], k: Int,
      minDocs: Int): Map[Long, (Long, Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase(java.util.Locale.ROOT)
        .split("[ \\t\\n\\f\\r]+", -1)
    }.toMap
    val owners = collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, ts) =>
      (0 to ts.length - k).foreach { i =>
        val w = ts.slice(i, i + k).mkString(" ")
        owners(w) = owners.getOrElse(w, Set.empty) + id
      }
    }
    toks.map { case (id, ts) =>
      val covered = new Array[Boolean](ts.length)
      (0 to ts.length - k).foreach { i =>
        if (owners(ts.slice(i, i + k).mkString(" ")).size >= minDocs)
          (i until i + k).foreach(covered(_) = true)
      }
      val keptToks = ts.indices.filterNot(covered).map(ts)
      var segs = 0L
      var prev = -2
      ts.indices.filterNot(covered).foreach { i =>
        if (i != prev + 1) segs += 1
        prev = i
      }
      id -> (ts.length.toLong, covered.count(identity).toLong,
        keptToks.length.toLong, segs,
        if (keptToks.isEmpty) null else keptToks.mkString(" "))
    }
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def check(docs: Seq[(Long, String)], k: Int,
      minDocs: Int): Unit = {
    val got = TextMetrics.dupSpanRewrite(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, minDocs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) null else r.getString(5))).toMap
    val want = reference(docs, k, minDocs)
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, rm, af, sg, clean)) =>
      val (gn, grm, gaf, gsg, gmd5) = got(id)
      assert((gn, grm, gaf, gsg) == (n, rm, af, sg), s"doc $id counts")
      assert(gmd5 == (if (clean == null) null else md5(clean)),
        s"doc $id splice: expected '${clean}'")
    }
  }

  test("arbitrary-boundary duplicate spliced out; unique prefix/suffix survive") {
    // the 6-token phrase recurs mid-document in both docs at DIFFERENT
    // offsets — chunk-boundary removal (q80) cannot express this cut
    val dup = "the quick brown fox jumps high"
    check(Seq(
      1L -> s"alpha beta $dup gamma delta epsilon",
      2L -> s"one $dup two three four five six"), k = 5, minDocs = 2)
  }

  test("two disjoint duplicated regions give three kept segments") {
    val d1 = "aa bb cc dd ee"
    val d2 = "vv ww xx yy zz"
    check(Seq(
      1L -> s"p1 p2 $d1 m1 m2 m3 $d2 s1 s2",
      2L -> s"$d1 q $d2"), k = 5, minDocs = 2)
  }

  test("overlapping duplicated windows merge into one removed interval") {
    // a 7-token shared run: windows at starts 1..3 overlap; removal is
    // the union, not 3 disjoint k-blocks
    val run = "t1 t2 t3 t4 t5 t6 t7"
    check(Seq(1L -> s"x $run y", 2L -> run), k = 5, minDocs = 2)
  }

  test("within-document repeats alone do not trigger removal (cross-doc rule)") {
    val phrase = "r1 r2 r3 r4 r5"
    check(Seq(
      1L -> s"$phrase mid $phrase",
      2L -> "totally different words here now okay"), k = 5, minDocs = 2)
    // and the whole doc removed when everything is shared
    check(Seq(1L -> phrase, 2L -> phrase), k = 5, minDocs = 2)
  }

  test("decontaminateRewrite excises exactly the eval-covered spans") {
    val eval = Seq(100L -> "e1 e2 e3 e4 e5 other words here")
    val corpus = Seq(
      1L -> "pre e1 e2 e3 e4 e5 post tail words",
      2L -> "nothing shared with the eval set at all")
    val got = TextMetrics.decontaminateRewrite(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        eval.toDF("doc_id", "text"), "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) null else r.getString(5))).toMap
    // doc 1: the 5-gram e1..e5 matches; positions 2..6 removed (two
    // kept segments: "pre", "post tail words")
    assert(got(1L) == (9L, 5L, 4L, 2L, md5("pre post tail words")))
    assert(got(2L) == (8L, 0L, 8L, 1L,
      md5("nothing shared with the eval set at all")))
    // within-eval overlap does NOT remove eval-only grams from corpus
    // docs that never contained them — doc 2 untouched (checked above)
  }

  test("distributed rewrite equals the reference on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    check(docs, k = 5, minDocs = 2)
  }
}
