package graft.pipeline

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q76 (BPE encode) applies learned merges with a greedy
  * lowest-rank-first kernel; like q36/q71 it is not SQL-expressible, so
  * the value surface is closed here: (1) the kernel agrees with an
  * independent replay-in-rank-order encoder on every word of a corpus
  * whose merges were themselves learned by the independent trainer,
  * (2) the DataFrame op is partitioning-invariant, and (3) the full
  * sf0.001 output is pinned to a golden hash. */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    "the theater thesis then there",
    "low lower lowest slow slowly",
    "banana bandana ban banner",
    "aaa aaaa aaaaa ab abab ababab")

  private def learnedMerges(n: Int): Seq[(String, String)] = {
    val wc = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    Bpe.referenceMerges(wc, n).map { case (_, l, r, _) => (l, r) }
  }

  test("greedy kernel equals replay encoder on every corpus word") {
    val merges = learnedMerges(8)
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val words = corpus.flatMap(_.split("\\s+")).distinct
    words.foreach { w =>
      assert(Bpe.encodeWord(w, ranks).toVector ==
        Bpe.referenceEncode(w, merges),
        s"kernel and replay disagree on '$w'")
    }
    // merges actually fired: at least one word got shorter than chars
    assert(words.exists(w => Bpe.encodeWord(w, ranks).length < w.length))
  }

  test("encode counts words, chars, and post-merge tokens by hand") {
    // merges: (a,b)->ab then (ab,ab)->abab
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val out = Bpe.encode(Seq((1L, "abab Ab xyz"), (2L, ""))
        .toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.getString(4))))).toMap
    // "abab"->[abab], "ab"->[ab] (lower-cased), "xyz"->[x,y,z]
    assert(out(1L)._1 == 3L && out(1L)._2 == 9L && out(1L)._3 == 5L)
    val expected = MessageDigest.getInstance("MD5")
      .digest("abab|ab|x y z".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._4.contains(expected))
    assert(out(2L) == ((0L, 0L, 0L, None)))
  }

  test("encode is partitioning-invariant") {
    val merges = learnedMerges(6)
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def run(parts: Int) =
      Bpe.encode(spark.createDataFrame(docs.toDF("doc_id", "text").rdd,
          docs.toDF("doc_id", "text").schema).repartition(parts),
        "doc_id", "text", merges)
        .collect().map(_.mkString(",")).sorted.toSeq
    assert(run(1) == run(7))
  }

  test("q76 BPE encode at sf0.001 matches the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = graft.queries.PipelineQueries
      .q76BpeEncode(spark, "/root/testdata/sf0.001")
    val lines = out.collect().map(_.mkString(",")).sorted.toSeq
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach { ln => md.update(ln.getBytes("UTF-8")); md.update('\n'.toByte) }
    val h = md.digest().map("%02x".format(_)).mkString
    assert(lines.nonEmpty)
    assert(h == "6bb4b3ceae63e5da57edf8988dd69fd0073d5b354425e8c19beea84988028e4d",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }
}
