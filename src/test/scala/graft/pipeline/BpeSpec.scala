package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def train(texts: Seq[String], n: Int) =
    Bpe.trainMerges(texts.zipWithIndex.map(_.swap).toDF("id", "text"), "text", n)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("learns the classic merge sequence on a hand-checkable corpus") {
    // "low low lower": l+o (count 3) merges first, then lo+w (3), ...
    val m = train(Seq("low low lower"), 3)
    assert(m(0) === ((1L, "l", "o", 3L)))
    assert(m(1) === ((2L, "lo", "w", 3L)))
  }

  test("matches the independent reference implementation on real data") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = Bpe.trainMerges(docs, "text", numMerges = 12)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val wordCounts = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.referenceMerges(wordCounts, 12)
    assert(got === want)
  }

  test("batched trainer: batchK=1 equals sequential; batches match the independent reference") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def collectM(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // batchK = 1 must REPRODUCE the sequential trainer exactly
    assert(collectM(Bpe.trainMergesBatched(docs, "text", 6, batchK = 1)) ==
      collectM(Bpe.trainMerges(docs, "text", 6)))
    // batched semantics pinned by the independent single-threaded
    // reference (same selection rule, different control flow)
    val wordCounts = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = collectM(Bpe.trainMergesBatched(docs, "text", 12, batchK = 8))
    assert(got == Bpe.referenceMergesBatched(wordCounts, 12, batchK = 8))
    assert(got.size == 12)
    // non-interaction selection: symbol-disjoint prefix by priority
    val sel = Bpe.selectNonInteracting(
      Seq(("a", "b", 9L), ("b", "c", 8L), ("ab", "x", 7L), ("c", "d", 6L)),
      limit = 10)
    assert(sel == Seq(("a", "b", 9L), ("c", "d", 6L))) // (b,c) shares b; (ab,x) collides with merged "ab"
  }

  test("stops early when no pairs remain; single-char words never pair") {
    val m = train(Seq("a b a"), 5)
    assert(m.isEmpty)
    val n = train(Seq("ab ab"), 5)
    assert(n === Seq((1L, "a", "b", 2L)))
  }
}
