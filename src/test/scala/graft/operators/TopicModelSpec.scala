package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Topic-model pipeline: vocab id assignment, batching, and the seeded
  * Gibbs scorer's determinism guarantees. */
class TopicModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "table scan fast table merge"),
    (1L, "query key value sort window batch"),
    (2L, "spark stream join group order"),
    (3L, "hash part line row column data"))
    .toDF("doc_id", "text")

  private def model = graft.queries.OperatorQueries.fixtureGeoModel

  test("buildVocab assigns alphabetical dense-rank ids") {
    val v = TopicModel.buildVocab(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = v.keys.toSeq.sorted
    assert(words.map(v) == words.indices.map(_.toLong))
  }

  test("withCountBatches numbers docs in id order, batchSize per batch") {
    val b = TopicModel.withCountBatches(docs.select("doc_id"), "doc_id", batchSize = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("countBatchesStreaming fires full batches across micro-batches, holds the partial tail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Long]
    val query = TopicModel.countBatchesStreaming(stream.toDS(), batchSize = 5)
      .writeStream.outputMode("append").format("memory").queryName("cbs").start()
    try {
      stream.addData(0L, 1L, 2L) // 3 buffered, below the trigger
      query.processAllAvailable()
      assert(spark.table("cbs").count() == 0)
      stream.addData(3L to 11L: _*) // 12 total: batches 0,1 fire; 10,11 held
      query.processAllAvailable()
      val got = spark.table("cbs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0L to 9L).map(i => i -> i / 5).toMap)
      stream.addData(12L, 13L, 14L) // buffer reaches 5: batch 2 fires
      query.processAllAvailable()
      val got2 = spark.table("cbs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got2 == (0L to 14L).map(i => i -> i / 5).toMap)
      // bit-parity with the batch mode over the completed prefix
      val batchMode = TopicModel.withCountBatches(
        spark.range(15).toDF("doc_id"), "doc_id", batchSize = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got2 == batchMode)
    } finally query.stop()
  }

  test("seeded Gibbs is deterministic across runs and partitionings") {
    val vocab = TopicModel.buildVocab(docs, "text")
    val indexed = TopicModel.indexDocs(docs, "doc_id", "text", vocab)
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      TopicModel.scoreLocationsGibbs(df, "doc_id", model, seed = seed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val a = run(indexed, 42L)
    val b = run(indexed, 42L)
    val c = run(indexed.repartition(7), 42L)
    assert(a == b)
    assert(a == c) // per-doc seeding: partitioning cannot move results
    val d = run(indexed, 43L)
    assert(a != d) // the seed genuinely drives the sampler
  }

  test("Gibbs probabilities normalize per doc") {
    val vocab = TopicModel.buildVocab(docs, "text")
    val indexed = TopicModel.indexDocs(docs, "doc_id", "text", vocab)
    val sums = TopicModel.scoreLocationsGibbs(indexed, "doc_id", model)
      .groupBy("doc_id").agg(sum("probability").as("p"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(p => math.abs(p - 1.0) < 1e-9))
  }
}
