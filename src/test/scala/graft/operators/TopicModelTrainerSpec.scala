package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** M3 — the seeded geographic topic-model trainer
  * ([[TopicModel.trainGeoModel]]). The reference's trainer is a
  * binary-only jar call (LocationTopicModelTrainer.java:261-278), so
  * like q36 the value surface is pinned three ways: partitioning
  * invariance (the AD-LDA Jacobi sweep must be bit-identical for ANY
  * doc placement), an sf0.001 golden hash over the full q135 dump, and
  * the round-trip contract — the trained matrices feed q31's
  * scoreLocationsModel unchanged. */
class TopicModelTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 40-doc toy geo corpus: 4 coordinate clusters, vocab of 12 ids. */
  private def toyCorpus(parts: Int) =
    (0L until 40L).map { d =>
      val lat = (d % 4) * 30.0 - 45.0 + (d % 3)
      val lon = (d % 4) * 60.0 - 90.0 + (d % 5)
      val words = (0 until 6).map(i => (d * 7 + i * i) % 12)
      (d, lat, lon, words)
    }.toDF("doc_id", "lat", "lon", "word_ids").repartition(parts)

  private def dump(model: TopicModel.GeoModel): Seq[String] =
    TopicModel.modelMatrices(spark, model)
      .collect().map(_.mkString(",")).sorted.toSeq

  test("trainGeoModel is bit-identical across partitionings and seeds-sensitive") {
    val a = TopicModel.trainGeoModel(toyCorpus(1), 3, 4, iters = 4)
    val b = TopicModel.trainGeoModel(toyCorpus(7), 3, 4, iters = 4)
    assert(dump(a) == dump(b))
    val c = TopicModel.trainGeoModel(toyCorpus(3), 3, 4, iters = 4, seed = 43L)
    assert(dump(a) != dump(c), "different seed must move the model")
  }

  test("join-distributed sweep is bit-identical to the broadcast sweep") {
    // same corpus, same seed, both count strategies, two partitionings
    // each — every matrix entry must match to the last bit (shared
    // kernel + (seed, doc_id, sweep) RNG)
    val viaB = TopicModel.trainGeoModel(toyCorpus(3), 3, 4, iters = 4)
    val viaJ = TopicModel.trainGeoModel(toyCorpus(3), 3, 4, iters = 4,
      countsVia = "join")
    assert(dump(viaB) == dump(viaJ))
    val viaJ7 = TopicModel.trainGeoModel(toyCorpus(7), 3, 4, iters = 4,
      countsVia = "join")
    assert(dump(viaJ7) == dump(viaB))
    // the join path must not trip the broadcast-size guard
    val tiny = TopicModel.trainGeoModel(toyCorpus(2), 3, 4, iters = 1,
      countsVia = "join", maxCountsBytes = 1L)
    assert(tiny.topicWord.nonEmpty)
  }

  test("precomputed geoCentroids round-trip bit-identically into trainGeoModel") {
    // the geography half is deterministic in (corpus, L) and independent
    // of the topic half — so training with a precomputed centroid matrix
    // (the q135 session-cache path) must not move a single bit, and the
    // standalone geoCentroids must equal the in-training k-means.
    val inline = TopicModel.trainGeoModel(toyCorpus(3), 3, 4, iters = 4,
      countsVia = "join")
    val cents = TopicModel.geoCentroids(toyCorpus(5), numLocations = 4)
    val pre = TopicModel.trainGeoModel(toyCorpus(7), 3, 4, iters = 4,
      countsVia = "join", centroids = Some(cents))
    assert(dump(pre) == dump(inline))
    assert(cents.map(_.toSeq).toSeq ==
      inline.qm.map(_.map(v => math.round(v * 1e6)).toSeq).toSeq,
      "standalone geoCentroids must equal the in-training geography")
  }

  test("K*V counts-broadcast guard refuses oversized vocabularies loudly") {
    // toyCorpus: V = 12, so K = 3 needs 3*12*8 = 288 bytes; a cap below
    // that must refuse BEFORE any sweep runs, naming both dimensions
    val ex = intercept[IllegalArgumentException] {
      TopicModel.trainGeoModel(toyCorpus(2), 3, 4, iters = 1,
        maxCountsBytes = 100L)
    }
    assert(ex.getMessage.contains("maxCountsBytes"))
    assert(ex.getMessage.contains("V=12"))
    // at the default cap the same corpus trains fine
    val m = TopicModel.trainGeoModel(toyCorpus(2), 3, 4, iters = 1)
    assert(m.topicWord.nonEmpty)
  }

  test("trained matrices are proper distributions and feed the M2 scorer") {
    val model = TopicModel.trainGeoModel(toyCorpus(4), 3, 4, iters = 4)
    model.topicWord.foreach(r => assert(math.abs(r.sum - 1.0) < 1e-9))
    model.pisetasum.foreach(r => assert(math.abs(r.sum - 1.0) < 1e-9))
    assert(math.abs(model.pi0Alpha.sum - 1.0) < 1e-9)
    assert(model.qm.forall(_.length == 3))
    // round-trip: the q31 scorer consumes the trained model unchanged
    val indexed = toyCorpus(4).select(col("doc_id"), col("word_ids"))
    val scored = TopicModel.scoreLocationsModel(indexed, "doc_id", model)
    val probs = scored.groupBy("doc_id")
      .agg(sum("probability").as("p"), count(lit(1)).as("n")).collect()
    assert(probs.length == 40)
    probs.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9) // per-doc simplex
      assert(r.getLong(2) == model.pi0Alpha.length) // one row per location
    }
    // and the location table inverts qm to spherical coordinates
    val locs = TopicModel.modelLocations(spark, model).collect()
    assert(locs.length == model.qm.length)
    locs.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 90.0 + 1e-6)
      assert(math.abs(r.getDouble(2)) <= 180.0 + 1e-6)
    }
  }

  test("Gibbs sweeps recover planted topic structure") {
    // two disjoint vocabularies (ids 0-5 vs 6-11) planted on doc parity:
    // after training K=2, each topic's word mass must concentrate on one
    // vocabulary half — the "it actually learns" check a determinism pin
    // alone cannot give. Geography is uniform so location cannot leak
    // the label.
    val planted = (0L until 60L).map { d =>
      val base = if (d % 2 == 0) 0L else 6L
      val words = (0 until 8).map(i => base + (d * 3 + i * i) % 6)
      (d, 10.0, 20.0, words)
    }.toDF("doc_id", "lat", "lon", "word_ids")
    val model = TopicModel.trainGeoModel(planted, numTopics = 2,
      numLocations = 2, iters = 8)
    val concentration = model.topicWord.map { row =>
      val lo = row.slice(0, 6).sum
      val hi = row.slice(6, 12).sum
      math.max(lo, hi) / (lo + hi)
    }
    // each topic majority-owns one half, and the two topics pick
    // DIFFERENT halves
    concentration.foreach(c => assert(c > 0.8, concentration.toSeq))
    val picksLow = model.topicWord.map(r => r.slice(0, 6).sum > r.slice(6, 12).sum)
    assert(picksLow.toSet.size == 2, s"both topics chose the same half")
  }

  test("q135 trainer dump at sf0.001 matches the pinned golden hash") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val out = graft.queries.OperatorQueries
      .q135TopicModelTrain(spark, "/root/testdata/sf0.001")
    val lines = out.collect().map(_.mkString(",")).sorted.toSeq
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach { ln => md.update(ln.getBytes("UTF-8")); md.update('\n'.toByte) }
    val h = md.digest().map("%02x".format(_)).mkString
    assert(lines.nonEmpty)
    assert(h == "1d6a69fec71f35c0cb08ed18439ea65756a4fb164860dda1a03b3503f6c6b314",
      s"golden hash drifted: got $h over ${lines.length} rows")
  }
}
