package graft.plans

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.InteractionGraph
import graft.pipeline.{Curate, Dedup, Similarity}

/** Empirical 10× scale probes for the heaviest operator families: run
  * each on deterministic data at base size and at 10× and assert
  * wall-time grows ≲ linearly, with a LOUD factor guard. This is not a
  * benchmark — the bounds are deliberately loose (timing noise, JIT) —
  * it exists to catch superlinear compounding defects of the q207
  * class (O(diameter) iterative rounds, Catalyst stats products
  * doubling per checkpointed round, quadratic candidate blowups):
  * those fail at 50×+, far outside any noise band. Model artifacts
  * (centroids, codebooks) are FROZEN across scales, as in production —
  * data scales, the model does not. */
class ScaleProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def timeOf(f: => Unit): Double = {
    val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
  }

  /** Guard with a base-time floor: sub-floor bases are all overhead and
    * would inflate the ratio meaninglessly. */
  private def ratioGuard(name: String, base: Double, big: Double,
      bound: Double): Unit = {
    val r = big / math.max(base, 0.2)
    info(f"$name: base ${base}%.2f s -> 10x ${big}%.2f s (ratio ${r}%.1f, bound $bound)")
    assert(r <= bound,
      f"$name: 10x data cost ${big}%.2f s vs base ${base}%.2f s — " +
        f"ratio ${r}%.1f exceeds $bound: superlinear compounding " +
        "(check iterative round counts and checkpoint stats)")
  }

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  /** Deterministic k-fold corpus explode: ids disjoint, text varied by
    * a copy suffix so exact-dup behavior does not change with k. */
  private def explodeDocs(k: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(sequence(lit(0), lit(k - 1))).as("_c"),
        col("doc_id"), col("text"), col("source"))
      .select((col("doc_id") * k + col("_c")).as("doc_id"),
        concat(col("text"), lit(" copyv"), col("_c").cast("string"))
          .as("text"),
        col("source"))

  test("cluster closure (nearDupClusters) stays ~linear under 10x chains") {
    // worst shape for label propagation: one long chain (diameter = n)
    // plus isolated tails — the pointer jump must keep rounds O(log n)
    def run(n: Int): Double = {
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"))
      val pairs = spark.range(n.toLong - 1)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        .filter(col("doc_a") % 7 =!= 3) // break into diameter ~n/…, several components
      timeOf {
        Dedup.nearDupClusters(docs, pairs, "doc_id").count()
      }
    }
    run(300) // warmup (JIT, codegen caches)
    val base = run(3000)
    val big = run(30000)
    ratioGuard("nearDupClusters", base, big, bound = 25.0)
  }

  test("SNM multipass stays ~linear under 10x corpus") {
    assume(haveData)
    def run(k: Int): Double = {
      val d = explodeDocs(k)
      timeOf {
        Dedup.sortedNeighborhoodMultiPass(d, "doc_id", "text",
          window = 4).count()
      }
    }
    run(1) // warmup
    val base = run(1)
    val big = run(10)
    ratioGuard("snmMultiPass", base, big, bound = 30.0)
  }

  test("curation ledger (curateStaged) stays ~linear under 10x corpus") {
    assume(haveData)
    def run(k: Int): Double = {
      val d = explodeDocs(k)
      val corpus = d.filter(col("source") =!= "src0")
      val eval = d.filter(col("source") === "src0")
      val drop1 = corpus.filter(col("doc_id") % 17 === 3)
        .select(col("doc_id"))
      val drop2 = corpus.filter(col("doc_id") % 23 === 5)
        .select(col("doc_id"))
      timeOf {
        Curate.curateStaged(corpus, "doc_id", "text", "source",
          eval, "doc_id", "text",
          Seq("neardup" -> drop1, "semantic" -> drop2),
          rates = Map("src1" -> 100, "src2" -> 75, "src3" -> 50,
            "src4" -> 25, "src5" -> 10)).count()
      }
    }
    run(1) // warmup
    val base = run(1)
    val big = run(10)
    ratioGuard("curateStaged", base, big, bound = 30.0)
  }

  test("residual index build stays ~linear under 10x vectors (frozen model)") {
    def vecs(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("vec_id"),
        array((0 until 32).map(j =>
          (pmod(col("id") * (31 + j) + j * 17, lit(1000)).cast("double") /
            lit(1000.0)).cast("float")): _*).as("embedding"))
    // frozen model artifacts from the BASE corpus (the q220 device:
    // data scales, the trained model does not)
    val baseCorpus = vecs(2000).localCheckpoint()
    val trained = Similarity.trainCentroids(baseCorpus, "vec_id",
      "embedding", k = 8, iters = 2).localCheckpoint()
    val codebook = baseCorpus.filter(col("vec_id") % 61 === 3)
      .localCheckpoint()
    def run(n: Int): Double = {
      val c = vecs(n)
      timeOf {
        Similarity.ivfPqResidualIndex(c, trained, codebook, "vec_id",
          "embedding", numSubspaces = 4, subDim = 8).count()
      }
    }
    run(200) // warmup
    val base = run(2000)
    val big = run(20000)
    ratioGuard("residualIndexBuild", base, big, bound = 30.0)
  }

  test("dup-span coverage stays ~linear under 10x corpus with a " +
      "corpus-wide boilerplate 8-gram (hot-fp short-circuit)") {
    assume(haveData)
    // every document carries the same boilerplate footer, so ONE
    // 8-gram fingerprint occurs corpus-wide: without the hot/cold
    // split this is a single-task window partition that grows 10×
    // per scale step (the Zipfian stop-phrase shape); with it, the
    // hot fp short-circuits via the pre-counted distinct-doc verdict
    // and only ≤ hotCap partitions ever form. hotCap = 64 forces the
    // hot path at BOTH scales — the probe times the mechanism that
    // production relies on, not the cold fallback.
    val footer = " the quick brown fox jumps over the lazy dog"
    def run(k: Int): Double = {
      val d = explodeDocs(k)
        .select(col("doc_id"), concat(col("text"), lit(footer)).as("text"))
      timeOf {
        graft.pipeline.TextMetrics.dupSpanCoverage(d, "doc_id", "text",
          k = 8, minDocs = 2, hotCap = 64).count()
      }
    }
    run(1) // warmup
    val base = run(1)
    val big = run(10)
    ratioGuard("dupSpanCoverageHotFp", base, big, bound = 30.0)
  }

  test("chunk dedup stays ~linear under 10x corpus with a corpus-wide " +
      "boilerplate chunk (hot-hash first-occurrence short-circuit)") {
    assume(haveData)
    // the chunk twin of the dup-span probe: every doc leads with the
    // same 32-token boilerplate block, so ONE chunk_md5 recurs
    // corpus-wide — without the split its Window.partitionBy(chunk_md5)
    // partition grows 10× per scale step on a single task; with it the
    // hot hash short-circuits via the pre-computed first occurrence.
    // hotCap = 64 engages the hot path at BOTH scales.
    val boiler = (1 to 32).map(i => s"b$i").mkString(" ") + " "
    def run(k: Int): Double = {
      val d = explodeDocs(k)
        .select(col("doc_id"), concat(lit(boiler), col("text")).as("text"))
      timeOf {
        graft.pipeline.TextMetrics.chunkDedup(d, "doc_id", "text",
          maxTokens = 32, hotCap = 64).count()
      }
    }
    run(1) // warmup
    val base = run(1)
    val big = run(10)
    ratioGuard("chunkDedupHotHash", base, big, bound = 30.0)
  }

  test("connected components stay ~linear under 10x edges") {
    // chains + residue chords: components of growing diameter, so the
    // star rounds (O(log n)) dominate any compounding defect signal
    def run(n: Int): Double = {
      val inter = spark.range(n.toLong - 1)
        .select(col("id").as("author_id"),
          (col("id") + 1).as("target_user_id"))
        .filter(col("author_id") % 11 =!= 7)
        .unionByName(spark.range(n.toLong / 10)
          .select((col("id") * 10).as("author_id"),
            (col("id") * 10 + 5).as("target_user_id")))
      timeOf {
        InteractionGraph.connectedComponents(inter).count()
      }
    }
    run(300) // warmup
    val base = run(3000)
    val big = run(30000)
    ratioGuard("connectedComponents", base, big, bound = 25.0)
  }
}
