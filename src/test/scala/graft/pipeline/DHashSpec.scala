package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Perceptual dHash image near-dup device (q199): the decode-side
  * kernel pinned against an independent closed-form reimplementation,
  * the planted 1-pixel-perturbation staying within Hamming 2, and the
  * 8-band bucket join's EXACT-recall contract (result set == brute
  * all-pairs at the threshold — the pigeonhole guarantee, not a
  * probabilistic one). */
class DHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent driver-side dHash from the closed-form pixel generator
    * (never touches a codec or the kernel under test): the same 9×8
    * nearest-neighbor grid, gray = r+g+b, strict gradient compare. */
  private def brute(gen: Long, perturbed: Boolean): (Long, Long) = {
    val w = (8 + gen % 9).toInt
    val h = (8 + gen % 7).toInt
    def gray(sx: Int, sy: Int): Int = {
      val r0 = ((gen * 31 + sx * 7 + sy * 13) % 256).toInt
      val r = if (perturbed && sx == 0 && sy == 0) (r0 + 128) % 256 else r0
      r + ((gen * 17 + sx * 11 + sy * 3) % 256).toInt +
        ((gen * 5 + sx * 23 + sy * 29) % 256).toInt
    }
    var hi = 0L
    var lo = 0L
    for (gy <- 0 until 8; gx <- 0 until 8) {
      if (gray(gx * w / 9, gy * h / 8) > gray((gx + 1) * w / 9, gy * h / 8)) {
        val idx = gy * 8 + gx
        if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
      }
    }
    (hi, lo)
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("dHashes through the real PNG codec matches the generator-formula reimplementation") {
    import spark.implicits._
    val ids = (0L until 120L).toDF("doc_id").repartition(7)
    val got = Multimodal.dHashes(Multimodal.syntheticNearDupPngs(ids, "doc_id"))
      .collect().map(d => d.media_id -> ((d.hash_hi, d.hash_lo))).toMap
    assert(got.size == 120)
    (0L until 120L).foreach { id =>
      assert(got(id) == brute(id / 2, id % 2 == 1),
        s"kernel hash diverges from the closed form at id=$id")
    }
    // both halves stay non-negative 32-bit values (the no-sign-bit contract)
    got.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
  }

  test("1-pixel perturbation stays within Hamming 2 of its base, and actually moves some hash") {
    val ds = (0L until 200L).map(g => hamming(brute(g, false), brute(g, true)))
    assert(ds.forall(_ <= 2),
      "a (0,0) perturbation can move at most the two grid compares that sample it")
    assert(ds.exists(_ >= 1), "the perturbation must flip at least one bit somewhere")
  }

  test("dhashNearDups == brute all-pairs at Hamming <= 6 (exact recall), planted pairs all caught") {
    import spark.implicits._
    val n = 150L
    val ids = (0L until n).toDF("doc_id").repartition(5)
    val hashes = Multimodal.dHashes(
      Multimodal.syntheticNearDupPngs(ids, "doc_id")).toDF()
    val got = Multimodal.dhashNearDups(hashes, maxHamming = 6)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    val all = (0L until n).map(id => id -> brute(id / 2, id % 2 == 1)).toMap
    val want = (for {
      a <- 0L until n; b <- (a + 1) until n
      d = hamming(all(a), all(b)) if d <= 6
    } yield (a, b) -> d.toLong).toMap
    assert(got == want,
      "band-bucket candidates + integer verify must equal brute all-pairs at the threshold")
    // every planted (2k, 2k+1) near-dup pair is caught at Hamming <= 2
    (0L until n / 2).foreach { g =>
      val key = (2 * g, 2 * g + 1)
      assert(got.contains(key) && got(key) <= 2L,
        s"planted near-dup pair $key missed or too distant")
    }
    // distinct generators are overwhelmingly NOT paired
    assert(got.size < (n * (n - 1) / 2) / 10,
      "near-dup output must be sparse over distinct images")
  }

  test("dhashNearDups rejects a threshold past the 8-band pigeonhole guarantee") {
    import spark.implicits._
    val hashes = Seq((1L, 0L, 0L)).toDF("media_id", "hash_hi", "hash_lo")
    intercept[IllegalArgumentException] {
      Multimodal.dhashNearDups(hashes, maxHamming = 8)
    }
  }
}
