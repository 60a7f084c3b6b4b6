package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** REAL JPEG codec battery (q235/q236): the lossy-class generator and
  * tolerance-verdict devices pinned against a spec-local
  * reimplementation that never touches the kernels under test.
  *
  * JPEG is the one codec in the battery whose decode does NOT
  * reproduce the source raster (quantization + chroma subsampling), so
  * the pins are tolerance bounds measured over the generator's FULL
  * parameter period (the raster parameters cycle in id with period
  * lcm(9,7,2,4,16,40) = 5040): max abs channel error 22 (query bound
  * 32), max planted-pair dHash Hamming 10 (query bound 16). A JDK
  * codec change that moves either past its measured value fails here
  * LOUDLY before it can flake the oracle gate. */
class JpegSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Spec-local twin of the lossy-class generator raster (grayscale
    * low-frequency sinusoid, id-dependent frequency/phase/amplitude). */
  private def raster(id: Long): java.awt.image.BufferedImage = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 1 + (id % 2).toInt
    val fy = 1 + ((id / 2) % 2).toInt
    val ph = (id % 16).toDouble / 16.0 * 2.0 * math.Pi
    val amp = 50.0 + (id % 40).toDouble
    for (y <- 0 until h; x <- 0 until w) {
      val s = math.sin(2.0 * math.Pi *
        (fx * x.toDouble / w + fy * y.toDouble / h) + ph)
      val v = math.max(0, math.min(255, 128 + math.round(amp * s).toInt))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def maxErr(id: Long): Long = {
    val ref = raster(id)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodeJpeg(id)))
    assert(dec != null && dec.getWidth == ref.getWidth &&
      dec.getHeight == ref.getHeight, s"container parse broke at id=$id")
    (for {
      y <- 0 until ref.getHeight; x <- 0 until ref.getWidth
      c <- 0 until 3
    } yield math.abs(((dec.getRGB(x, y) >> (8 * c)) & 0xff) -
        ((ref.getRGB(x, y) >> (8 * c)) & 0xff)).toLong).max
  }

  test("FULL generator period, one shared sweep: decode error within " +
      "the measured bound, codec genuinely lossy, planted-pair dHash " +
      "Hamming within bound (the q236 oracle asserts TRUE per pair)") {
    javax.imageio.ImageIO.setUseCache(false)
    // one encode+decode per gen funds BOTH pins — the error bound for
    // q235 and the PNG-vs-JPEG fingerprint distance for q236 (whose
    // oracle hardcodes within_bound=TRUE, and real data sizes reach
    // gens far past the 240-doc kernel test below)
    var maxE = 0L
    var nPos = 0
    var maxHam = 0
    (0L until 5040L).foreach { g =>
      val ref = raster(g)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeJpeg(g)))
      assert(dec != null && dec.getWidth == ref.getWidth &&
        dec.getHeight == ref.getHeight, s"container parse broke at $g")
      var e = 0L
      for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth;
           c <- 0 until 3) {
        val d = math.abs(((dec.getRGB(x, y) >> (8 * c)) & 0xff) -
          ((ref.getRGB(x, y) >> (8 * c)) & 0xff)).toLong
        if (d > e) e = d
      }
      if (e > maxE) maxE = e
      if (e > 0) nPos += 1
      val (h1, l1) = dhashOf(ref)
      val (h2, l2) = dhashOf(dec)
      val ham = java.lang.Long.bitCount(h1 ^ h2) +
        java.lang.Long.bitCount(l1 ^ l2)
      if (ham > maxHam) maxHam = ham
    }
    assert(maxE <= 22L,
      s"measured max error moved: $maxE > 22 — the q235 bound 32 " +
        "may be at risk; re-measure and re-pin")
    assert(nPos > 4000,
      "errors are ~all positive for a real lossy codec — a lossless or " +
        "stubbed path would zero them")
    assert(maxHam <= 10,
      s"planted-pair Hamming moved: $maxHam > 10 over the full " +
        "period — the q236 bound 16 may be at risk; re-measure and re-pin")
  }

  /** Spec-local twin of the COLOR lossy-class generator (gentle
    * antisymmetric r/b chroma wave over the same luma sinusoid). */
  private def colorRaster(id: Long): java.awt.image.BufferedImage = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 1 + (id % 2).toInt
    val fy = 1 + ((id / 2) % 2).toInt
    val ph = (id % 16).toDouble / 16.0 * 2.0 * math.Pi
    val amp = 50.0 + (id % 40).toDouble
    val ca = 12.0 + (id % 8).toDouble
    val phc = (id % 9).toDouble / 9.0 * 2.0 * math.Pi
    for (y <- 0 until h; x <- 0 until w) {
      val s = math.sin(2.0 * math.Pi *
        (fx * x.toDouble / w + fy * y.toDouble / h) + ph)
      val t = math.sin(2.0 * math.Pi * x.toDouble / w + phc)
      val v = math.max(0, math.min(255, 128 + math.round(amp * s).toInt))
      val r = math.max(0, math.min(255, v + math.round(ca * t).toInt))
      val b = math.max(0, math.min(255, v - math.round(ca * t).toInt))
      img.setRGB(x, y, (r << 16) | (v << 8) | b)
    }
    img
  }

  test("COLOR full generator period, one shared sweep: the JPEG side is " +
      "genuinely 4:2:0 chroma-subsampled, decode error within the " +
      "measured color bound, planted-pair dHash Hamming within bound") {
    javax.imageio.ImageIO.setUseCache(false)
    // the color arm exists to pin the CHROMA-SUBSAMPLING envelope the
    // grayscale fixture kills by construction (r=g=b): assert the
    // emitted stream's SOF0 sampling factors really are 2x2/1x1/1x1,
    // then sweep the full period for both q242/q243 bounds
    val probe = Multimodal.encodeColorJpeg(227L)
    val sof = probe.indices.dropRight(1).find(i =>
      (probe(i) & 0xff) == 0xFF && (probe(i + 1) & 0xff) == 0xC0).get
    assert((probe(sof + 9) & 0xff) == 3, "SOF0 must carry 3 components")
    assert((probe(sof + 11) & 0xff) == 0x22 &&
      (probe(sof + 14) & 0xff) == 0x11 && (probe(sof + 17) & 0xff) == 0x11,
      "writer stopped chroma-subsampling (expected Y 2x2, Cb/Cr 1x1) — " +
        "the color arm no longer exercises 4:2:0; re-measure the bounds")
    var maxE = 0L
    var nPos = 0
    var maxHam = 0
    var chromaErrSeen = false
    (0L until 5040L).foreach { g =>
      val ref = colorRaster(g)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeColorJpeg(g)))
      assert(dec != null && dec.getWidth == ref.getWidth &&
        dec.getHeight == ref.getHeight, s"container parse broke at $g")
      var e = 0L
      for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth) {
        val p = dec.getRGB(x, y); val q = ref.getRGB(x, y)
        var rErr = 0L; var gErr = 0L; var bErr = 0L
        for (c <- 0 until 3) {
          val d = math.abs(((p >> (8 * c)) & 0xff) -
            ((q >> (8 * c)) & 0xff)).toLong
          if (d > e) e = d
          if (c == 2) rErr = d else if (c == 1) gErr = d else bErr = d
        }
        // r/b diverging from g's error is chroma error surfacing (a
        // grayscale image cannot produce it)
        if (rErr != gErr || bErr != gErr) chromaErrSeen = true
      }
      if (e > maxE) maxE = e
      if (e > 0) nPos += 1
      val (h1, l1) = dhashOf(ref)
      val (h2, l2) = dhashOf(dec)
      val ham = java.lang.Long.bitCount(h1 ^ h2) +
        java.lang.Long.bitCount(l1 ^ l2)
      if (ham > maxHam) maxHam = ham
    }
    assert(maxE <= 30L,
      s"measured max color error moved: $maxE > 30 — the q242 bound 48 " +
        "may be at risk; re-measure and re-pin")
    assert(nPos > 4900,
      "errors are ~all positive for a real lossy codec on a color raster")
    assert(chromaErrSeen,
      "no per-channel error asymmetry anywhere — the fixture degenerated " +
        "to grayscale and no longer pins the subsampling envelope")
    assert(maxHam <= 10,
      s"color planted-pair Hamming moved: $maxHam > 10 — the q243 " +
        "bound 16 may be at risk; re-measure and re-pin")
  }

  test("colorDecodeErrors kernel through Spark equals the spec-local " +
      "computation; color planted pairs stay pixel-hash-blind") {
    import spark.implicits._
    val ids = (0L until 120L).toDF("doc_id").repartition(7)
    val got = Multimodal.colorDecodeErrors(
        Multimodal.syntheticColorJpegs(ids, "doc_id"))
      .collect().map(d => d.media_id -> ((d.width, d.height, d.max_abs_err)))
      .toMap
    assert(got.size == 120)
    (0L until 120L).foreach { id =>
      val ref = colorRaster(id)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeColorJpeg(id)))
      val e = (for {
        y <- 0 until ref.getHeight; x <- 0 until ref.getWidth
        c <- 0 until 3
      } yield math.abs(((dec.getRGB(x, y) >> (8 * c)) & 0xff) -
          ((ref.getRGB(x, y) >> (8 * c)) & 0xff)).toLong).max
      assert(got(id) == ((ref.getWidth.toLong, ref.getHeight.toLong, e)),
        s"color kernel diverges from the spec computation at id=$id")
    }
    // the color lossy pairs are exact-pixel-hash BLIND (the q243 gap)
    val media = Multimodal.syntheticColorLossyDups(
      (0L until 80L).toDF("doc_id").repartition(4), "doc_id")
    val px = Multimodal.pixelHashes(media)
      .collect().map(p => p.media_id -> p.pixel_md5).toMap
    (0L until 40L).foreach { g =>
      assert(px(2 * g) != px(2 * g + 1),
        s"color JPEG decode reproduced the raster exactly at gen=$g")
    }
  }

  test("decodeErrors kernel through Spark equals the spec-local error " +
      "computation") {
    import spark.implicits._
    val ids = (0L until 160L).toDF("doc_id").repartition(7)
    val got = Multimodal.decodeErrors(
        Multimodal.syntheticJpegs(ids, "doc_id"))
      .collect().map(d => d.media_id -> ((d.width, d.height, d.max_abs_err)))
      .toMap
    assert(got.size == 160)
    (0L until 160L).foreach { id =>
      val ref = raster(id)
      assert(got(id) == ((ref.getWidth.toLong, ref.getHeight.toLong, maxErr(id))),
        s"kernel error diverges from the spec computation at id=$id")
    }
  }

  /** Spec-local dHash (the DHashSpec discipline: never the kernel
    * under test): 9×8 nearest-neighbor grid, gray = r+g+b, strict
    * gradient compare. */
  private def dhashOf(img: java.awt.image.BufferedImage): (Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    def gray(gx: Int, gy: Int): Int = {
      val p = img.getRGB(gx * w / 9, gy * h / 8)
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    var hi = 0L; var lo = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      if (gray(gx, gy) > gray(gx + 1, gy)) {
        val idx = gy * 8 + gx
        if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
      }
    (hi, lo)
  }

  test("planted lossy pairs: dHash Hamming within the measured bound; " +
      "exact-pixel hashes pair NOTHING (lossy blindness)") {
    import spark.implicits._
    val n = 240L
    val ids = (0L until n).toDF("doc_id").repartition(6)
    val media = Multimodal.syntheticLossyDups(ids, "doc_id")
    val hashes = Multimodal.dHashes(media)
      .collect().map(d => d.media_id -> ((d.hash_hi, d.hash_lo))).toMap
    val hams = (0L until n / 2).map { g =>
      val (h1, l1) = hashes(2 * g); val (h2, l2) = hashes(2 * g + 1)
      java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    }
    assert(hams.max <= 10,
      s"planted-pair Hamming moved: ${hams.max} > 10 — the q236 bound " +
        "16 may be at risk; re-measure and re-pin")
    assert(hams.count(_ == 0) > (n / 8).toInt,
      "many planted pairs should fingerprint identically despite the " +
        "lossy roundtrip")
    // exact-pixel dedup is BLIND to the lossy arm: no (2k, 2k+1) pair
    // shares a pixel hash (this is the gap q236 exists to close)
    val px = Multimodal.pixelHashes(media)
      .collect().map(p => p.media_id -> p.pixel_md5).toMap
    (0L until n / 2).foreach { g =>
      assert(px(2 * g) != px(2 * g + 1),
        s"JPEG decode reproduced the raster exactly at gen=$g — the " +
          "fixture no longer exercises the lossy class")
    }
  }

  test("banded dhashNearDups on the lossy arm == brute all-pairs at the " +
      "threshold (pigeonhole exactness holds for codec-noised hashes)") {
    import spark.implicits._
    val n = 200L
    val ids = (0L until n).toDF("doc_id").repartition(5)
    val hashes = Multimodal.dHashes(
      Multimodal.syntheticLossyDups(ids, "doc_id")).toDF()
    val all = hashes.collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("hash_hi"), r.getAs[Long]("hash_lo")))).toMap
    val got = Multimodal.dhashNearDups(hashes, maxHamming = 7)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    val want = (for {
      a <- 0L until n; b <- (a + 1) until n
      d = java.lang.Long.bitCount(all(a)._1 ^ all(b)._1) +
        java.lang.Long.bitCount(all(a)._2 ^ all(b)._2) if d <= 7
    } yield (a, b) -> d.toLong).toMap
    assert(got == want,
      "band-bucket candidates + integer verify must equal brute " +
        "all-pairs at the threshold on the lossy fixture")
    // the pairs the banded device catches at <= 7 include the bulk of
    // the planted lossy dups (the tail past 7 is the measured 0.3%)
    val caught = (0L until n / 2).count(g => got.contains((2 * g, 2 * g + 1)))
    assert(caught >= (n / 2 * 9 / 10).toInt,
      s"banded device caught only $caught of ${n / 2} planted lossy pairs")
  }
}
