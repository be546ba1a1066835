package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the baseline grayscale JPEG codec: exact round-trip for the
  * constant-block construction the `jpeg_pixel_stats` oracle relies on,
  * lossy-bounded round-trip for arbitrary images, and independent
  * cross-checks in BOTH directions against the JDK's ImageIO codec
  * (our encoder → their decoder, their encoder → our decoder) so the
  * bitstream is validated against a third-party implementation, not
  * just itself. */
class JpegCodecSpec extends AnyFunSuite {

  private def decodeOrFail(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    val r = JpegCodec.decodeGray(b)
    assert(r.isDefined, "decode failed")
    r.get
  }

  test("constant-block images round-trip EXACTLY (the oracle contract)") {
    for (id <- Seq(0L, 1L, 7L, 42L, 499L, 123456L)) {
      val w = 8 * (1 + (id % 4)).toInt
      val h = 8 * (1 + ((id * 3) % 4)).toInt
      def pix(i: Int): Int = {
        val bx = (i % w) / 8; val by = (i / w) / 8
        ((id * 37 + bx * 17L + by * 29L) % 256).toInt
      }
      val (dw, dh, px) = decodeOrFail(JpegCodec.encodeGray(w, h, pix))
      assert(dw == w && dh == h)
      for (i <- 0 until w * h)
        assert((px(i) & 0xFF) == pix(i), s"id=$id pixel $i")
    }
  }

  test("extreme constant values (DC diff spans all size categories)") {
    // blocks at 0 and 255 produce DC diffs of ±255 — category 8 — and
    // the first block's DC itself exercises the full signed range
    val w = 32; val h = 8
    def pix(i: Int): Int = if ((i % w) / 8 % 2 == 0) 0 else 255
    val (_, _, px) = decodeOrFail(JpegCodec.encodeGray(w, h, pix))
    for (i <- 0 until w * h) assert((px(i) & 0xFF) == pix(i))
  }

  test("arbitrary images round-trip within the quantization loss bound") {
    val r = new scala.util.Random(0xBEEF)
    for (_ <- 1 to 3) {
      val w = 24 + r.nextInt(40)
      val h = 24 + r.nextInt(40)
      val src = Array.fill(w * h)(r.nextInt(256))
      // smooth the noise so quantization loss stays moderate: average
      // over a 3-wide neighborhood (pure noise is the worst case for
      // the coarse Annex K table)
      val smooth = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        def at(dx: Int, dy: Int) =
          src(math.min(h - 1, math.max(0, y + dy)) * w +
            math.min(w - 1, math.max(0, x + dx)))
        (at(-1, 0) + 2 * at(0, 0) + at(1, 0) + at(0, -1) + at(0, 1)) / 6
      }
      val (dw, dh, px) = decodeOrFail(JpegCodec.encodeGray(w, h, smooth))
      assert(dw == w && dh == h)
      val errs = (0 until w * h).map(i => math.abs((px(i) & 0xFF) - smooth(i)))
      assert(errs.max <= 96, s"max err ${errs.max}") // lossy but sane
      assert(errs.sum.toDouble / errs.size <= 16.0,
        s"mean err ${errs.sum.toDouble / errs.size}")
    }
  }

  test("non-multiple-of-8 dims: edge blocks encode padded, decode cropped") {
    val w = 13; val h = 21
    def pix(i: Int): Int = {
      val bx = (i % w) / 8; val by = (i / w) / 8
      (40 + bx * 90 + by * 35) % 256
    }
    val (dw, dh, px) = decodeOrFail(JpegCodec.encodeGray(w, h, pix))
    assert(dw == w && dh == h && px.length == w * h)
    // edge-replicated padding keeps edge blocks constant too → exact
    for (i <- 0 until w * h) assert((px(i) & 0xFF) == pix(i), s"pixel $i")
  }

  test("rejection contract: truncated, non-JPEG, progressive-marked") {
    assert(JpegCodec.decodeGray(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decodeGray("not a jpeg".getBytes).isEmpty)
    val ok = JpegCodec.encodeGray(8, 8, _ => 128)
    assert(JpegCodec.decodeGray(ok.take(ok.length / 2)).isEmpty)
    // flip SOF0 to SOF2 (progressive): must refuse, not mis-decode
    val prog = ok.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(JpegCodec.decodeGray(prog).isEmpty)
  }

  test("cross-check: our encoder's bytes decode identically in ImageIO") {
    val id = 97L
    val w = 24; val h = 32
    def pix(i: Int): Int = {
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((id * 37 + bx * 17L + by * 29L) % 256).toInt
    }
    val bytes = JpegCodec.encodeGray(w, h, pix)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assume(img != null, "JDK ImageIO JPEG reader unavailable")
    assert(img.getWidth == w && img.getHeight == h)
    val (_, _, ours) = decodeOrFail(bytes)
    val raster = img.getRaster
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = raster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(theirs - (ours(y * w + x) & 0xFF)))
    }
    // T.81 Annex A allows small IDCT implementation variance; constant
    // blocks should agree exactly, allow 1 for safety
    assert(maxDiff <= 1, s"max ImageIO disagreement $maxDiff")
  }

  test("cross-check: ImageIO-encoded JPEGs decode in our decoder") {
    val w = 40; val h = 28
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = new scala.util.Random(0xF00D)
    val src = Array.tabulate(w * h)(i =>
      (96 + 64 * math.sin(i * 0.05) + r.nextInt(8)).toInt)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, src(y * w + x))
    val out = new java.io.ByteArrayOutputStream()
    val wrote = javax.imageio.ImageIO.write(img, "jpeg", out)
    assume(wrote, "JDK ImageIO JPEG writer unavailable")
    val decoded = JpegCodec.decodeGray(out.toByteArray)
    assert(decoded.isDefined,
      "our decoder must accept a third-party baseline grayscale stream")
    val (dw, dh, px) = decoded.get
    assert(dw == w && dh == h)
    // both decoders see the same lossy stream: compare against ImageIO's
    // own re-decode, where only IDCT rounding can differ
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(back.getRaster.getSample(x, y, 0) - (px(y * w + x) & 0xFF)))
    assert(maxDiff <= 2, s"max cross-decoder disagreement $maxDiff")
  }

  test("restart markers: DRI stream round-trips exactly, incl. RSTn cycling") {
    // 40x24 constant-block image = 15 MCUs; interval 2 emits 7 RSTn
    // markers (RST0..RST6 — cycling not yet wrapped; use a longer image
    // below for the modulo-8 wrap), with DC predictors reset at each
    for ((w, h, interval) <- Seq((40, 24, 2), (32, 80, 1), (64, 32, 3))) {
      def pix(i: Int): Int = {
        val bx = (i % w) / 8; val by = (i / w) / 8
        (31 + bx * 53 + by * 11) % 256
      }
      val bytes = JpegCodec.encodeGray(w, h, pix, restartInterval = interval)
      val decoded = JpegCodec.decodeGray(bytes)
      assert(decoded.isDefined, s"DRI=$interval decode failed")
      val (dw, dh, px) = decoded.get
      assert(dw == w && dh == h)
      for (i <- 0 until w * h)
        assert((px(i) & 0xFF) == pix(i), s"DRI=$interval pixel $i")
      // (32,80,1): 40 MCUs at interval 1 → 39 RSTn markers, wrapping
      // the RST0..RST7 cycle four times
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img != null) { // third-party agreement on the DRI stream too
        var maxDiff = 0
        for (y <- 0 until h; x <- 0 until w)
          maxDiff = math.max(maxDiff, math.abs(
            img.getRaster.getSample(x, y, 0) - (px(y * w + x) & 0xFF)))
        assert(maxDiff <= 1, s"DRI=$interval ImageIO disagreement $maxDiff")
      }
    }
  }
}
