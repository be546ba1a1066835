package graft.multimodal

/** Pure-JVM animated-GIF codec — the video half of the multimodal tier.
  * [[MediaCodec]] parses the GIF logical screen descriptor (metadata
  * only); this closes the remaining "frame pixels are a stub" gap:
  * [[gifGray]] emits a spec-conformant multi-frame GIF89a (global
  * 256-entry grayscale color table, one image descriptor per frame,
  * REAL variable-width LZW compression per Appendix F — clear/EOI
  * codes, 9→12-bit width growth, dictionary reset at 4096) and
  * [[decodeFrames]] reverses it (sub-block reassembly, LSB-first code
  * stream, the KwKwK case, deferred-clear handling), so the
  * frame-sampling stage operates on REAL decoded pixels and a codec
  * regression breaks the `video_frame_stats` hash gate.
  *
  * Supported decode subset: global color table present, non-interlaced
  * frames, no local color tables. Anything else → None; callers keep
  * the metadata-only path (same contract as [[MediaCodec.decodeGray]]
  * and [[AudioCodec.decodeWavPcm16]]).
  *
  * A GIF "video" is the honest choice for this container: it is the
  * one multi-frame format whose full bit-level codec is implementable
  * without native libraries, so the Spark-side plumbing (payload
  * column → per-partition decode → every-k frame sample → per-frame
  * features) exercises a real decode kernel rather than a fake.
  */
object GifCodec {

  private val header89 = "GIF89a".getBytes("US-ASCII")
  private val header87 = "GIF87a".getBytes("US-ASCII")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def writeLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }

  // -------------------------------------------------------------------
  // LZW bit-stream plumbing. GIF packs codes LSB-first; the data stream
  // is chopped into length-prefixed sub-blocks of at most 255 bytes.
  // -------------------------------------------------------------------

  private final class BitWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0 // bit accumulator, LSB-first
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code << nBits
      nBits += width
      while (nBits >= 8) {
        bytes.write(acc & 0xFF)
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { bytes.write(acc & 0xFF); acc = 0; nBits = 0 }
      bytes.toByteArray
    }
  }

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nBits = 0
    /** -1 when the stream is exhausted mid-code (malformed input). */
    def read(width: Int): Int = {
      while (nBits < width) {
        if (pos >= b.length) return -1
        acc |= (b(pos) & 0xFFL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      v
    }
  }

  /** GIF-variant LZW compress of an 8-bit index stream (min code size
    * 8: clear=256, EOI=257, first dynamic code 258, width 9→12).
    * Width growth fires when the next free code no longer fits the
    * current width (`nextCode > 1<<width` after an add — the decoder's
    * lag-one add schedule makes its `nextCode >= 1<<width` rule fire
    * between the same two codes, keeping both sides in lockstep); at
    * 4096 the dictionary is cleared and rebuilt, the spec's reset
    * path, which a >4k-pixel frame exercises. */
  private[multimodal] def lzwCompress(indices: Array[Byte]): Array[Byte] = {
    val clear = 256; val eoi = 257
    val out = new BitWriter
    var width = 9
    var nextCode = 258
    // (prefixCode << 8 | byte) -> code; prefix < 4096 so the key fits 20 bits
    var dict = new java.util.HashMap[Integer, Integer]()
    out.write(clear, width)
    if (indices.isEmpty) { out.write(eoi, width); return out.finish() }
    var cur = indices(0) & 0xFF
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xFF
      val key = (cur << 8) | k
      val hit = dict.get(key)
      if (hit != null) cur = hit
      else {
        out.write(cur, width)
        if (nextCode < 4096) {
          dict.put(key, nextCode)
          nextCode += 1
          if (nextCode > (1 << width) && width < 12) width += 1
        } else {
          out.write(clear, width)
          dict = new java.util.HashMap[Integer, Integer]()
          width = 9
          nextCode = 258
        }
        cur = k
      }
      i += 1
    }
    out.write(cur, width)
    out.write(eoi, width)
    out.finish()
  }

  /** Inverse of [[lzwCompress]]: decode exactly `expected` indices;
    * None on a malformed stream (bad width sync, out-of-range code,
    * truncation, or an EOI before `expected` pixels). */
  private[multimodal] def lzwDecompress(data: Array[Byte],
      expected: Int): Option[Array[Byte]] = {
    val clear = 256; val eoi = 257
    val in = new BitReader(data)
    var width = 9
    var nextCode = 258
    // code -> (previous code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var n = 0
    val stack = new Array[Byte](4096)
    var prev = -1

    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Boolean = { // expand code to out; false on overflow
      var c = code
      var sp = 0
      while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      if (n + sp + 1 > expected) return false
      out(n) = c.toByte; n += 1
      while (sp > 0) { sp -= 1; out(n) = stack(sp); n += 1 }
      true
    }

    while (n < expected) {
      val code = in.read(width)
      if (code < 0 || code == eoi) return None // truncated early
      if (code == clear) { width = 9; nextCode = 258; prev = -1 }
      else if (prev < 0) { // first code after clear must be a root
        if (code > 255) return None
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > nextCode) return None // desynchronized
        val kwkwk = code == nextCode
        if (kwkwk) {
          // KwKwK: the code being defined right now — prev + first(prev)
          if (nextCode >= 4096) return None
          prefix(nextCode) = prev; suffix(nextCode) = firstByte(prev)
          nextCode += 1
          if (!emit(code)) return None
        } else {
          if (!emit(code)) return None
          if (nextCode < 4096) {
            prefix(nextCode) = prev; suffix(nextCode) = firstByte(code)
            nextCode += 1
          }
        }
        if (nextCode >= (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    // drain: the encoder's EOI (possibly after more data — reject that)
    val tail = in.read(width)
    if (tail != eoi && tail != clear && tail != -1) return None
    Some(out)
  }

  // -------------------------------------------------------------------
  // Container layer.
  // -------------------------------------------------------------------

  /** Spec-conformant multi-frame grayscale GIF89a. `pixel(f, i)` gives
    * frame f's row-major pixel i (masked to 0–255); the global color
    * table maps index g to rgb (g,g,g), so indices ARE gray values. */
  def gifGray(width: Int, height: Int, nFrames: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      s"bad dims ${width}x$height")
    require(nFrames > 0, s"bad frame count $nFrames")
    val out = new java.io.ByteArrayOutputStream()
    out.write(header89)
    writeLe16(out, width); writeLe16(out, height)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    for (g <- 0 until 256) { out.write(g); out.write(g); out.write(g) }
    for (f <- 0 until nFrames) {
      out.write(0x2C) // image descriptor
      writeLe16(out, 0); writeLe16(out, 0) // left, top
      writeLe16(out, width); writeLe16(out, height)
      out.write(0) // no local color table, not interlaced
      out.write(8) // LZW minimum code size
      val indices =
        Array.tabulate(width * height)(i => (pixel(f, i) & 0xFF).toByte)
      val lzw = lzwCompress(indices)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Decode every frame of a grayscale-GCT GIF to row-major gray bytes
    * (gray = the color table's red channel). None outside the
    * supported subset or on any malformed structure. */
  def decodeFrames(b: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] = {
    val is89 = b.length >= 13 && header89.indices.forall(i => b(i) == header89(i))
    val is87 = b.length >= 13 && header87.indices.forall(i => b(i) == header87(i))
    if (!is89 && !is87) return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    val packed = u8(b, 10)
    if ((packed & 0x80) == 0) return None // need a global color table
    val gctSize = 2 << (packed & 0x07)
    var i = 13
    if (i + gctSize * 3 > b.length) return None
    val gray = new Array[Byte](gctSize)
    for (g <- 0 until gctSize) gray(g) = b(i + g * 3) // red channel
    i += gctSize * 3
    val frames = Vector.newBuilder[Array[Byte]]
    while (i < b.length) {
      u8(b, i) match {
        case 0x3B => // trailer
          val fs = frames.result()
          return if (fs.nonEmpty) Some((w, h, fs)) else None
        case 0x21 => // extension: label byte then sub-blocks
          i += 2
          while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
          if (i >= b.length) return None
          i += 1
        case 0x2C => // image descriptor
          if (i + 10 > b.length) return None
          val iw = le16(b, i + 5); val ih = le16(b, i + 7)
          val ipacked = u8(b, i + 9)
          if ((ipacked & 0x80) != 0) return None // local color table
          if ((ipacked & 0x40) != 0) return None // interlaced
          if (iw != w || ih != h) return None // partial frames: out of scope
          i += 10
          if (i >= b.length) return None
          if (u8(b, i) != 8) return None // fixture min code size
          i += 1
          val lzw = new java.io.ByteArrayOutputStream()
          while (i < b.length && u8(b, i) != 0) {
            val n = u8(b, i)
            if (i + 1 + n > b.length) return None
            lzw.write(b, i + 1, n)
            i += 1 + n
          }
          if (i >= b.length) return None
          i += 1 // terminator
          lzwDecompress(lzw.toByteArray, iw * ih) match {
            case Some(ix) =>
              val px = new Array[Byte](ix.length)
              var j = 0
              while (j < ix.length) {
                val g = ix(j) & 0xFF
                if (g >= gctSize) return None
                px(j) = gray(g)
                j += 1
              }
              frames += px
            case None => return None
          }
        case _ => return None // unknown block introducer
      }
    }
    None // ran off the end without a trailer
  }
}
