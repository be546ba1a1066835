package graft.multimodal

/** Pure-JVM baseline JPEG codec for 8-bit grayscale (single component,
  * sequential DCT — ITU-T T.81 baseline process). Completes the
  * real-codec tier: PNG (inflate + defilter), GIF (variable-width LZW),
  * WAV (PCM16) landed in round 9; JPEG was header-parse only until now.
  *
  * Encoder ([[encodeGray]]): level shift, 8×8 forward DCT, quantization
  * (Annex K luminance table, DC entry lowered to 8 — see the exactness
  * note), zigzag, DC-difference + AC run-length Huffman coding with the
  * Annex K.3 luminance tables, byte stuffing. Decoder ([[decodeGray]]):
  * full marker walk (APPn/COM skipped, DRI honored), DQT/DHT/SOF0/SOS
  * parse with arbitrary tables, canonical-Huffman entropy decode with
  * 0xFF00 unstuffing and RSTn predictor resets, dequantize, dezigzag,
  * IDCT, level shift + clamp, edge-block crop — so it decodes third-
  * party baseline grayscale JPEGs (JpegCodecSpec cross-checks both
  * directions against the JDK's ImageIO codec), not just its own.
  *
  * Exactness note for the gate: JPEG is lossy, so the formula oracle
  * (`jpeg_pixel_stats`) builds images that are CONSTANT per 8×8 block.
  * A constant block has one nonzero coefficient, DC = 8·(v−128); with
  * the DC quant entry at 8 it quantizes to exactly v−128 (integer),
  * dequantizes to 8·(v−128), and the IDCT of a DC-only block is the
  * constant F00/8 = v−128 — exact in IEEE double — so decode returns v
  * bit-exactly and DuckDB can recompute the decoded stats from the
  * generating formula. Every block still rides the full pipeline
  * (Huffman DC categories vary with the per-block diffs, EOB coding,
  * zigzag, both transforms); the ScalaTest spec covers the lossy
  * general case against ImageIO.
  *
  * Reference note: the reference pipeline has no media tier at all —
  * this extends the north-star multimodal contract (opaque binary
  * columns + per-partition decode) with the third container format.
  */
object JpegCodec {

  // Annex K.1 luminance quantization table (natural order), with the
  // DC entry lowered 16 → 8 so constant blocks round-trip exactly
  // (doc above). AC entries are the spec's — the general path is lossy.
  private val quantTable: Array[Int] = {
    val k1 = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    k1(0) = 8
    k1
  }

  /** Zigzag order: zigzag(i) = natural index of the i-th coefficient. */
  private val zigzag: Array[Int] = {
    val zz = new Array[Int](64)
    var i = 0
    var x = 0; var y = 0; var up = true
    while (i < 64) {
      zz(i) = y * 8 + x
      i += 1
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    zz
  }

  // Annex K.3.1 luminance Huffman specs: (bits-per-length counts, values).
  private val dcBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val acVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Canonical Huffman codes from a (bits, values) spec: code and
    * length per symbol value (T.81 C.2). */
  private def buildCodes(bits: Array[Int],
      vals: Array[Int]): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val lens = new Array[Int](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var n = bits(len)
      while (n > 0) {
        codes(vals(k)) = code
        lens(vals(k)) = len
        code += 1; k += 1; n -= 1
      }
      code <<= 1
    }
    (codes, lens)
  }

  private lazy val (dcCodes, dcLens) = buildCodes(dcBits, dcVals)
  private lazy val (acCodes, acLens) = buildCodes(acBits, acVals)

  private val cosTab: Array[Double] =
    Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16.0)).flatten

  private class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1-bits (T.81 F.1.2.3)
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc & 0xFF)
      if ((acc & 0xFF) == 0xFF) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** Magnitude category (number of bits) of a coefficient value. */
  private def category(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode an 8-bit grayscale image as a baseline sequential JPEG.
    * Any dims ≥1; edge blocks are replicated-padded (the decoder crops).
    * `restartInterval` > 0 emits a DRI segment and RSTn markers every
    * that many MCUs (with DC predictor resets), exercising the
    * decoder's restart path with spec-conformant streams. */
  def encodeGray(width: Int, height: Int, pixel: Int => Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      s"bad dims ${width}x$height")
    require(restartInterval >= 0 && restartInterval <= 0xFFFF,
      s"bad restart interval $restartInterval")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8) // SOI
    seg(0xDB, 0 +: (0 until 64).map(i => quantTable(zigzag(i))).toArray)
    seg(0xC0, Array(8, height >> 8, height & 0xFF, width >> 8,
      width & 0xFF, 1, 1, 0x11, 0)) // SOF0: 1 component, 1x1, qtable 0
    seg(0xC4, 0x00 +: (dcBits.drop(1) ++ dcVals))
    seg(0xC4, 0x10 +: (acBits.drop(1) ++ acVals))
    if (restartInterval > 0)
      seg(0xDD, Array(restartInterval >> 8, restartInterval & 0xFF)) // DRI
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    var bw = new BitWriter(out)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var prevDc = 0
    var mcu = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xD0 + ((mcu / restartInterval - 1) % 8)) // RSTn, cyclic
        prevDc = 0
        bw = new BitWriter(out)
      }
      mcu += 1
      // level-shifted source block, edge pixels replicated
      for (y <- 0 until 8; x <- 0 until 8) {
        val sx = math.min(bx * 8 + x, width - 1)
        val sy = math.min(by * 8 + y, height - 1)
        block(y * 8 + x) = (pixel(sy * width + sx) & 0xFF) - 128.0
      }
      // forward DCT (T.81 A.3.3), then quantize in zigzag order
      for (u <- 0 until 8; v <- 0 until 8) {
        var s = 0.0
        for (y <- 0 until 8; x <- 0 until 8)
          s += block(y * 8 + x) * cosTab(x * 8 + u) * cosTab(y * 8 + v)
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        val f = 0.25 * cu * cv * s
        coef(v * 8 + u) = math.round(f / quantTable(v * 8 + u)).toInt
      }
      // DC difference
      val dc = coef(0)
      val diff = dc - prevDc
      prevDc = dc
      val cat = category(diff)
      bw.write(dcCodes(cat), dcLens(cat))
      if (cat > 0) {
        val bitsVal = if (diff >= 0) diff else diff + (1 << cat) - 1
        bw.write(bitsVal, cat)
      }
      // AC run-length coding over the zigzag sequence
      var run = 0
      for (k <- 1 until 64) {
        val v = coef(zigzag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { bw.write(acCodes(0xF0), acLens(0xF0)); run -= 16 }
          val c = category(v)
          val sym = (run << 4) | c
          bw.write(acCodes(sym), acLens(sym))
          val bitsVal = if (v >= 0) v else v + (1 << c) - 1
          bw.write(bitsVal, c)
          run = 0
        }
      }
      if (run > 0) bw.write(acCodes(0x00), acLens(0x00)) // EOB
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Decoder
  // -------------------------------------------------------------------

  /** Canonical-Huffman decode table: mincode/maxcode/valptr per length
    * (T.81 F.2.2.3). */
  private class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len); k += bits(len)
        maxCode(len) = if (bits(len) > 0) code - 1 else -1
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var len = 1
      var code = br.nextBit()
      while (len <= 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.nextBit()
        len += 1
      }
      if (len > 16) throw new JpegFormat("huffman code overrun")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private class JpegFormat(msg: String) extends Exception(msg)

  /** Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    * non-stuffing marker (the caller inspects it for RSTn/EOI). */
  private class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var atMarker: Int = -1
    def nextBit(): Int = {
      if (nbits == 0) {
        if (atMarker >= 0) throw new JpegFormat("read past marker")
        if (pos >= b.length) throw new JpegFormat("truncated entropy data")
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          val next = if (pos < b.length) b(pos) & 0xFF else -1
          if (next == 0x00) pos += 1 // stuffed 0xFF data byte
          else {
            // a real marker mid-scan: fail NOW rather than serving 8
            // fabricated zero bits — phantom coefficients in the final
            // MCU would otherwise decode as Some(garbage) instead of
            // None on a truncated entropy segment. restart() keeps its
            // own lenient scan-to-marker path (the only place a marker
            // is legitimate).
            atMarker = next; pos += 1
            throw new JpegFormat("marker inside entropy segment")
          }
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Align to a byte boundary and consume an expected RSTn marker,
      * skipping the pad bits (possibly a stuffed 0xFF00 pad byte) and
      * any 0xFF fill bytes before it. */
    def restart(): Unit = {
      nbits = 0
      if (atMarker < 0) {
        // scan past pad/stuffed bytes to the next real marker
        var found = false
        while (!found) {
          if (pos + 1 >= b.length)
            throw new JpegFormat("expected restart marker")
          if ((b(pos) & 0xFF) != 0xFF) pos += 1 // pad byte
          else if ((b(pos + 1) & 0xFF) == 0x00) pos += 2 // stuffed pad
          else if ((b(pos + 1) & 0xFF) == 0xFF) pos += 1 // fill byte
          else {
            atMarker = b(pos + 1) & 0xFF
            pos += 2
            found = true
          }
        }
      }
      if (atMarker < 0xD0 || atMarker > 0xD7)
        throw new JpegFormat(s"expected RSTn, got ${atMarker.toHexString}")
      atMarker = -1
    }
  }

  /** Extend a received magnitude-category value to its signed
    * coefficient (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  /** Decode a baseline sequential grayscale JPEG (single component,
    * 8-bit; arbitrary quant/Huffman tables, APPn/COM skipped, DRI/RSTn
    * honored) to (width, height, row-major pixels). None for any other
    * JPEG flavor or non-JPEG payload. */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decodeGrayImpl(b)
    catch {
      case _: JpegFormat => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def decodeGrayImpl(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return None
    def u8(i: Int) = b(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    val quant = Array.fill(4)(null: Array[Int])
    val dcTabs = Array.fill(4)(null: HuffTable)
    val acTabs = Array.fill(4)(null: HuffTable)
    var width = 0; var height = 0
    var compQuant = 0; var compDcTab = 0; var compAcTab = 0
    var restartInterval = 0
    var i = 2
    while (i + 3 < b.length) {
      if (u8(i) != 0xFF) return None
      val m = u8(i + 1)
      if (m == 0xFF) { i += 1 }
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 }
      else if (m == 0xD9) return None // EOI before SOS
      else {
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val body = i + 4
        m match {
          case 0xDB => // DQT: possibly several tables per segment
            var p = body
            while (p < i + 2 + len) {
              val pq = u8(p) >> 4; val tq = u8(p) & 0x0F
              if (tq > 3) return None
              val tab = new Array[Int](64)
              if (pq == 0) {
                for (k <- 0 until 64) tab(zigzag(k)) = u8(p + 1 + k)
                p += 65
              } else {
                for (k <- 0 until 64) tab(zigzag(k)) = be16(p + 1 + 2 * k)
                p += 129
              }
              quant(tq) = tab
            }
          case 0xC4 => // DHT: possibly several tables per segment
            var p = body
            while (p < i + 2 + len) {
              val tc = u8(p) >> 4; val th = u8(p) & 0x0F
              if (th > 3) return None
              val bits = new Array[Int](17)
              var total = 0
              for (l <- 1 to 16) { bits(l) = u8(p + l); total += bits(l) }
              val vals = Array.tabulate(total)(k => u8(p + 17 + k))
              val tab = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xC0 => // SOF0 (baseline only; other SOFn → unsupported)
            if (u8(body) != 8) return None // precision
            height = be16(body + 1); width = be16(body + 3)
            if (u8(body + 5) != 1) return None // grayscale only
            if ((u8(body + 7) >> 4) != 1 || (u8(body + 7) & 0x0F) != 1)
              return None // 1x1 sampling
            compQuant = u8(body + 8)
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
              0xCB | 0xCD | 0xCE | 0xCF =>
            return None // non-baseline frame
          case 0xDD => restartInterval = be16(body)
          case 0xDA => // SOS: entropy data follows
            if (u8(body) != 1) return None
            compDcTab = u8(body + 2) >> 4
            compAcTab = u8(body + 2) & 0x0F
            if (width <= 0 || height <= 0) return None
            val q = quant(compQuant)
            val dcT = dcTabs(compDcTab)
            val acT = acTabs(compAcTab)
            if (q == null || dcT == null || acT == null) return None
            return Some(decodeScan(b, i + 2 + len, width, height, q, dcT,
              acT, restartInterval))
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], start: Int, width: Int,
      height: Int, q: Array[Int], dcT: HuffTable, acT: HuffTable,
      restartInterval: Int): (Int, Int, Array[Byte]) = {
    val br = new BitReader(b, start)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val px = new Array[Byte](width * height)
    val coef = new Array[Int](64)
    val out = new Array[Double](64)
    var prevDc = 0
    var mcu = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        prevDc = 0
      }
      java.util.Arrays.fill(coef, 0)
      val cat = dcT.decode(br)
      prevDc += extend(br.receive(cat), cat)
      coef(0) = prevDc * q(0)
      var k = 1
      while (k < 64) {
        val rs = acT.decode(br)
        val run = rs >> 4; val size = rs & 0x0F
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          if (k > 63) throw new JpegFormat("AC index overrun")
          coef(zigzag(k)) = extend(br.receive(size), size) * q(zigzag(k))
          k += 1
        }
      }
      // IDCT (T.81 A.3.3 inverse)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += cu * cv * coef(v * 8 + u) * cosTab(x * 8 + u) * cosTab(y * 8 + v)
        }
        out(y * 8 + x) = 0.25 * s
      }
      for (y <- 0 until 8; x <- 0 until 8) {
        val sx = bx * 8 + x; val sy = by * 8 + y
        if (sx < width && sy < height) {
          val v = math.round(out(y * 8 + x) + 128.0).toInt
          px(sy * width + sx) = math.max(0, math.min(255, v)).toByte
        }
      }
      mcu += 1
    }
    (width, height, px)
  }
}
