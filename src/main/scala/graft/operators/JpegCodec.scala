package graft.operators

/** Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1) codec, pure JVM.
  *
  * Decoder: SOI → tables (DQT/DHT) → SOF0 → SOS, Huffman-decoded entropy
  * segment with RSTn restart handling, dequantization in zig-zag order,
  * separable float IDCT, per-component nearest-neighbor upsampling from
  * the declared sampling factors (4:4:4, 4:2:2, 4:2:0, …), CCIR 601
  * YCbCr→RGB. Refuses — returns None, never guesses — anything outside
  * baseline: progressive (SOF2), arithmetic coding, 12-bit precision,
  * lossless, unknown component counts, truncated entropy data.
  *
  * Encoder ([[encodeBlockMean]]): a REAL spec-valid baseline JPEG whose
  * every 8×8 block carries only a DC coefficient (the block mean) — the
  * honest "thumbnail quality" point of the format. With the DC quantizer
  * pinned to 8, a constant block round-trips EXACTLY (FDCT DC of a flat
  * level-shifted block is 8·(v−128); dequantize → IDCT = flat v), which
  * is what lets MediaSpec pin the decoder against hand-computed pixels
  * with no floating-point slop. Huffman tables are the T.81 Annex K
  * typical tables.
  *
  * Companion to the BMP/PNG/GIF/WAV decoders in [[Multimodal]] — and,
  * sliced per-frame out of an MP4 via [[Mp4Codec.sampleRanges]], the
  * pixel decoder for Motion-JPEG video
  * ([[Multimodal.decodeMjpegFrames]]). With that, only inter-frame
  * entropy codecs (H.264/H.265) remain out of scope.
  */
object JpegCodec {

  // scan position → natural (row-major) coefficient index
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Huffman ----

  /** Canonical Huffman table from a DHT segment: counts(1..16) + symbols.
    * Decoding walks code lengths with running min/max codes (T.81 F.16). */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def symbol(at: Int): Int = symbols(at)
  }

  /** Entropy-coded-segment bit reader: 0xFF00 unstuffing, stops at any
    * other marker (leaves `markerHit` set). */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    var acc = 0
    var nbits = 0
    var markerHit = false
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) { markerHit = true; return -1 }
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) { markerHit = true; return -1 }
          val b2 = data(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed 0xFF data byte
          else { markerHit = true; return -1 }
          b = 0xff
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def decode(h: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        // code >= minCode guards the symbol index against corrupt
        // entropy data / sparse tables — never index below valPtr
        if (h.maxCode(l) >= 0 && code >= h.minCode(l) && code <= h.maxCode(l))
          return h.symbol(h.valPtr(l) + code - h.minCode(l))
        l += 1
      }
      -1
    }
    /** Byte-align and consume an expected RSTn marker (T.81 E.2.4). */
    def consumeRst(): Boolean = {
      nbits = 0
      markerHit = false
      // the reader stops BEFORE the 0xFF of the marker
      if (pos + 1 >= data.length) return false
      if ((data(pos) & 0xff) != 0xff) return false
      val m = data(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  /** T.81 F.12: sign-extend a magnitude-category value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  // ---- IDCT (separable, double) ----

  private val idctCos: Array[Double] = {
    val c = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        c(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    c
  }

  private def idct8x8(coef: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each y,x: tmp(y,x) = 1/2 Σu C(u) coef(y,u) cos((2x+1)uπ/16)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
          s += cu * coef(y * 8 + u) * idctCos(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // cols
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
          s += cv * tmp(v * 8 + x) * idctCos(yy * 8 + v)
          v += 1
        }
        out(yy * 8 + x) = s / 2.0
        yy += 1
      }
      x += 1
    }
  }

  private def clamp255(v: Double): Int = {
    val r = math.round(v).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }

  // ---- decoder ----

  private final case class Comp(id: Int, hSamp: Int, vSamp: Int, tq: Int,
      var dcTbl: Int = 0, var acTbl: Int = 0)

  /** Baseline JPEG → (w, h, flat top-down RGB). */
  def decodeRgb(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    def u8(o: Int) = payload(o) & 0xff
    def u16(o: Int) = (u8(o) << 8) | u8(o + 1)
    val qt = Array.ofDim[Int](4, 64) // zig-zag order, as stored
    val qtSeen = new Array[Boolean](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var w = 0
    var h = 0
    var comps: Array[Comp] = null
    var restartInterval = 0
    var off = 2
    while (off + 4 <= payload.length) {
      if (u8(off) != 0xff) return None
      val marker = u8(off + 1)
      if (marker == 0xd8) { off += 2 } // stray SOI
      else if (marker == 0xd9) return None // EOI before scan
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        // TEM / stray RSTn: standalone 2-byte markers, no length field —
        // skip them rather than misread the next bytes as a length
        off += 2
      } else if (marker == 0xff) {
        off += 1 // 0xFF fill byte before a marker (T.81 B.1.1.2)
      } else {
        val len = u16(off + 2)
        if (len < 2 || off + 2 + len > payload.length) return None
        val seg = off + 4
        val segEnd = off + 2 + len
        marker match {
          case 0xdb => // DQT — possibly several tables per segment
            var p = seg
            while (p < segEnd) {
              if (p + 65 > segEnd) return None // truncated table body
              val pq = u8(p) >> 4
              val tq = u8(p) & 15
              if (pq != 0 || tq > 3) return None // 16-bit tables: refuse
              var i = 0
              while (i < 64) { qt(tq)(i) = u8(p + 1 + i); i += 1 }
              qtSeen(tq) = true
              p += 65
            }
          case 0xc4 => // DHT — possibly several tables per segment
            var p = seg
            while (p < segEnd) {
              if (p + 17 > segEnd) return None // truncated count list
              val tc = u8(p) >> 4
              val th = u8(p) & 15
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(i => u8(p + 1 + i))
              val total = counts.sum
              if (total > 256 || p + 17 + total > segEnd) return None
              val symbols = Array.tabulate(total)(i => u8(p + 17 + i))
              val tbl = new Huff(counts, symbols)
              if (tc == 0) dcH(th) = tbl else acH(th) = tbl
              p += 17 + total
            }
          case 0xc0 | 0xc1 => // SOF0/1: baseline (extended seq. huffman ok)
            if (len < 8) return None // header up to component count
            if (u8(seg) != 8) return None // 12-bit: refuse
            h = u16(seg + 1)
            w = u16(seg + 3)
            val nc = u8(seg + 5)
            if (nc != 1 && nc != 3) return None
            if (len < 8 + 3 * nc) return None // truncated component list
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
            comps = Array.tabulate(nc) { i =>
              val b = seg + 6 + i * 3
              Comp(u8(b), u8(b + 1) >> 4, u8(b + 1) & 15, u8(b + 2))
            }
            if (comps.exists(c => c.hSamp < 1 || c.hSamp > 4 ||
              c.vSamp < 1 || c.vSamp > 4 || c.tq > 3)) return None
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / lossless: refuse
          case 0xdd => // DRI
            if (len < 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS — entropy data follows
            if (comps == null || len < 3) return None
            val ns = u8(seg)
            if (ns != comps.length) return None
            if (len < 6 + 2 * ns) return None // comp selectors + Ss/Se/AhAl
            var p = seg + 1
            var i = 0
            while (i < ns) {
              val cid = u8(p)
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.dcTbl = u8(p + 1) >> 4
              comp.acTbl = u8(p + 1) & 15
              // the 4-bit selectors index the 4-entry table arrays: a
              // forged 4-15 would crash decodeScan, not refuse
              if (comp.dcTbl > 3 || comp.acTbl > 3) return None
              p += 2
              i += 1
            }
            // Ss/Se/Ah/Al must be the baseline full-scan values
            if (u8(p) != 0 || u8(p + 1) != 63 || u8(p + 2) != 0) return None
            return decodeScan(payload, p + 3, w, h, comps, qt, qtSeen,
              dcH, acH, restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        off += 2 + len
      }
    }
    None
  }

  private def decodeScan(payload: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Comp], qt: Array[Array[Int]], qtSeen: Array[Boolean],
      dcH: Array[Huff], acH: Array[Huff],
      restartInterval: Int): Option[(Int, Int, Array[Byte])] = {
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val mcuW = hMax * 8
    val mcuH = vMax * 8
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component plane at its own resolution
    val planeW = comps.map(c => mcusX * c.hSamp * 8)
    val planeH = comps.map(c => mcusY * c.vSamp * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    comps.foreach { c =>
      if (!qtSeen(c.tq)) return None
      if (dcH(c.dcTbl) == null || acH(c.acTbl) == null) return None
    }
    val br = new BitReader(payload, start)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val px = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.consumeRst()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.vSamp) {
          var bx = 0
          while (bx < c.hSamp) {
            // one 8×8 block
            java.util.Arrays.fill(coef, 0.0)
            val tDc = br.decode(dcH(c.dcTbl))
            if (tDc < 0 || tDc > 15) return None
            val diffBits = if (tDc == 0) 0 else br.readBits(tDc)
            if (diffBits < 0) return None
            dcPred(ci) += extend(diffBits, tDc)
            coef(0) = dcPred(ci).toDouble * q(0)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = br.decode(acH(c.acTbl))
              if (rs < 0) return None
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else done = true // EOB
              } else {
                k += r
                if (k > 63) return None
                val bits = br.readBits(s)
                if (bits < 0) return None
                coef(zigzag(k)) = extend(bits, s).toDouble * q(k)
                k += 1
              }
            }
            idct8x8(coef, px)
            // place into the component plane (level shift +128)
            val baseX = (mx * c.hSamp + bx) * 8
            val baseY = (my * c.vSamp + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((baseY + yy) * planeW(ci) + baseX + xx) =
                  clamp255(px(yy * 8 + xx) + 128.0).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // upsample to full resolution + color convert
    val rgb = new Array[Byte](w * h * 3)
    val gray = comps.length == 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def sample(ci: Int): Int = {
          val c = comps(ci)
          val sx = x * c.hSamp / hMax
          val sy = y * c.vSamp / vMax
          planes(ci)(sy * planeW(ci) + sx) & 0xff
        }
        val d = (y * w + x) * 3
        if (gray) {
          val g = sample(0)
          rgb(d) = g.toByte; rgb(d + 1) = g.toByte; rgb(d + 2) = g.toByte
        } else {
          val yv = sample(0).toDouble
          val cb = sample(1).toDouble - 128.0
          val cr = sample(2).toDouble - 128.0
          rgb(d) = clamp255(yv + 1.402 * cr).toByte
          rgb(d + 1) = clamp255(yv - 0.344136 * cb - 0.714136 * cr).toByte
          rgb(d + 2) = clamp255(yv + 1.772 * cb).toByte
        }
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }

  // ---- block-mean encoder ----

  // T.81 Annex K.3 typical luminance DC table (counts + symbols) — also
  // used for chrominance DC here (legal: tables travel in the file)
  private val dcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcSymbols = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // a minimal legal AC table carrying only EOB (0x00, canonical code 0 at
  // length 1) and ZRL (0xF0, code 10 at length 2)
  private val acCounts = Array(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acSymbols = Array(0x00, 0xf0)

  private def dcCodes: Array[(Int, Int)] = { // symbol → (code, length)
    val out = new Array[(Int, Int)](12)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < dcCounts(l - 1)) {
        out(dcSymbols(k)) = (code, l)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0
          n = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = {
      while (n != 0) put(1, 1)
    }
  }

  /** Encode a flat top-down RGB image as a REAL baseline JPEG where each
    * 8×8 block carries only its mean (DC). DC quantizer 8 (so flat blocks
    * round-trip exactly), AC quantizers irrelevant (no AC codes). Edge
    * blocks replicate the image's last row/column (standard).
    * `subsample420` switches the layout to 2×2-sampled luma MCUs (4 Y
    * blocks + Cb + Cr per 16×16); `restartInterval` > 0 emits a DRI
    * segment and RSTn markers with DC-predictor resets — both exist so
    * the DECODER's subsampling/restart paths are exercised by a
    * conformant stream, not just 4:4:4 single-scan files. */
  def encodeBlockMean(w: Int, h: Int, rgb: Array[Byte],
      subsample420: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb ${rgb.length} != ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    // DQT: one table, qDC = 8, rest 16 (unused — no AC coefficients)
    out.write(0xff); out.write(0xdb); u16(2 + 65); out.write(0x00)
    out.write(8)
    var i = 0
    while (i < 63) { out.write(16); i += 1 }
    // SOF0: 3 components, all on quant table 0
    out.write(0xff); out.write(0xc0); u16(8 + 3 * 3)
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write(if (subsample420) 0x22 else 0x11); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    // DHT: DC table 0 + AC table 0
    val dcTotal = dcCounts.sum
    out.write(0xff); out.write(0xc4); u16(2 + 17 + dcTotal)
    out.write(0x00)
    dcCounts.foreach(out.write)
    dcSymbols.foreach(out.write)
    val acTotal = acCounts.sum
    out.write(0xff); out.write(0xc4); u16(2 + 17 + acTotal)
    out.write(0x10)
    acCounts.foreach(out.write)
    acSymbols.foreach(out.write)
    if (restartInterval > 0) {
      out.write(0xff); out.write(0xdd); u16(4); u16(restartInterval)
    }
    // SOS
    out.write(0xff); out.write(0xda); u16(6 + 2 * 3)
    out.write(3)
    var c = 1
    while (c <= 3) { out.write(c); out.write(0x00); c += 1 }
    out.write(0); out.write(63); out.write(0)
    val dc = dcCodes
    val eobCode = (0, 1) // canonical AC codes for [EOB, ZRL]
    val bw = new BitWriter(out)
    val pred = new Array[Int](3)
    /** mean YCbCr of the px-square with top-left (x0, y0), side `side`,
      * edge-replicated. */
    def meanYcc(x0: Int, y0: Int, side: Int): (Int, Int, Int) = {
      var sy = 0.0
      var scb = 0.0
      var scr = 0.0
      var yy = 0
      while (yy < side) {
        var xx = 0
        while (xx < side) {
          val px = math.min(x0 + xx, w - 1)
          val py = math.min(y0 + yy, h - 1)
          val d = (py * w + px) * 3
          val r = rgb(d) & 0xff
          val g = rgb(d + 1) & 0xff
          val b = rgb(d + 2) & 0xff
          sy += 0.299 * r + 0.587 * g + 0.114 * b
          scb += -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
          scr += 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
          xx += 1
        }
        yy += 1
      }
      val n = side.toDouble * side
      (clamp255(sy / n), clamp255(scb / n), clamp255(scr / n))
    }
    def putDc(comp: Int, value: Int): Unit = {
      // quantized DC = round(8·(mean−128) / qDC) = mean − 128 with qDC=8
      val coefv = value - 128
      val diff = coefv - pred(comp)
      pred(comp) = coefv
      var t = 0
      var m = math.abs(diff)
      while (m != 0) { t += 1; m >>= 1 }
      val (code, len) = dc(t)
      bw.put(code, len)
      if (t > 0) {
        val bits = if (diff >= 0) diff else diff + (1 << t) - 1
        bw.put(bits, t)
      }
      bw.put(eobCode._1, eobCode._2)
    }
    val mcuSide = if (subsample420) 16 else 8
    val mcusX = (w + mcuSide - 1) / mcuSide
    val mcusY = (h + mcuSide - 1) / mcuSide
    var rstIdx = 0
    var mcu = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flushWithOnes()
        out.write(0xff); out.write(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      if (subsample420) {
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            putDc(0, meanYcc(mx * 16 + bx * 8, my * 16 + by * 8, 8)._1)
            bx += 1
          }
          by += 1
        }
        val (_, cb, cr) = meanYcc(mx * 16, my * 16, 16)
        putDc(1, cb)
        putDc(2, cr)
      } else {
        val (yv, cb, cr) = meanYcc(mx * 8, my * 8, 8)
        putDc(0, yv)
        putDc(1, cb)
        putDc(2, cr)
      }
      mcu += 1
    }
    bw.flushWithOnes()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
