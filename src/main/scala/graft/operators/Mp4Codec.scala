package graft.operators

/** Real ISO-BMFF (MP4) container parsing, pure JVM — the video analog of
  * the BMP/PNG/GIF/JPEG pixel and WAV sample decoders: walk the box tree
  * (ISO/IEC 14496-12 §4: 32-bit size + fourcc, size 1 → 64-bit
  * largesize, size 0 → to end-of-file), read the movie header (`mvhd`),
  * the first VIDEO track's headers (`tkhd`, `mdhd`, `hdlr`), and its
  * sample tables (`stsd` codec fourcc, `stts` decode deltas, `stsz`
  * sample sizes), and reduce them to container-level statistics and REAL
  * per-frame timestamps. Frame *pixel* decode (the H.264/H.265 entropy
  * bitstream inside `mdat`) stays out of scope — that is a codec, not a
  * container; everything a container parse can answer (frame count and
  * timing, sample-size distribution, duration, dimensions, codec id,
  * bitrate) is computed from the real bytes here.
  *
  * Refusal contract (same as every decoder in [[Multimodal]]): any
  * malformed input — truncated box, size overflowing the enclosing box,
  * entry counts exceeding the declared box body, missing `moov`/`mvhd`/
  * sample tables, unsupported version — returns None, never throws and
  * never fabricates. Sample-table entry counts are additionally capped
  * (2²⁰) so a hostile header cannot allocate unbounded executor memory:
  * payloads are per-row values decoded inside partition iterators.
  *
  * Reference behavior base: the reference pipeline treats payloads as
  * opaque binary columns; this parser is the Spark-side realization of
  * its decode stage for video rows (see SURVEY.md §2 multimodal rows).
  */
object Mp4Codec {

  /** Everything the feature/frame stages need from one container.
    * `sampleDeltas` keeps the stts run-length encoding (count, delta) —
    * frame timestamps expand lazily from it, never materialized per
    * frame inside the parser. */
  final case class Mp4Info(
      brand: String,
      mvhdTimescale: Long,
      mvhdDuration: Long,
      nTracks: Int,
      width: Int,
      height: Int,
      codec: String,
      timescale: Long,
      duration: Long,
      sampleDeltas: Array[(Long, Long)],
      sampleSizes: Array[Long],
      /** stsc runs (first_chunk, samples_per_chunk), 1-based chunks;
        * empty when the box is absent/malformed — frame timing and
        * container stats never need it, only byte-range expansion. */
      stscRuns: Array[(Long, Long)] = Array.empty,
      /** stco/co64 absolute file offsets; empty when absent/malformed. */
      chunkOffsets: Array[Long] = Array.empty)

  /** Hard cap on stts/stsz entry counts: refuse headers that would
    * allocate more (a 1M-frame sample table is ~8 MB — fine; a forged
    * 2³¹ count is not). */
  private val MaxEntries = 1 << 20

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def be16(b: Array[Byte], o: Int): Int = (u8(b, o) << 8) | u8(b, o + 1)
  private def be32(b: Array[Byte], o: Int): Long =
    (u8(b, o).toLong << 24) | (u8(b, o + 1) << 16) | (u8(b, o + 2) << 8) | u8(b, o + 3)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  /** One box in a child walk: (type, bodyStart, bodyEnd, boxEnd). */
  private final case class Box(tpe: String, start: Int, end: Int)

  /** Walk the direct children of [start, end). Returns None on any
    * malformed size — the caller refuses the whole payload. */
  private def children(b: Array[Byte], start: Int, end: Int): Option[List[Box]] = {
    val out = List.newBuilder[Box]
    var off = start
    while (off < end) {
      if (off + 8 > end) return None
      val sz32 = be32(b, off)
      val tpe = fourcc(b, off + 4)
      var body = off + 8
      val size: Long =
        if (sz32 == 0) (end - off).toLong // to end of enclosing box
        else if (sz32 == 1) {
          if (off + 16 > end) return None
          body = off + 16
          be64(b, off + 8)
        } else sz32
      if (size < (body - off) || off + size > end) return None
      out += Box(tpe, body, off + size.toInt)
      off += size.toInt
    }
    Some(out.result())
  }

  private def find(bs: List[Box], tpe: String): Option[Box] = bs.find(_.tpe == tpe)

  /** Parse a complete MP4. None = not a decodable ISO-BMFF container. */
  def parse(payload: Array[Byte]): Option[Mp4Info] = {
    if (payload.length < 16 || fourcc(payload, 4) != "ftyp") return None
    for {
      top <- children(payload, 0, payload.length)
      ftyp <- find(top, "ftyp")
      if ftyp.end - ftyp.start >= 8
      brand = fourcc(payload, ftyp.start)
      moov <- find(top, "moov")
      moovKids <- children(payload, moov.start, moov.end)
      mvhd <- find(moovKids, "mvhd")
      (mvTs, mvDur) <- fullBoxTsDur(payload, mvhd, tsOff = 12, durOff = 16, v1TsOff = 20, v1DurOff = 24)
      if mvTs > 0
      traks = moovKids.filter(_.tpe == "trak")
      video <- traks.iterator.flatMap(t => parseVideoTrak(payload, t)).nextOption()
    } yield video.copy(
      brand = brand,
      mvhdTimescale = mvTs,
      mvhdDuration = mvDur,
      nTracks = traks.length)
  }

  /** mvhd/mdhd share the version-dependent (timescale, duration) layout:
    * v0 = 32-bit creation/modification, v1 = 64-bit. Offsets are from
    * the box BODY start (version byte at +0). */
  private def fullBoxTsDur(b: Array[Byte], box: Box,
      tsOff: Int, durOff: Int, v1TsOff: Int, v1DurOff: Int): Option[(Long, Long)] = {
    if (box.end - box.start < 4) return None
    u8(b, box.start) match {
      case 0 if box.end - box.start >= durOff + 4 =>
        Some((be32(b, box.start + tsOff), be32(b, box.start + durOff)))
      case 1 if box.end - box.start >= v1DurOff + 8 =>
        Some((be32(b, box.start + v1TsOff), be64(b, box.start + v1DurOff)))
      case _ => None
    }
  }

  /** Parse one trak; Some only when its handler is `vide` and every
    * required sample table is well-formed. */
  private def parseVideoTrak(b: Array[Byte], trak: Box): Option[Mp4Info] =
    for {
      kids <- children(b, trak.start, trak.end)
      tkhd <- find(kids, "tkhd")
      (w, h) <- tkhdDims(b, tkhd)
      mdia <- find(kids, "mdia")
      mdiaKids <- children(b, mdia.start, mdia.end)
      hdlr <- find(mdiaKids, "hdlr")
      if hdlr.end - hdlr.start >= 12 && fourcc(b, hdlr.start + 8) == "vide"
      mdhd <- find(mdiaKids, "mdhd")
      (ts, dur) <- fullBoxTsDur(b, mdhd, tsOff = 12, durOff = 16, v1TsOff = 20, v1DurOff = 24)
      if ts > 0
      minf <- find(mdiaKids, "minf")
      minfKids <- children(b, minf.start, minf.end)
      stbl <- find(minfKids, "stbl")
      stblKids <- children(b, stbl.start, stbl.end)
      codec <- stsdCodec(b, stblKids)
      deltas <- sttsRuns(b, stblKids)
      sizes <- stszSizes(b, stblKids)
    } yield Mp4Info("", 0L, 0L, 0, w, h, codec, ts, dur, deltas, sizes,
      stscRuns(b, stblKids), chunkOffsetTable(b, stblKids))

  /** tkhd width/height: 16.16 fixed point at the end of the box (v0 body
    * 80 bytes, v1 body 92). */
  private def tkhdDims(b: Array[Byte], box: Box): Option[(Int, Int)] = {
    val len = box.end - box.start
    if (len < 4) return None
    val need = u8(b, box.start) match {
      case 0 => 84
      case 1 => 96
      case _ => return None
    }
    if (len < need) return None
    val wOff = box.start + need - 8
    Some(((be32(b, wOff) >> 16).toInt, (be32(b, wOff + 4) >> 16).toInt))
  }

  /** First stsd entry's sample-entry fourcc (the codec id: avc1, hvc1,
    * mp4v, …). */
  private def stsdCodec(b: Array[Byte], stblKids: List[Box]): Option[String] =
    find(stblKids, "stsd").flatMap { s =>
      // fullbox(4) + entry_count(4) + first entry header(8)
      if (s.end - s.start < 16 || be32(b, s.start + 4) < 1) None
      else Some(fourcc(b, s.start + 12))
    }

  /** stts decode-delta runs: (sample_count, sample_delta) pairs. */
  private def sttsRuns(b: Array[Byte], stblKids: List[Box]): Option[Array[(Long, Long)]] =
    find(stblKids, "stts").flatMap { s =>
      if (s.end - s.start < 8) None
      else {
        val n = be32(b, s.start + 4)
        if (n > MaxEntries || s.start + 8 + n * 8 > s.end) None
        else Some(Array.tabulate(n.toInt)(i =>
          (be32(b, s.start + 8 + i * 8), be32(b, s.start + 12 + i * 8))))
      }
    }

  /** stsz sample sizes; a nonzero constant `sample_size` means every
    * sample shares it. The per-sample table's length is checked against
    * the box body, so its allocation is input-proportional; the CONST
    * case would otherwise let a 20-byte box demand a MaxEntries-sized
    * array (amplification), so its count must also be plausible — n
    * samples of size `const` cannot exceed the whole file. */
  private def stszSizes(b: Array[Byte], stblKids: List[Box]): Option[Array[Long]] =
    find(stblKids, "stsz").flatMap { s =>
      if (s.end - s.start < 12) None
      else {
        val const = be32(b, s.start + 4)
        val n = be32(b, s.start + 8)
        if (n > MaxEntries) None
        else if (const != 0) {
          if (n * const > b.length) None
          else Some(Array.fill(n.toInt)(const))
        } else if (s.start + 12 + n * 4 > s.end) None
        else Some(Array.tabulate(n.toInt)(i => be32(b, s.start + 12 + i * 4)))
      }
    }

  /** Real per-frame decode timestamps in ms, expanded from the stts
    * runs: cumulative media-timescale ticks, one integer multiply/divide
    * per frame (ts·1000 / timescale — exact Long math, engine-neutral).
    * Truncated to the stsz frame count when the tables disagree (files
    * in the wild do), like every lenient demuxer. */
  def frameTimesMs(info: Mp4Info): Iterator[(Int, Long)] = {
    val nFrames = info.sampleSizes.length
    new Iterator[(Int, Long)] {
      private var run = 0
      private var inRun = 0L
      private var ticks = 0L
      private var idx = 0
      def hasNext: Boolean = idx < nFrames && run < info.sampleDeltas.length
      def next(): (Int, Long) = {
        val out = (idx, ticks * 1000L / info.timescale)
        ticks += info.sampleDeltas(run)._2
        inRun += 1
        if (inRun >= info.sampleDeltas(run)._1) { run += 1; inRun = 0 }
        idx += 1
        out
      }
    }
  }

  /** stsc sample-to-chunk runs (first_chunk, samples_per_chunk),
    * 1-based per ISO/IEC 14496-12 §8.7.4. Lenient: Array.empty (not a
    * parse refusal) when the box is absent or malformed — only
    * [[sampleRanges]] needs it, and that returns None on empty. The
    * sample-description index per run is read past, not kept: this
    * parser only ever uses the first stsd entry. */
  private def stscRuns(b: Array[Byte], stblKids: List[Box]): Array[(Long, Long)] =
    find(stblKids, "stsc").map { s =>
      if (s.end - s.start < 8) Array.empty[(Long, Long)]
      else {
        val n = be32(b, s.start + 4)
        if (n > MaxEntries || s.start + 8 + n * 12 > s.end) Array.empty[(Long, Long)]
        else Array.tabulate(n.toInt)(i =>
          (be32(b, s.start + 8 + i * 12), be32(b, s.start + 12 + i * 12)))
      }
    }.getOrElse(Array.empty)

  /** stco (32-bit) or co64 (64-bit) absolute chunk offsets. Lenient like
    * [[stscRuns]]. */
  private def chunkOffsetTable(b: Array[Byte], stblKids: List[Box]): Array[Long] = {
    def table(box: Box, entryBytes: Int, read: Int => Long): Array[Long] = {
      if (box.end - box.start < 8) return Array.empty
      val n = be32(b, box.start + 4)
      if (n > MaxEntries || box.start + 8 + n * entryBytes > box.end) Array.empty
      else Array.tabulate(n.toInt)(i => read(box.start + 8 + i * entryBytes))
    }
    find(stblKids, "stco").map(table(_, 4, be32(b, _)))
      .orElse(find(stblKids, "co64").map(table(_, 8, be64(b, _))))
      .getOrElse(Array.empty)
  }

  /** Per-sample absolute byte ranges (offset, size) in the file, from
    * stsc×stco×stsz per ISO/IEC 14496-12 §8.7.4-5: walk chunks in order,
    * each run's samples_per_chunk applying from its first_chunk until
    * the next run; samples inside a chunk are contiguous from the chunk
    * offset. None when the tables are absent, inconsistent (non-positive
    * or non-increasing first_chunk, fewer chunks/samples than declared),
    * or any range falls outside [0, fileLen) — a range must never be
    * guessed, it is about to be handed to a frame decoder. */
  def sampleRanges(info: Mp4Info, fileLen: Long): Option[Array[(Long, Long)]] = {
    val nSamples = info.sampleSizes.length
    val runs = info.stscRuns
    val offs = info.chunkOffsets
    if (nSamples == 0 || runs.isEmpty || offs.isEmpty) return None
    if (runs.head._1 != 1L) return None
    var i = 0
    while (i < runs.length) {
      if (runs(i)._2 <= 0L || (i > 0 && runs(i)._1 <= runs(i - 1)._1)) return None
      i += 1
    }
    val out = new Array[(Long, Long)](nSamples)
    var sample = 0
    var chunk = 1L
    var run = 0
    while (sample < nSamples) {
      if (chunk > offs.length) return None // sample table outruns stco
      if (run + 1 < runs.length && chunk >= runs(run + 1)._1) run += 1
      var off = offs(chunk.toInt - 1)
      var k = 0L
      val perChunk = runs(run)._2
      while (k < perChunk && sample < nSamples) {
        val sz = info.sampleSizes(sample)
        // `off + sz > fileLen` would wrap for a forged co64 offset near
        // Long.MaxValue (be64 yields any positive Long) and admit an
        // out-of-file range; subtract on the bounded side instead
        if (off < 0 || sz < 0 || sz > fileLen || off > fileLen - sz) return None
        out(sample) = (off, sz)
        off += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    Some(out)
  }

  /** Container-level feature vector — the video analog of
    * [[Multimodal.wavPcmFeatures]], same float-rounding discipline
    * (exact integer sums, one IEEE double divide / correctly-rounded
    * sqrt, one float round per lane — bit-exact across engines).
    *
    * Feature layout (first 12 lanes; rest zero):
    *   0  frame count (stsz)
    *   1  track duration seconds (mdhd duration / timescale)
    *   2  frames per second (frame count / duration; 0 when duration 0)
    *   3  mean sample size (bytes)
    *   4  population std of sample sizes
    *   5  min sample size
    *   6  max sample size
    *   7  total sample bytes
    *   8  width  (tkhd, integer part)
    *   9  height (tkhd, integer part)
    *   10 track count (movie-wide)
    *   11 movie duration seconds (mvhd) */
  def mp4Features(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (dim < 16) None
    else parse(payload).filter(_.sampleSizes.nonEmpty).map { info =>
      val n = info.sampleSizes.length
      var sum = 0L
      var sumSq = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var i = 0
      while (i < n) {
        val s = info.sampleSizes(i)
        sum += s
        sumSq += s * s
        if (s < mn) mn = s
        if (s > mx) mx = s
        i += 1
      }
      val nd = n.toDouble
      val mean = sum.toDouble / nd
      val durS = info.duration.toDouble / info.timescale
      val out = new Array[Float](dim)
      out(0) = n.toFloat
      out(1) = durS.toFloat
      out(2) = (if (info.duration > 0) nd / durS else 0.0).toFloat
      out(3) = mean.toFloat
      out(4) = math.sqrt(math.max(sumSq.toDouble / nd - mean * mean, 0.0)).toFloat
      out(5) = mn.toFloat
      out(6) = mx.toFloat
      out(7) = sum.toFloat
      out(8) = info.width.toFloat
      out(9) = info.height.toFloat
      out(10) = info.nTracks.toFloat
      out(11) = (info.mvhdDuration.toDouble / info.mvhdTimescale).toFloat
      out
    }
  }
}
