package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.util.SparkUtil.table

/** Similarity-search + embedding near-dup + multimodal queries over the
  * `embeddings` table. The brute-force top-k is oracle-checked bit-for-bit
  * (DuckDB `list_inner_product` composes to the identical IEEE op
  * sequence as our codegen'd cosine kernel), and so are the sign-LSH and
  * IVF paths — their deterministic index builds (splitmix64 planes;
  * engine-invariant Lloyd rounds) replay fully in DuckDB SQL — as are the
  * PQ and IVF-PQ compositions (per-subspace Lloyd + ADC + rerank) and
  * the multi-table near-dup candidates. Every ANN family member is
  * hash-exact; recall floors vs brute force are additionally asserted in
  * SimilaritySpec/RecallSpec. */
object SimilarityQueries {

  private val K = 10
  private val NQ = 5 // query vectors: vec_id < 5

  /** Trained IVF centroid matrices, keyed by dataset dir (the persisted-
    * index analog; training is deterministic so this is a pure cache). */
  private val ivfIndex =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Float]]]

  /** Trained PQ codebooks, same persisted-index analog as [[ivfIndex]]. */
  private val pqIndex =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Array[Float]]]]

  /** Paths of the persisted CODED-CORPUS stores (cell-partitioned
    * (neighbor_id, cell, codes) parquet) keyed by dataset dir — q185
    * searches these instead of re-encoding the corpus per query. */
  private val codesIndex =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The coded corpus for `dir`, building (and encoding) it on first
    * use with q81's trained codebooks — encode-once / search-many.
    * The temp artifact dir is reaped at JVM exit (ADVICE r10: repeated
    * bench runs were accumulating coded-corpus parquet under /tmp). */
  def codesPath(s: SparkSession, dir: String): String =
    codesIndex.getOrElseUpdate(dir, {
      val e = table(s, dir, "embeddings")
      val cc = ivfIndex.getOrElseUpdate(dir,
        Similarity.trainIvfCentroids(e, "vec_id", "embedding", 16, 3))
      val pc = pqIndex.getOrElseUpdate(dir,
        Similarity.trainPq(e, "vec_id", "embedding", m = 16, k = 16))
      val path = java.nio.file.Files
        .createTempDirectory("graft-ann-codes").toString
      graft.util.SparkUtil.deleteDirOnExit(path)
      graft.operators.AnnIndexStore.buildCodes(
        e, "vec_id", "embedding", cc, pc, s"$path/codes")
      s"$path/codes"
    })

  /** nprobe sweep over the PERSISTED coded corpus: for each nprobe,
    * (search seconds, recall@K vs exact brute force) — the measurement
    * that prices the cell-partition-pruning claim with numbers (fewer
    * probed cells = fewer partitions scanned = faster, at a recall
    * cost the sweep makes explicit). Probe-only: trained artifacts and
    * the coded store come from the caches/disk; only the search runs
    * per step. Bench emits this as the `ann_sweep` section. */
  def annSweepFromCodes(
      s: SparkSession,
      dir: String,
      nprobes: Seq[Int]): Seq[(Int, Double, Double)] = {
    val e = table(s, dir, "embeddings")
    val cc = ivfIndex.getOrElseUpdate(dir,
      Similarity.trainIvfCentroids(e, "vec_id", "embedding", 16, 3))
    val pc = pqIndex.getOrElseUpdate(dir,
      Similarity.trainPq(e, "vec_id", "embedding", m = 16, k = 16))
    val path = codesPath(s, dir)
    val qs = e.filter(col("vec_id") < NQ)
    val exact = Similarity.bruteForceTopK(
        e, "vec_id", "embedding", qs, "vec_id", "embedding", K)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rerank depth 10×K: deep enough that widening the probe ADDS
    // recall instead of crowding true neighbors out of the ADC
    // shortlist (at 4×K the r11 sweep measured recall FALLING with
    // nprobe — a shortlist artifact, not the pruning tradeoff the
    // sweep exists to price)
    def search(np: Int) = Similarity.ivfPqTopKFromCodes(
        graft.operators.AnnIndexStore.loadCodes(s, path),
        qs, "vec_id", "embedding", K, np, cc, pc,
        rerank = 10 * K,
        corpusForRerank = Some(e.select(
          col("vec_id").as("neighbor_id"), col("embedding").as("cv"))))
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    search(nprobes.max) // unmeasured warm pass: codegen + store footers
    // 3 timed reps per nprobe, INTERLEAVED across the nprobe list like
    // the main bench rep loop, median reported — a single-shot timing
    // lets one host stall poison that nprobe's published second
    // (ADVICE r11). Recall is deterministic; computed from rep 1.
    val reps = 3
    val times = nprobes.map(_ -> Array.fill(reps)(0.0)).toMap
    val recalls = scala.collection.mutable.Map.empty[Int, Double]
    (0 until reps).foreach { rep =>
      nprobes.foreach { np =>
        val t0 = System.nanoTime()
        val got = search(np)
        times(np)(rep) = (System.nanoTime() - t0) / 1e9
        if (rep == 0)
          recalls(np) = got.intersect(exact).size.toDouble / exact.size
      }
    }
    nprobes.map(np => (np, times(np).sorted.apply(reps / 2), recalls(np)))
  }

  /** The explicit production lifecycle for the ANN queries: ONE build job
    * trains both codebooks for `dir`, persists them as parquet artifacts
    * under `artifactDir` ([[graft.operators.AnnIndexStore]]), loads them
    * back, and seeds the in-JVM cache q40/q59/q81 consult — after this,
    * every search is probe-only (no Lloyd jobs in search latency), which
    * is how Bench measures them: `ann_build` is reported as its own
    * metric, the per-query reps time search alone. */
  def buildAnnIndexes(s: SparkSession, dir: String, artifactDir: String): Unit = {
    import graft.operators.AnnIndexStore
    val e = table(s, dir, "embeddings")
    AnnIndexStore.buildIvf(e, "vec_id", "embedding", nlist = 16, s"$artifactDir/ivf")
    AnnIndexStore.buildPq(e, "vec_id", "embedding", m = 16, k = 16, s"$artifactDir/pq")
    ivfIndex(dir) = AnnIndexStore.loadIvf(s, s"$artifactDir/ivf")
    pqIndex(dir) = AnnIndexStore.loadPq(s, s"$artifactDir/pq")
    // third artifact: the coded corpus (cell-partitioned codes) q185
    // searches — encoded once here so its reps are probe-only too
    codesPath(s, dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact ANN baseline: top-10 cosine neighbors of 5 query vectors.
    "q30_ann_brute" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") < NQ), "vec_id", "embedding", K)
    }),

    // Scale path: sign-LSH bucketed ANN. Oracle-checked BIT-EXACT (the
    // deterministic splitmix64 Rademacher planes, bucket bits, radius-2
    // probes, and cosine rerank all replay in DuckDB — see lshOracleSql);
    // recall vs brute force additionally floored in RecallSpec.
    "q31_ann_lsh" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.lshTopK(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") < NQ), "vec_id", "embedding", K, planes = 6)
    }),

    // Second ANN scale path: IVF — data-adaptive coarse quantizer (Lloyd
    // k-means over DataFrame aggs), nprobe-cell search. Oracle-checked
    // BIT-EXACT: the training is engine-invariant by construction, so the
    // oracle unrolls all three Lloyd rounds as DuckDB CTEs and replays
    // index build + search end to end (ivfOracleSql); recall vs brute
    // force additionally floored in RecallSpec.
    "q40_ann_ivf" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      // train-once cache: the deterministic centroid matrix is the
      // persisted IVF index; repeated queries (bench reps) search only
      val cents = ivfIndex.getOrElseUpdate(dir,
        Similarity.trainIvfCentroids(e, "vec_id", "embedding", nlist = 16))
      Similarity.ivfTopK(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") < NQ), "vec_id", "embedding", K,
        nlist = 16, nprobe = 4, centroids = Some(cents))
    }),

    // Embedding near-duplicate candidates via LSH buckets + exact cosine.
    // τ=0.4 suits this synthetic corpus (max pairwise cosine ≈ 0.48);
    // production near-dup τ≈0.95 is exercised on planted vectors in
    // DedupSpec. Oracle-checked BIT-EXACT (multi-table bucket replay —
    // see the q32 oracle below).
    "q32_embedding_neardups" -> ((s, dir) =>
      Dedup.embeddingNearDups(table(s, dir, "embeddings"), "vec_id", "embedding",
        planes = 4, threshold = 0.4, tables = 3)),

    // Class prototypes: exact per-label element-wise mean of the
    // embedding column, exploded to one row per (label, dimension).
    // Oracle-checked bit-for-bit — the float sums go through ExactAgg's
    // decimal path, so the mean is order-invariant and engine-invariant.
    "q53_centroids" -> ((s, dir) =>
      Similarity.centroids(table(s, dir, "embeddings"),
        col("label"), col("embedding"))),

    // int8 embedding quantization, exploded to scalar (vec_id, pos)
    // rows so every code and scale is oracle-checked bit-for-bit.
    "q57_quant8" -> ((s, dir) =>
      Similarity.quantizeInt8(table(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("scale"), posexplode(col("q")).as(Seq("pos", "code")))
        .select(col("vec_id"), col("pos"), col("scale"), col("code"))),

    // ANN over the PQ-compressed corpus: the code-column scan shortlists
    // 50 candidates per query (asymmetric distance against the trained
    // codebook), then only those rows are re-scored with exact cosine.
    // Oracle-checked BIT-EXACT: the per-subspace Lloyd training is
    // engine-invariant, so the oracle replays codebook build, encoding,
    // ADC scoring and rerank end to end (pqOracleSql); recall vs exact
    // search additionally asserted in SimilaritySpec.
    "q59_ann_pq" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      // m=16/k=16 → 4-dim subspaces, 16 bytes/vector (16× compression);
      // probed recall at sf0.01: 0.52 shortlist-only, 0.90 with rerank
      val cents = pqIndex.getOrElseUpdate(dir,
        Similarity.trainPq(e, "vec_id", "embedding", m = 16, k = 16))
      Similarity.pqTopK(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") < NQ), "vec_id", "embedding", K,
        m = 16, rerank = 50, centroids = Some(cents))
    }),

    // The production composition: IVF cells bound WHICH rows are scored,
    // PQ codes bound WHAT is read per row; exact rerank on the shortlist
    // (recall floor pinned in RecallSpec). Oracle-checked BIT-EXACT —
    // both deterministic trainings compose in one DuckDB WITH
    // (ivfPqOracleSql).
    "q81_ann_ivfpq" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val cc = ivfIndex.getOrElseUpdate(dir,
        Similarity.trainIvfCentroids(e, "vec_id", "embedding", 16, 3))
      val pc = pqIndex.getOrElseUpdate(dir,
        Similarity.trainPq(e, "vec_id", "embedding", m = 16, k = 16))
      Similarity.ivfPqTopK(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") < NQ), "vec_id", "embedding", K,
        nlist = 16, nprobe = 8, m = 16, rerank = 50,
        coarseCentroids = Some(cc), pqCentroids = Some(pc))
    }),

    // IVFADC search FROM THE PERSISTED CODED CORPUS — q81's exact search
    // (same codebooks, same probes, same rerank → same oracle) but the
    // corpus side is AnnIndexStore's cell-partitioned (id, cell, codes)
    // store: scan I/O is the probed cells' 16-byte codes, raw floats are
    // read only for the rerank shortlist. Encode-once / search-many —
    // the 100 TB search shape, with partition pruning asserted in
    // AnnIndexStoreSpec.
    "q185_ann_from_store" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val cc = ivfIndex.getOrElseUpdate(dir,
        Similarity.trainIvfCentroids(e, "vec_id", "embedding", 16, 3))
      val pc = pqIndex.getOrElseUpdate(dir,
        Similarity.trainPq(e, "vec_id", "embedding", m = 16, k = 16))
      Similarity.ivfPqTopKFromCodes(
        graft.operators.AnnIndexStore.loadCodes(s, codesPath(s, dir)),
        e.filter(col("vec_id") < NQ), "vec_id", "embedding", K,
        nprobe = 8, cc, pc, rerank = 50,
        corpusForRerank = Some(e.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"))))
    }),

    // ANN over the quantized corpus: top-10 int8-cosine neighbors of the
    // same 5 queries as q30. Oracle-checked bit-for-bit — integer dot
    // products are order-exact, so even the scores hash-match.
    "q58_ann_int8" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.bruteForceTopKInt8(
        e, "vec_id", "embedding",
        e.filter(col("vec_id") < NQ), "vec_id", "embedding", K)
    }),

    // Multimodal plumbing: synthetic binary payloads → decode (REAL
    // pixel/sample/container parse for BMP/PNG/GIF/WAV/MP4 rows;
    // deterministic stub only for refused payloads — the header-only
    // jpeg rows) → feature vectors ready for similarity ops.
    // Oracle-checked BIT-EXACT: every payload byte is deterministic, so
    // both decode paths replay in DuckDB (mediaFeatureOracleSql) — with
    // this, ALL registry queries are oracle-backed.
    "q33_media_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 200)
      Multimodal.featureFrame(media)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          size(col("features")).as("dim"),
          element_at(col("features"), 1).as("f0"))
    }),

    // REAL 16-bit PCM WAV decode: the audio rows' full feature lanes —
    // sample mean/std/min/max, RMS, zero-crossing rate, mean |Δ|,
    // half-scale loudness fraction, duration — straight off the binary
    // column's decoded samples (Multimodal.wavPcmFeatures). Oracle-checked
    // BIT-EXACT: every data byte is closed-form in media_id, integer sums
    // are exact in both engines, and each float lane is one IEEE
    // divide/sqrt + one float round, both correctly rounded. Shuffle-free
    // per-row decode — the audio analog of the BMP pixel path.
    "q180_wav_pcm" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 200)
      Multimodal.featureFrame(media)
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("n_bytes"),
          element_at(col("features"), 1).as("mean_s"),
          element_at(col("features"), 2).as("std_s"),
          element_at(col("features"), 3).cast("int").as("min_s"),
          element_at(col("features"), 4).cast("int").as("max_s"),
          element_at(col("features"), 5).as("rms"),
          element_at(col("features"), 6).as("zcr"),
          element_at(col("features"), 7).as("mad"),
          element_at(col("features"), 8).as("loud_frac"),
          element_at(col("features"), 9).as("dur_s"),
          element_at(col("features"), 12).cast("int").as("n_samples"))
    }),

    // REAL ISO-BMFF container parse: the video rows' full feature lanes
    // — frame count, duration, fps, sample-size mean/std/min/max/total,
    // tkhd dimensions, track count, movie duration — straight off the
    // binary column's real box tree (Mp4Codec: mvhd/tkhd/mdhd/hdlr +
    // stts/stsz walk). Oracle-checked BIT-EXACT: sample sizes are
    // closed-form in media_id, integer sums are exact in both engines,
    // and each float lane is one IEEE divide/sqrt + one float round —
    // the q180 disciplines applied to video. Shuffle-free per-row parse.
    "q181_mp4_boxes" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 200)
      Multimodal.featureFrame(media)
        .filter(col("kind") === "video")
        .select(col("media_id"), col("n_bytes"),
          element_at(col("features"), 1).cast("int").as("n_frames"),
          element_at(col("features"), 2).as("dur_s"),
          element_at(col("features"), 3).as("fps"),
          element_at(col("features"), 4).as("mean_sz"),
          element_at(col("features"), 5).as("std_sz"),
          element_at(col("features"), 6).cast("int").as("min_sz"),
          element_at(col("features"), 7).cast("int").as("max_sz"),
          element_at(col("features"), 8).cast("long").as("total_sz"),
          element_at(col("features"), 9).cast("int").as("width"),
          element_at(col("features"), 12).as("movie_dur_s"))
    }),

    // REAL frame-level expansion: one row per ACTUAL frame from each
    // MP4's stts decode deltas (not metadata strides) — the join spine a
    // frame-level training pipeline hangs captions/embeddings on.
    // Oracle-checked BIT-EXACT: constant 512-tick deltas at timescale
    // 12800 make every timestamp exactly 40·k ms in integer math.
    "q182_mp4_frames" -> ((s, dir) =>
      Multimodal.sampleFramesMp4(Multimodal.syntheticMedia(s, 200)).toDF()
        .select(col("media_id"), col("frame_index"), col("frame_ts_ms"))),

    // REAL end-to-end VIDEO PIXEL decode — the last modality promoted
    // from container-only to pixels: Motion-JPEG MP4s (stsd fourcc
    // `jpeg`) → stsc/stco/stsz byte-range expansion across two chunks →
    // each frame sliced out of mdat and decoded by the full baseline-
    // JPEG path (Huffman DC chain, dequant, IDCT, YCbCr→RGB) → the two
    // vertical band colors read back off a whole-frame pixel scan.
    // Oracle-checked BIT-EXACT: the encoder's 64-pixel block-mean
    // accumulation is replayed as the IDENTICAL sequential double fold
    // (DuckDB list_reduce), /64 and the two rounded YCbCr conversions
    // are one-rounding IEEE ops, and decoded planes are integers — so
    // every band color crosses engines exactly. Per-row decode inside
    // the partition iterator, shuffle-free.
    "q183_mjpeg_decode" -> ((s, dir) =>
      Multimodal.decodeMjpegFrames(Multimodal.syntheticMjpeg(s, 120)).toDF()),

    // Frame sampling of video payloads — metadata fan-out shape.
    // Oracle-checked: the closed-form frame count/last-ts per video.
    "q34_frame_samples" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 200)
      Multimodal.sampleFrames(media, strideMs = 500L).toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"), max(col("frame_ts_ms")).as("last_ts"))
    }),

    // REAL multimodal metadata: container-header parse (format sniff,
    // PNG/JPEG/GIF/BMP dims, WAV sample rate) straight off the binary
    // column — codegen'd byte arithmetic, no codec. Oracle-checked: the
    // synthetic table is a pure function of media_id, so DuckDB
    // recomputes the expected metadata closed-form and any parser bug
    // (offset, endianness, format sniff) breaks the match; per-format
    // parser equality additionally pinned in MediaSpec.
    "q63_media_meta" -> ((s, dir) =>
      Multimodal.parseMeta(Multimodal.syntheticMedia(s, 200))),

    // Embedding L2 norms + unit-scaled first component, oracle-checked
    // BIT-EXACT: the HOF fold accumulates x² in index order from 0.0 —
    // the identical chain DuckDB's list_inner_product(v,v) walks (the
    // q30 parity already pins that) — and IEEE sqrt is CORRECTLY ROUNDED
    // by the standard (unlike ln/pow), so even the square root crosses
    // engines exactly. Shuffle-free per-row scan; the norm is the
    // prerequisite every cosine/IP index build computes first at scale.
    "q108_l2norm" -> ((s, dir) => {
      val ss = aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      table(s, dir, "embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          sqrt(ss).as("l2_norm"),
          when(sqrt(ss) === 0.0, lit(0.0))
            .otherwise(element_at(col("embedding"), 1).cast("double") / sqrt(ss))
            .as("first_unit"))
    }),

    // Greedy k-center coreset + assignment: the diversity-aware sample —
    // 8 centers picked by farthest-point traversal (Gonzalez 2-approx),
    // every vector assigned to its nearest center. The selection is
    // deterministic end to end (min-id seed, exact float max/min, pinned
    // cosine chain), so the 8 driver rounds replay as 8 unrolled SQL
    // rounds in DuckDB — an ITERATIVE driver-loop operator that still
    // hash-matches. k scans, no shuffle, k·dim floats of driver state.
    "q129_kcenter_coreset" -> ((s, dir) =>
      Similarity.kCenterAssign(table(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8)),

    // Label SEPARABILITY report: per label pair, squared centroid
    // distance vs within-class spread (E‖x−c‖², the trace of the class
    // covariance) and their Fisher-style ratio — the "is this labeled
    // embedding set learnable / did the classes drift together"
    // diagnostic run before training a probe on the corpus. Exactness:
    // centroids and spreads go through ExactAgg's decimal sums (q53's
    // discipline), and every cross-dimension reduction is a per-row
    // index-order fold (zip_with diff² + left-fold aggregate — the
    // op sequence DuckDB's list_inner_product replays exactly, q30's
    // established equivalence). Scale shape: one posexplode aggregate
    // for centroids (dims × labels output), one broadcast of the tiny
    // centroid table back over the corpus for spreads, a labels²
    // centroid self-join — nothing pairwise ever touches row data.
    "q143_class_margin" -> ((s, dir) => {
      import graft.functions.ExactAgg
      val v = table(s, dir, "embeddings")
        .select(col("label"), col("embedding").cast("array<double>").as("cv"))
      val cent = v
        .select(col("label"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(ExactAgg.davg(col("x")).as("c"))
        .groupBy(col("label"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
          e => e.getField("c")).as("cent"))
      val n = v.groupBy(col("label")).agg(count(lit(1)).as("n"))
      def sqDist(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d)
      val sp = v.join(broadcast(cent), Seq("label"))
        .select(col("label"), sqDist(col("cv"), col("cent")).as("d2"))
        .groupBy(col("label"))
        .agg(ExactAgg.davg(col("d2")).as("spread2"))
      val pairs = cent.select(col("label").as("label_a"), col("cent").as("ca"))
        .join(cent.select(col("label").as("label_b"), col("cent").as("cb")),
          col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          sqDist(col("ca"), col("cb")).as("dist2"))
      pairs
        .join(broadcast(n.select(col("label").as("label_a"), col("n").as("n_a"))),
          Seq("label_a"))
        .join(broadcast(n.select(col("label").as("label_b"), col("n").as("n_b"))),
          Seq("label_b"))
        .join(broadcast(sp.select(col("label").as("label_a"),
          col("spread2").as("spread2_a"))), Seq("label_a"))
        .join(broadcast(sp.select(col("label").as("label_b"),
          col("spread2").as("spread2_b"))), Seq("label_b"))
        .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
          col("dist2"), col("spread2_a"), col("spread2_b"),
          (col("dist2") / (col("spread2_a") + col("spread2_b"))).as("fisher"))
    }),

    // Semantic dedup clusters: the embedding-space analog of q120's
    // SimHash text clusters — LSH-bucketed near-dup pairs (q32's operator:
    // multi-table sign-LSH candidates + exact-cosine threshold, never
    // all-pairs) fed into connected components, every vector labeled with
    // its cluster (= component-min vec_id; singletons label themselves),
    // plus cluster size and a canonical flag. THE curation step that
    // collapses embedding-near-duplicate training examples to one
    // representative: filter canonical = keep set. Pair generation cost
    // is bucket-bounded, components run the size-adaptive driver/
    // distributed path, and the size join keys on the small cluster set.
    "q128_semantic_clusters" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
        planes = 4, threshold = 0.4, tables = 3)
      val labels = Dedup.duplicateClusters(
        pairs.select(col("id_a"), col("id_b")))
        .withColumnRenamed("id", "vec_id")
      val lab = emb.select(col("vec_id")).join(labels, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster"), col("vec_id")).as("cluster"))
      val sizes = lab.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      lab.join(sizes, Seq("cluster"))
        .select(col("vec_id"), col("cluster"), col("cluster_size"),
          (col("vec_id") === col("cluster")).as("canonical"))
    }),

    // Recall AUDIT as a first-class query — "measure, don't guess" for
    // the ANN quality/cost dial: per query vector, how many of the exact
    // top-K survive in the IVF nprobe=4 shortlist path (the production
    // index), as an integer overlap count and ppm recall. Both sides are
    // the already-oracled q30/q40 operators; the audit is ONE left join
    // on (query, neighbor) + a count — overlap is set intersection, so
    // no float compare enters the verdict. At 100 TB this runs on a
    // sampled query panel (queries << corpus) and prices any
    // nprobe/nlist change before it ships.
    "q153_recall_audit" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") < NQ)
      val brute = Similarity.bruteForceTopK(
          e, "vec_id", "embedding", qs, "vec_id", "embedding", K)
        .select(col("query_id"), col("neighbor_id"))
      val cents = ivfIndex.getOrElseUpdate(dir,
        Similarity.trainIvfCentroids(e, "vec_id", "embedding", nlist = 16))
      val ivf = Similarity.ivfTopK(
          e, "vec_id", "embedding", qs, "vec_id", "embedding", K,
          nlist = 16, nprobe = 4, centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("hit")).as("n_overlap"))
        .select(col("query_id"), lit(K).as("k"), col("n_overlap"),
          expr(s"n_overlap * 1000000 div $K").as("recall_ppm"))
    }),

    // PQ codebook HEALTH audit: per-subspace mean squared reconstruction
    // error of the trained quantizer over the corpus — the distortion
    // half of the recall/compression dial (q153 prices recall; this
    // prices what the codes destroyed, and a subspace whose MSE is an
    // outlier means its 4 dims need more centroids or a rotation).
    // Encoding is the same per-row codegen'd expression path q59 search
    // uses; the squared error is an index-order zip_with/aggregate fold
    // (the q30-pinned op chain, so DuckDB's list_inner_product replays
    // it); cross-row sums go through the decimal path. One subspace
    // explode (m× rows of 4-dim slices) + one map-side-combined
    // aggregate — shuffled rows = m × subspaces, not corpus.
    "q155_pq_distortion" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val e = table(s, dir, "embeddings")
      val cents = pqIndex.getOrElseUpdate(dir,
        Similarity.trainPq(e, "vec_id", "embedding", m = 16, k = 16))
      // Fold-then-explode through ONE fused codegen'd kernel (PqSse):
      // encode (first-max-wins cosine argmax, the nearestCell chain) +
      // index-order squared-error fold per subspace in a single compiled
      // pass, then explode the 16-double result. The composed-expression
      // form re-inlined the whole encode tree into every subspace
      // reference after projection collapse (≈8,000 kernel calls/row,
      // 25 s at sf0.1); this is 16·16·4 fused flops/row and the exchange
      // carries 16 doubles per vector.
      e.select(col("vec_id"),
          graft.functions.GraftFunctions.pq_sse(col("embedding"),
            cents.flatten.flatten, cents.length, cents.head.length,
            cents.head.head.length).as("sses"))
        .select(posexplode(col("sses")).as(Seq("sub", "se")))
        .groupBy(col("sub"))
        .agg(count(lit(1)).as("n_vecs"), d2(sum(col("se").cast(XI))).as("sse"))
        .select(col("sub"), col("n_vecs"), col("sse"),
          (col("sse") / col("n_vecs").cast("double")).as("mse"))
    })
  )

  /** Composed cosine with the exact op tree of HashKernels.cosineFF. */
  private def cosSql(a: String, b: String): String =
    s"""CASE WHEN list_inner_product($a, $a) = 0.0 OR list_inner_product($b, $b) = 0.0
       |THEN 0.0 ELSE list_inner_product($a, $b)
       |  / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))) END""".stripMargin

  /** q30's oracle, factored so q153's recall audit can reuse it as a
    * subquery (DuckDB accepts a WITH inside a derived table). */
  private def bruteOracleSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < $NQ),
       |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
       |           FROM embeddings)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, ${cosSql("cv", "qv")} AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ${cosSql("cv", "qv")} DESC, neighbor_id ASC) AS rank
       |  FROM c CROSS JOIN q)
       |WHERE rank <= $K""".stripMargin

  def oracles: Map[String, String] = Map(
    // The embedding dim (64) is a fixed property of the synthetic table
    // (asserted for every SF); the Spark operator itself is dim-agnostic.
    "q53_centroids" ->
      s"""SELECT label, CAST(g.i - 1 AS INT) AS pos,
         |  ${graft.functions.ExactAgg.sqlAvg("CAST(embedding[g.i] AS DOUBLE)")} AS c,
         |  COUNT(1) AS n
         |FROM embeddings, generate_series(1, 64) AS g(i)
         |GROUP BY label, pos""".stripMargin,

    // Cross-dim reductions replay as list_inner_product over the diff
    // list — the 0-seeded index-order mul/add chain q30 pinned against
    // the cosine kernel; centroid/spread averages are ExactAgg decimal
    // sums (q53's discipline). Dim 64 is the synthetic table's fixed
    // property, asserted per SF in TestdataSchemaSpec.
    "q143_class_margin" ->
      s"""WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS cv
         |           FROM embeddings),
         |cd AS (SELECT label, g.i AS pos,
         |         ${graft.functions.ExactAgg.sqlAvg("cv[g.i]")} AS c
         |       FROM v, generate_series(1, 64) AS g(i) GROUP BY label, g.i),
         |cent AS (SELECT label, list(c ORDER BY pos) AS cent FROM cd
         |         GROUP BY label),
         |n AS (SELECT label, COUNT(1) AS n FROM v GROUP BY label),
         |d2 AS (SELECT v.label,
         |  list_inner_product(
         |    list_transform(range(1, 65), i -> cv[i] - cent[i]),
         |    list_transform(range(1, 65), i -> cv[i] - cent[i])) AS d2
         |  FROM v JOIN cent USING (label)),
         |sp AS (SELECT label, ${graft.functions.ExactAgg.sqlAvg("d2")} AS spread2
         |       FROM d2 GROUP BY label),
         |p AS (SELECT a.label AS label_a, b.label AS label_b,
         |  list_inner_product(
         |    list_transform(range(1, 65), i -> a.cent[i] - b.cent[i]),
         |    list_transform(range(1, 65), i -> a.cent[i] - b.cent[i])) AS dist2
         |  FROM cent a JOIN cent b ON a.label < b.label)
         |SELECT label_a, label_b, na.n AS n_a, nb.n AS n_b, dist2,
         |  sa.spread2 AS spread2_a, sb.spread2 AS spread2_b,
         |  dist2 / (sa.spread2 + sb.spread2) AS fisher
         |FROM p
         |JOIN n na ON na.label = p.label_a
         |JOIN n nb ON nb.label = p.label_b
         |JOIN sp sa ON sa.label = p.label_a
         |JOIN sp sb ON sb.label = p.label_b""".stripMargin,

    // max|e| = greatest(|min|, |max|); float→double casts are exact, the
    // divides and floor are IEEE-exact — the identical op tree to the
    // QuantScale/QuantInt8 kernels.
    "q57_quant8" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |s AS (SELECT vec_id, e,
        |         greatest(abs(list_min(e)), abs(list_max(e))) / 127.0 AS scale
        |       FROM v)
        |SELECT vec_id, CAST(g.i - 1 AS INT) AS pos, scale,
        |  CAST(CASE WHEN scale = 0.0 THEN 0
        |       ELSE floor(e[g.i] / scale + 0.5) END AS INT) AS code
        |FROM s, generate_series(1, 64) AS g(i)""".stripMargin,

    // codes as integral doubles: every partial sum in the inner products
    // stays below 2^53, so DuckDB's in-order double summation equals the
    // kernel's exact long accumulation bit-for-bit
    "q58_ann_int8" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |s AS (SELECT vec_id, e,
         |         greatest(abs(list_min(e)), abs(list_max(e))) / 127.0 AS scale
         |       FROM v),
         |codes AS (
         |  SELECT vec_id,
         |    CASE WHEN scale = 0.0 THEN list_transform(e, x -> 0.0)
         |         ELSE list_transform(e, x -> floor(x / scale + 0.5)) END AS qcode
         |  FROM s),
         |qq AS (SELECT vec_id AS query_id, qcode AS qv FROM codes WHERE vec_id < $NQ),
         |cc AS (SELECT vec_id AS neighbor_id, qcode AS cv FROM codes)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
         |  SELECT query_id, neighbor_id, ${cosSql("cv", "qv")} AS cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY ${cosSql("cv", "qv")} DESC, neighbor_id ASC) AS rank
         |  FROM cc CROSS JOIN qq)
         |WHERE rank <= $K""".stripMargin,

    "q30_ann_brute" -> bruteOracleSql,

    // Same index-order Σx² chain and the correctly-rounded IEEE sqrt.
    "q108_l2norm" ->
      """WITH v AS (
        |  SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS dv
        |  FROM embeddings)
        |SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  sqrt(list_inner_product(dv, dv)) AS l2_norm,
        |  CASE WHEN sqrt(list_inner_product(dv, dv)) = 0.0 THEN 0.0
        |       ELSE CAST(embedding[1] AS DOUBLE)
        |            / sqrt(list_inner_product(dv, dv)) END AS first_unit
        |FROM v""".stripMargin,

    "q31_ann_lsh" -> lshOracleSql,
    "q40_ann_ivf" -> ivfOracleSql,

    // The PQ training/encode CTEs replayed; the squared error is
    // list_inner_product over the element-wise difference (the same
    // q30-pinned index-order chain as the Spark fold), decimal-summed.
    "q155_pq_distortion" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val sse = "SUM(CAST(se AS DECIMAL(18,6)))"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${pqSearchCtes(16, 16, 4, 3)},
         |err AS (
         |  SELECT a.s AS sub,
         |    list_inner_product(
         |      list_transform(range(1, 5), i -> a.e[i] - c.c[i]),
         |      list_transform(range(1, 5), i -> a.e[i] - c.c[i])) AS se
         |  FROM vs a
         |  JOIN codes k ON a.vec_id = k.vec_id AND a.s = k.s
         |  JOIN pqc3 c ON c.s = a.s AND c.cell = k.code),
         |agg AS (SELECT sub, COUNT(1) AS n_vecs, ${d2(sse)} AS sse
         |        FROM err GROUP BY sub)
         |SELECT CAST(sub AS INT) AS sub, CAST(n_vecs AS BIGINT) AS n_vecs,
         |  sse, sse / CAST(n_vecs AS DOUBLE) AS mse
         |FROM agg""".stripMargin
    },

    // Integer set-intersection of the two replayed top-K lists — no
    // float enters the verdict.
    "q153_recall_audit" ->
      s"""SELECT b.query_id, CAST($K AS INT) AS k,
         |  COUNT(i.neighbor_id) AS n_overlap,
         |  CAST(COUNT(i.neighbor_id) * 1000000 // $K AS BIGINT) AS recall_ppm
         |FROM ($bruteOracleSql) b
         |LEFT JOIN ($ivfOracleSql) i
         |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
         |GROUP BY b.query_id""".stripMargin,
    "q59_ann_pq" -> pqOracleSql,
    "q81_ann_ivfpq" -> ivfPqOracleSql,

    // q185 is q81's search served from the persisted coded corpus —
    // same codebooks, probes, and rerank, so the same bit-exact replay.
    "q185_ann_from_store" -> ivfPqOracleSql,
    "q33_media_features" -> mediaFeatureOracleSql,
    "q180_wav_pcm" -> wavPcmOracleSql,
    "q181_mp4_boxes" -> mp4BoxOracleSql,

    // Frame expansion: video ids ≡ 2 mod 3, n = 5 + id%10 frames, each
    // exactly 40 ms apart (512 ticks at timescale 12800).
    "q182_mp4_frames" ->
      """WITH v AS (SELECT CAST(t.i AS BIGINT) AS media_id,
        |                  CAST(5 + (t.i % 10) AS BIGINT) AS n
        |           FROM range(0, 200) t(i) WHERE t.i % 3 = 2)
        |SELECT media_id, CAST(k AS INT) AS frame_index,
        |       CAST(k * 40 AS BIGINT) AS frame_ts_ms
        |FROM (SELECT media_id, unnest(range(0, n)) AS k FROM v)""".stripMargin,

    "q183_mjpeg_decode" -> mjpegDecodeOracleSql,

    // The synthetic media table is a pure function of media_id (kind
    // rotation, pad = 200 + id, dims from the id, format rotation every
    // third image), so the oracle recomputes the EXPECTED container
    // metadata closed-form and the check exercises the whole loop:
    // header synthesis → binary column → byte-walking parser. A parser
    // bug (wrong offset, endianness, missing format) breaks the match.
    "q63_media_meta" ->
      """WITH m AS (SELECT CAST(t.i AS BIGINT) AS media_id FROM range(0, 200) t(i)),
        |d AS (SELECT media_id,
        |        CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |        200 + (media_id % 512) AS pad,
        |        CAST(64 + (media_id % 8) * 16 AS INT) AS w,
        |        (media_id // 3) % 4 AS sub
        |      FROM m),
        |d2 AS (SELECT *,
        |        -- real GIF: LZW data bytes (9-bit codes: npix literals +
        |        -- one CLEAR per 254 + EOI, bit-packed)
        |        (9 * (w * 64 + (w * 64 + 253) // 254 + 1) + 7) // 8 AS gif_db
        |      FROM d)
        |SELECT media_id, kind,
        |  CAST(CASE WHEN kind = 'audio' THEN 44 + pad
        |            -- real MP4: 579 fixed box bytes + 4 stsz entries/frame
        |            -- + the mdat sample bytes (mp4FullBytes closed form)
        |            WHEN kind = 'video' THEN 579 + 4 * (5 + media_id % 10)
        |              + list_sum(list_transform(range(0, 5 + media_id % 10),
        |                  k -> 16 + ((media_id * 31 + k * 7) % 251)))
        |            -- real PNG: 8 sig + 25 IHDR + 12 IEND + (12 + zlib)
        |            -- IDAT, zlib stored-mode = 11 + 64*(1+3w) raw bytes
        |            WHEN sub = 0 THEN 64 * (1 + 3 * w) + 68
        |            WHEN sub = 1 THEN 39 + pad
        |            -- real GIF: 792 fixed bytes + data + sub-block length
        |            -- bytes + terminator + trailer
        |            WHEN sub = 2 THEN 794 + gif_db + (gif_db + 254) // 255
        |            ELSE 54 + ((w * 3 + 3) // 4) * 4 * 64 END AS INT) AS n_bytes,
        |  CASE WHEN kind = 'audio' THEN 'wav' WHEN kind = 'video' THEN 'mp4'
        |       WHEN sub = 0 THEN 'png' WHEN sub = 1 THEN 'jpeg'
        |       WHEN sub = 2 THEN 'gif' ELSE 'bmp' END AS format,
        |  CASE WHEN kind IN ('image', 'video') THEN w END AS width,
        |  CASE WHEN kind IN ('image', 'video') THEN CAST(64 AS INT) END AS height,
        |  CASE WHEN kind = 'audio' THEN CAST(16000 AS INT) END AS sample_rate
        |FROM d2""".stripMargin,

    // q32: multi-table sign-LSH near-dup candidates replay whole: the 12
    // Rademacher planes (3 tables × 4 planes, one fused bucket_all) are
    // literals, table buckets are bit-slices, and the exact-cosine
    // threshold filter plus post-threshold DISTINCT mirror the operator
    // one-to-one.
    "q32_embedding_neardups" -> {
      val (planes, tables, thresh) = (4, 3, 0.4)
      s"""WITH planes(p, pl) AS (VALUES
         |    ${planeValuesSql(planes * tables)}),
         |v AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT doc_id, any_value(e) AS e,
         |        CAST(sum(CASE WHEN list_inner_product(e, pl) > 0.0
         |                      THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket_all
         |      FROM v CROSS JOIN planes GROUP BY doc_id),
         |sk AS (SELECT doc_id, e, t.i AS tbl,
         |         (bucket_all >> (t.i * $planes)) & ${(1 << planes) - 1} AS bucket
         |       FROM b, range(0, $tables) t(i))
         |SELECT DISTINCT a.doc_id AS id_a, x.doc_id AS id_b,
         |  ${cosSql("a.e", "x.e")} AS cosine
         |FROM sk a JOIN sk x ON a.tbl = x.tbl AND a.bucket = x.bucket
         |WHERE a.doc_id < x.doc_id AND ${cosSql("a.e", "x.e")} >= $thresh""".stripMargin
    },

    // Frame sampling is metadata math: frames at 0, 500, … < duration_ms
    // where duration_ms = 1000 + media_id (video ids ≡ 2 mod 3) — so the
    // per-media frame count and last timestamp are closed-form.
    "q34_frame_samples" ->
      """WITH m AS (SELECT CAST(t.i AS BIGINT) AS media_id, 1000 + t.i % 5000 AS dur
        |           FROM range(0, 200) t(i) WHERE t.i % 3 = 2)
        |SELECT media_id, (dur + 499) // 500 AS n_frames,
        |       ((dur + 499) // 500 - 1) * 500 AS last_ts
        |FROM m""".stripMargin,

    // q128: the q32 edge replay (planes/buckets/threshold verbatim) +
    // the WITH RECURSIVE reachability closure (q73's oracle pattern) +
    // singleton self-labels, size, and canonical flag.
    "q128_semantic_clusters" -> {
      val (planes, tables, thresh) = (4, 3, 0.4)
      s"""WITH RECURSIVE planes(p, pl) AS (VALUES
         |    ${planeValuesSql(planes * tables)}),
         |v AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT doc_id, any_value(e) AS e,
         |        CAST(sum(CASE WHEN list_inner_product(e, pl) > 0.0
         |                      THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket_all
         |      FROM v CROSS JOIN planes GROUP BY doc_id),
         |sk AS (SELECT doc_id, e, t.i AS tbl,
         |         (bucket_all >> (t.i * $planes)) & ${(1 << planes) - 1} AS bucket
         |       FROM b, range(0, $tables) t(i)),
         |edges AS (
         |  SELECT DISTINCT a.doc_id AS id_a, x.doc_id AS id_b
         |  FROM sk a JOIN sk x ON a.tbl = x.tbl AND a.bucket = x.bucket
         |  WHERE a.doc_id < x.doc_id AND ${cosSql("a.e", "x.e")} >= $thresh),
         |nodes AS (SELECT id_a AS id FROM edges UNION SELECT id_b AS id FROM edges),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
         |        UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id),
         |labels AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
         |lab AS (
         |  SELECT emb.vec_id, COALESCE(l.cluster, emb.vec_id) AS cluster
         |  FROM embeddings emb LEFT JOIN labels l ON l.id = emb.vec_id),
         |sz AS (SELECT cluster, COUNT(*) AS cluster_size FROM lab GROUP BY cluster)
         |SELECT lab.vec_id, lab.cluster, sz.cluster_size,
         |       lab.vec_id = lab.cluster AS canonical
         |FROM lab JOIN sz USING (cluster)""".stripMargin
    },

    "q129_kcenter_coreset" -> kCenterOracleSql(8)
  )

  /** q129's oracle: the k driver rounds unrolled as k CTE rounds — each
    * recomputes max-cosine-to-chosen from scratch (float max is
    * order-invariant, so recompute ≡ Spark's incremental array_max) and
    * picks MIN (mc, vec_id); the final assignment is rank-1 by
    * (cos DESC, center ASC), the same struct-max tiebreak. */
  private def kCenterOracleSql(k: Int): String = {
    // MATERIALIZED is load-bearing: each round's CTE is referenced 2-3
    // times, and DuckDB's default inlining re-expands the whole chain at
    // every reference — the 8-round query went from ~8 MINUTES to 0.4 s
    // at sf0.01 when the rounds pin to materialization (identical rows)
    val sb = new StringBuilder
    sb ++= """WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |c0 AS MATERIALIZED (SELECT vec_id, e FROM v
             |       WHERE vec_id = (SELECT MIN(vec_id) FROM v))""".stripMargin
    for (i <- 1 until k) {
      val prev = s"c${i - 1}"
      sb ++= s""",
               |s$i AS (SELECT a.vec_id, any_value(a.e) AS e,
               |          MAX(${cosSql("a.e", "c.e")}) AS mc
               |        FROM v a, $prev c
               |        WHERE a.vec_id NOT IN (SELECT vec_id FROM $prev)
               |        GROUP BY a.vec_id),
               |p$i AS (SELECT vec_id, e FROM s$i ORDER BY mc ASC, vec_id ASC LIMIT 1),
               |c$i AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT * FROM p$i)""".stripMargin
    }
    sb ++= s""",
             |asg AS (SELECT a.vec_id, c.vec_id AS center,
             |          ${cosSql("a.e", "c.e")} AS cs,
             |          row_number() OVER (PARTITION BY a.vec_id
             |            ORDER BY ${cosSql("a.e", "c.e")} DESC, c.vec_id ASC) AS rn
             |        FROM v a, c${k - 1} c)
             |SELECT vec_id, center, cs AS cos_to_center, vec_id = center AS is_center
             |FROM asg WHERE rn = 1""".stripMargin
    sb.toString
  }

  // ---- q31: full sign-LSH replay ------------------------------------
  // The hyperplanes are Rademacher (±1) vectors whose signs come from the
  // SAME splitmix64 the SignLshBucket kernel runs — embedded as literal
  // DOUBLE[] lists, so there is no second plane implementation to drift.
  // dot(vec, plane) is then an in-order double accumulation of ±vec[d],
  // exactly DuckDB's list_inner_product chain (pinned by the q30 parity),
  // so bucket bits, radius-2 multi-probe (22 XOR masks), the bucket
  // equi-join, the exact-cosine rerank, and the (score DESC, id ASC)
  // top-k ALL hash-match bit-for-bit.
  private val LshPlanes = 6

  /** The kernel's Rademacher hyperplanes as DuckDB VALUES rows — signs
    * from the SAME splitmix64 the SignLshBucket expression runs. */
  private def planeValuesSql(planes: Int, dim: Int = 64): String =
    (0 until planes).map { p =>
      val comps = (0 until dim).map { d =>
        if ((graft.functions.HashKernels.splitmix64(p.toLong * 1024L + d) & 1L) == 0L)
          "1.0"
        else "-1.0"
      }
      s"($p, ${comps.mkString("[", ",", "]")}::DOUBLE[])"
    }.mkString(",\n    ")

  private def lshOracleSql: String = {
    val planeRows = planeValuesSql(LshPlanes)
    // probe masks: bucket0, all 1-bit flips, all 2-bit flips (radius 2)
    val masks = Seq(0L) ++
      (0 until LshPlanes).map(i => 1L << i) ++
      (for {
        i <- 0 until (LshPlanes - 1); j <- (i + 1) until LshPlanes
      } yield (1L << i) | (1L << j))
    s"""WITH planes(p, pl) AS (VALUES
       |    $planeRows),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, any_value(e) AS e,
       |        CAST(sum(CASE WHEN list_inner_product(e, pl) > 0.0
       |                      THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
       |      FROM v CROSS JOIN planes GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, e AS qv,
       |        unnest(list_transform(${masks.mkString("[", ",", "]")},
       |                              m -> xor(bucket, m))) AS bucket
       |      FROM b WHERE vec_id < $NQ),
       |j AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |        ${cosSql("c.e", "q.qv")} AS cosine
       |      FROM b c JOIN q ON c.bucket = q.bucket)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM j)
       |WHERE rank <= $K""".stripMargin
  }

  // ---- shared Lloyd-unroll CTE builders (q40/q59/q81) ----------------
  // trainIvfCentroids/trainPq are engine-invariant by construction, so a
  // fixed-iteration k-means replays as chained CTEs: assignment is the
  // first-max-wins cosine argmax (ROW_NUMBER over score DESC, cell ASC),
  // the update is the ExactAgg decimal mean rounded to float, and empty
  // cells carry their previous centroid.

  /** Three full-dim Lloyd rounds over CTE `v(vec_id, e)`, starting from
    * `${p}c0`, producing `${p}c3`. `p` prefixes every CTE name so coarse
    * and PQ trainings compose in one WITH. */
  private def lloydRoundsSql(p: String, dim: Int, iters: Int): String =
    (1 to iters).map { r =>
      val prev = s"${p}c${r - 1}"
      s"""${p}a$r AS (
         |  SELECT vec_id, e, cell FROM (
         |    SELECT v.vec_id, v.e, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosSql("v.e", "c.c")} DESC, c.cell ASC) AS rn
         |    FROM v CROSS JOIN $prev c)
         |  WHERE rn = 1),
         |${p}m$r AS (
         |  SELECT cell, g.i AS pos,
         |    CAST(CAST(${graft.functions.ExactAgg.sqlAvg("e[g.i]")} AS FLOAT) AS DOUBLE) AS m
         |  FROM ${p}a$r, generate_series(1, $dim) AS g(i) GROUP BY cell, g.i),
         |${p}c$r AS (
         |  SELECT p.cell, COALESCE(n.c, p.c) AS c
         |  FROM $prev p LEFT JOIN
         |    (SELECT cell, list(m ORDER BY pos) AS c FROM ${p}m$r GROUP BY cell) n
         |  ON p.cell = n.cell)""".stripMargin
    }.mkString(",\n")

  /** Same rounds keyed by subspace over CTE `vs(vec_id, s, e)` — the
    * trainPq replay: every subspace trains independently but in ONE set
    * of CTEs with `s` as an extra key column. */
  private def pqRoundsSql(p: String, sub: Int, iters: Int): String =
    (1 to iters).map { r =>
      val prev = s"${p}c${r - 1}"
      s"""${p}a$r AS (
         |  SELECT vec_id, s, e, cell FROM (
         |    SELECT v.vec_id, v.s, v.e, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
         |        ORDER BY ${cosSql("v.e", "c.c")} DESC, c.cell ASC) AS rn
         |    FROM vs v JOIN $prev c ON v.s = c.s)
         |  WHERE rn = 1),
         |${p}m$r AS (
         |  SELECT s, cell, g.i AS pos,
         |    CAST(CAST(${graft.functions.ExactAgg.sqlAvg("e[g.i]")} AS FLOAT) AS DOUBLE) AS m
         |  FROM ${p}a$r, generate_series(1, $sub) AS g(i) GROUP BY s, cell, g.i),
         |${p}c$r AS (
         |  SELECT p.s, p.cell, COALESCE(n.c, p.c) AS c
         |  FROM $prev p LEFT JOIN
         |    (SELECT s, cell, list(m ORDER BY pos) AS c FROM ${p}m$r GROUP BY s, cell) n
         |  ON p.s = n.s AND p.cell = n.cell)""".stripMargin
    }.mkString(",\n")

  /** Shared PQ search CTEs after `pqc{iters}`: per-(vector, subspace)
    * codes, the reconstructed 64-lane centroid chain per vector (the
    * pqScore kernel walks dot/rn in one in-order fold over exactly this
    * list), plus the query set. */
  private def pqSearchCtes(m: Int, kc: Int, sub: Int, iters: Int): String =
    s"""vs AS (SELECT vec_id, t.i AS s, e[(t.i*$sub+1):((t.i+1)*$sub)] AS e
       |       FROM v, range(0, $m) t(i)),
       |pqc0 AS (SELECT s, CAST(ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS INT) AS cell,
       |                e AS c
       |         FROM (SELECT vec_id, s, e FROM vs WHERE vec_id < $kc)),
       |${pqRoundsSql("pq", sub, iters)},
       |codes AS (
       |  SELECT vec_id, s, cell AS code FROM (
       |    SELECT v.vec_id, v.s, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
       |        ORDER BY ${cosSql("v.e", "c.c")} DESC, c.cell ASC) AS rn
       |    FROM vs v JOIN pqc$iters c ON v.s = c.s)
       |  WHERE rn = 1),
       |recon AS (
       |  SELECT vec_id, flatten(list(c ORDER BY s)) AS r FROM (
       |    SELECT a.vec_id, a.s, c.c
       |    FROM codes a JOIN pqc$iters c ON a.s = c.s AND a.code = c.cell)
       |  GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < $NQ)""".stripMargin

  /** pqScore replayed on the reconstructed chain: one zero-guarded
    * normalized inner product (identical accumulator order). */
  private def pqScoreSql: String =
    """CASE WHEN list_inner_product(r.r, r.r) = 0.0
      |       OR list_inner_product(q.qv, q.qv) = 0.0 THEN 0.0
      |     ELSE list_inner_product(q.qv, r.r)
      |       / (sqrt(list_inner_product(r.r, r.r)) * sqrt(list_inner_product(q.qv, q.qv))) END""".stripMargin

  /** Shortlist → exact-cosine rerank → top-k, the tail every PQ search
    * shares (tie-breaks mirror TopKByScore: score DESC, id ASC). */
  private def rerankTailSql(rerank: Int): String =
    s"""shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id ASC) AS rn
       |    FROM scored)
       |  WHERE rn <= $rerank),
       |rescored AS (
       |  SELECT sl.query_id, sl.neighbor_id, ${cosSql("c.e", "q.qv")} AS cosine
       |  FROM shortlist sl
       |  JOIN v c ON c.vec_id = sl.neighbor_id
       |  JOIN q ON q.query_id = sl.query_id)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM rescored)
       |WHERE rank <= $K""".stripMargin

  // ---- q59: full PQ replay — per-subspace Lloyd + ADC + rerank -------
  private def pqOracleSql: String = {
    val (m, kc, sub, iters, rerank) = (16, 16, 4, 3, 50)
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |${pqSearchCtes(m, kc, sub, iters)},
       |scored AS (
       |  SELECT q.query_id, r.vec_id AS neighbor_id, $pqScoreSql AS score
       |  FROM recon r CROSS JOIN q),
       |${rerankTailSql(rerank)}""".stripMargin
  }

  // ---- q81: IVF-PQ replay — both trainings compose in one WITH -------
  private def ivfPqOracleSql: String = {
    val (m, kc, sub, iters, rerank) = (16, 16, 4, 3, 50)
    val (nlist, nprobe) = (16, 8)
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |ivfc0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS c
       |          FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT $nlist)),
       |${lloydRoundsSql("ivf", 64, iters)},
       |${pqSearchCtes(m, kc, sub, iters)},
       |corpcell AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT v.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${cosSql("v.e", "c.c")} DESC, c.cell ASC) AS rn
       |    FROM v CROSS JOIN ivfc$iters c)
       |  WHERE rn = 1),
       |probe AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosSql("q.qv", "c.c")} DESC, c.cell ASC) AS rn
       |    FROM q CROSS JOIN ivfc$iters c)
       |  WHERE rn <= $nprobe),
       |scored AS (
       |  SELECT probe.query_id, cc.vec_id AS neighbor_id, $pqScoreSql AS score
       |  FROM corpcell cc
       |  JOIN probe ON cc.cell = probe.cell
       |  JOIN recon r ON r.vec_id = cc.vec_id
       |  JOIN q ON q.query_id = probe.query_id),
       |${rerankTailSql(rerank)}""".stripMargin
  }

  // 16-bit PCM sample k of the synthetic wav data chunk (filler bytes
  // 2k and 2k+1, little-endian, two's complement) — the REAL decoder's
  // input replayed closed-form from media_id; shared by the q33 lane-0
  // oracle and the q180 full-statistics oracle.
  private val wavSmp =
    """CASE WHEN ((media_id * 31 + (2 * k) * 7) % 251)
      |          + 256 * ((media_id * 31 + (2 * k + 1) * 7) % 251) >= 32768
      |     THEN ((media_id * 31 + (2 * k) * 7) % 251)
      |          + 256 * ((media_id * 31 + (2 * k + 1) * 7) % 251) - 65536
      |     ELSE ((media_id * 31 + (2 * k) * 7) % 251)
      |          + 256 * ((media_id * 31 + (2 * k + 1) * 7) % 251) END""".stripMargin

  // ---- q180: the wav PCM statistics replayed closed-form -------------
  // Integer sums (list_sum over exact sample ints) cross engines exactly;
  // each float column is one IEEE double divide (and/or one correctly-
  // rounded sqrt) followed by one float round — the BMP-oracle disciplines
  // applied to audio. n = pad // 2 ≥ 100, so the (n-1) denominators never
  // degenerate.
  private def wavPcmOracleSql: String =
    s"""WITH a AS (SELECT CAST(t.i AS BIGINT) AS media_id, 200 + (t.i % 512) AS pad
       |           FROM range(0, 200) t(i) WHERE t.i % 3 = 1),
       |s AS (SELECT media_id, pad, pad // 2 AS n,
       |        list_transform(range(0, pad // 2), k -> $wavSmp) AS smp
       |      FROM a),
       |st AS (SELECT media_id, pad, n, smp,
       |        CAST(list_sum(smp) AS DOUBLE) AS ssum,
       |        CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE) AS ssq,
       |        CAST(list_sum(list_transform(range(1, n), k ->
       |          CASE WHEN (smp[k] < 0) <> (smp[k+1] < 0) THEN 1 ELSE 0 END)) AS DOUBLE) AS zc,
       |        CAST(list_sum(list_transform(range(1, n), k ->
       |          abs(smp[k+1] - smp[k]))) AS DOUBLE) AS ad,
       |        CAST(list_sum(list_transform(smp, x ->
       |          CASE WHEN abs(x) > 16384 THEN 1 ELSE 0 END)) AS DOUBLE) AS loud
       |      FROM s)
       |SELECT media_id, CAST(44 + pad AS INT) AS n_bytes,
       |  CAST(ssum / n AS REAL) AS mean_s,
       |  CAST(sqrt(greatest(ssq / n - (ssum / n) * (ssum / n), 0.0)) AS REAL) AS std_s,
       |  CAST(list_min(smp) AS INT) AS min_s,
       |  CAST(list_max(smp) AS INT) AS max_s,
       |  CAST(sqrt(ssq / n) AS REAL) AS rms,
       |  CAST(zc / (n - 1) AS REAL) AS zcr,
       |  CAST(ad / (n - 1) AS REAL) AS mad,
       |  CAST(loud / n AS REAL) AS loud_frac,
       |  CAST(CAST(n AS DOUBLE) / 16000 AS REAL) AS dur_s,
       |  CAST(n AS INT) AS n_samples
       |FROM st""".stripMargin

  // ---- q181: the MP4 container statistics replayed closed-form -------
  // Sample sizes are 16 + ((id·31 + 7k) % 251) over n = 5 + id%10 frames
  // (the mp4FullBytes builder's formula, pinned in Mp4Spec); integer
  // sums cross engines exactly; each float lane mirrors the Scala op
  // tree — one IEEE double divide (and/or correctly-rounded sqrt), one
  // float round. n_bytes is the builder's 579 + 4n + Σ sizes closed form.
  private def mp4BoxOracleSql: String =
    """WITH v AS (SELECT CAST(t.i AS BIGINT) AS media_id,
      |                  CAST(5 + (t.i % 10) AS BIGINT) AS n,
      |                  64 + (t.i % 8) * 16 AS w
      |           FROM range(0, 200) t(i) WHERE t.i % 3 = 2),
      |s AS (SELECT media_id, n, w,
      |        list_transform(range(0, n),
      |          k -> 16 + ((media_id * 31 + k * 7) % 251)) AS sz
      |      FROM v),
      |st AS (SELECT media_id, n, w, sz,
      |        CAST(list_sum(sz) AS DOUBLE) AS ssum,
      |        CAST(list_sum(list_transform(sz, x -> x * x)) AS DOUBLE) AS ssq
      |      FROM s)
      |SELECT media_id,
      |  CAST(579 + 4 * n + CAST(list_sum(sz) AS BIGINT) AS INT) AS n_bytes,
      |  CAST(n AS INT) AS n_frames,
      |  CAST(CAST(n * 512 AS DOUBLE) / 12800.0 AS REAL) AS dur_s,
      |  CAST(CAST(n AS DOUBLE) / (CAST(n * 512 AS DOUBLE) / 12800.0) AS REAL) AS fps,
      |  CAST(ssum / n AS REAL) AS mean_sz,
      |  CAST(sqrt(greatest(ssq / n - (ssum / n) * (ssum / n), 0.0)) AS REAL) AS std_sz,
      |  CAST(list_min(sz) AS INT) AS min_sz,
      |  CAST(list_max(sz) AS INT) AS max_sz,
      |  CAST(list_sum(sz) AS BIGINT) AS total_sz,
      |  CAST(w AS INT) AS width,
      |  CAST(CAST(n * 40 AS DOUBLE) / 1000.0 AS REAL) AS movie_dur_s
      |FROM st""".stripMargin

  // ---- q183: Motion-JPEG frame decode replayed closed-form -----------
  // The synthetic MJPEG movies are pure functions of media_id: n =
  // 4 + id%6 two-band frames, band colors (id·89 + k·37 + b·151 +
  // ch·101) % 256. The decoded band color is the encoder's clamped
  // block-mean YCbCr pushed through the decoder's rounded YCbCr→RGB —
  // every step one IEEE double op: the 64-add block accumulation replays
  // as the IDENTICAL sequential fold via list_reduce (verified bit-exact
  // against the JVM chain), /64 is an exact exponent shift, and both
  // engines round with floor(x+0.5). A decoder bug anywhere (Huffman DC
  // prediction, dequant, IDCT placement, upsample, color convert, stsc/
  // stco range math) changes a band color or breaks band uniformity and
  // the hash.
  private def mjpegDecodeOracleSql: String = {
    def fold(e: String) =
      s"list_reduce(list_transform(range(0, 64), x_ -> ($e)), (aa, bb) -> aa + bb)"
    def clampI(e: String) =
      s"least(255, greatest(0, CAST(floor(($e) + 0.5) AS INT)))"
    // encoder meanYcc per band b: quantized-plane ints (y, cb, cr)
    def enc(b: Int): Seq[String] = {
      def ch(c: Int) = s"CAST((media_id * 89 + k * 37 + ${b * 151 + c * 101}) % 256 AS INT)"
      val (r, g, bb) = (ch(0), ch(1), ch(2))
      Seq(
        s"0.299::DOUBLE * $r + 0.587::DOUBLE * $g + 0.114::DOUBLE * $bb",
        s"-0.168736::DOUBLE * $r - 0.331264::DOUBLE * $g + 0.5::DOUBLE * $bb + 128.0",
        s"0.5::DOUBLE * $r - 0.418688::DOUBLE * $g - 0.081312::DOUBLE * $bb + 128.0")
        .map(t => clampI(s"${fold(t)} / 64.0"))
    }
    // decoder YCbCr→RGB from the integer planes of band b (suffix s)
    def dec(s: String): Seq[String] = {
      val (y, cb, cr) =
        (s"CAST(y$s AS DOUBLE)",
          s"(CAST(cb$s AS DOUBLE) - 128.0)", s"(CAST(cr$s AS DOUBLE) - 128.0)")
      Seq(
        clampI(s"$y + 1.402::DOUBLE * $cr"),
        clampI(s"$y - 0.344136::DOUBLE * $cb - 0.714136::DOUBLE * $cr"),
        clampI(s"$y + 1.772::DOUBLE * $cb"))
    }
    val Seq(y0, cb0, cr0) = enc(0)
    val Seq(y1, cb1, cr1) = enc(1)
    val Seq(rl, gl, bl) = dec("0")
    val Seq(rr, gr, br) = dec("1")
    s"""WITH v AS (SELECT CAST(t.i AS BIGINT) AS media_id,
       |                  CAST(4 + (t.i % 6) AS BIGINT) AS n,
       |                  CAST(64 + (t.i % 8) * 16 AS INT) AS w
       |           FROM range(0, 120) t(i)),
       |f AS (SELECT media_id, w, CAST(unnest(range(0, n)) AS BIGINT) AS k FROM v),
       |e AS (SELECT media_id, w, k,
       |        $y0 AS y0, $cb0 AS cb0, $cr0 AS cr0,
       |        $y1 AS y1, $cb1 AS cb1, $cr1 AS cr1
       |      FROM f)
       |SELECT media_id, CAST(k AS INT) AS frame_index,
       |  CAST(k * 40 AS BIGINT) AS frame_ts_ms,
       |  w AS width, CAST(32 AS INT) AS height,
       |  CAST($rl AS INT) AS rl, CAST($gl AS INT) AS gl, CAST($bl AS INT) AS bl,
       |  CAST($rr AS INT) AS rr, CAST($gr AS INT) AS gr, CAST($br AS INT) AS br
       |FROM e""".stripMargin
  }

  // ---- q33: media feature extraction replayed end to end -------------
  // Every payload byte is deterministic (real container headers from the
  // same byte builders the table generator runs, filler closed-form from
  // media_id), so BOTH decode paths replay in DuckDB:
  //  - stub rows: the FNV-rolling float accumulation — lane 0 takes a
  //    term at every 16th byte from the CURRENT 64-bit hash state. Each
  //    boundary hash is a plain scalar list_reduce over the byte prefix
  //    (HUGEINT mod 2⁶⁴), and the float32 accumulation is emulated with
  //    CAST(a + b AS REAL): a float add's exact sum always fits a double,
  //    so double-add-then-round equals the kernel's float add bit-for-bit
  //    (and k/65535 was checked exhaustively for double-rounding — zero
  //    of 65536 values differ).
  //  - BMP rows: the REAL pixel decoder's lane 0 is the B-channel mean —
  //    an exact integer sum over the closed-form filler pixels, one IEEE
  //    divide, one float round.
  private def mediaFeatureOracleSql: String = {
    import graft.operators.Multimodal
    val rows = (0 until 200).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val pad = 200 + (i % 512)
      val w = 64 + (i % 8) * 16
      // header = the builder's real bytes minus the filler tail; wav
      // headers embed pad-dependent size fields, so build with the REAL
      // pad and strip, rather than building with pad = 0. BMP/PNG/WAV
      // rows decode for REAL, so their branches replay the decoded
      // statistics closed-form and need no header literal.
      val branch = kind match {
        case "image" => ((i / 3) % 4) match {
          case 0 => "png"
          case 2 => "gif"
          case 3 => "bmp"
          case _ => "stub"
        }
        case "audio" => "wav"
        case _ => "mp4"
      }
      branch match {
        case "bmp" =>
          s"($i::BIGINT, '$kind', NULL::BIGINT[], ${((w * 3 + 3) / 4) * 4 * 64}, 'bmp', $w)"
        case "png" =>
          s"($i::BIGINT, '$kind', NULL::BIGINT[], 0, 'png', $w)"
        case "gif" =>
          s"($i::BIGINT, '$kind', NULL::BIGINT[], 0, 'gif', $w)"
        case "wav" =>
          s"($i::BIGINT, '$kind', NULL::BIGINT[], $pad, 'wav', $w)"
        case "mp4" =>
          s"($i::BIGINT, '$kind', NULL::BIGINT[], $pad, 'mp4', $w)"
        case _ =>
          val payload = Multimodal.jpegBytes(w, 64, pad, i)
          val hdr = payload.dropRight(pad).map(_ & 0xff).mkString("[", ",", "]")
          s"($i::BIGINT, '$kind', $hdr::BIGINT[], $pad, 'stub', $w)"
      }
    }.mkString(",\n")
    val hfold = s"(acc, x) -> ${HashOracleSql.wmul("xor(acc, x)", 1099511628211L)}"
    val term =
      s"CAST(CAST((list_reduce(list_prepend(-3750763034362895579::BIGINT, " +
        s"bytes[1:(16*m+1)]), $hfold) >> 16) & 65535 AS REAL) / 65535.0::REAL AS REAL)"
    s"""WITH meta(media_id, kind, hdr, pad, branch, w) AS (VALUES
       |$rows),
       |full_bytes AS (
       |  SELECT media_id, kind, pad, w,
       |    list_concat(hdr, list_transform(range(0, pad),
       |      j -> (media_id * 31 + j * 7) % 251))::BIGINT[] AS bytes
       |  FROM meta WHERE branch = 'stub'),
       |stub AS (
       |  SELECT media_id, kind, CAST(len(bytes) AS INT) AS n_bytes, CAST(16 AS INT) AS dim,
       |    list_reduce(
       |      list_transform(range(0, (len(bytes) + 15) // 16), m -> $term),
       |      (a, b) -> CAST(a + b AS REAL)) AS f0
       |  FROM full_bytes),
       |bmp AS (
       |  SELECT media_id, kind, CAST(54 + pad AS INT) AS n_bytes, CAST(16 AS INT) AS dim,
       |    CAST(list_sum(flatten(list_transform(range(0, 64),
       |           y -> list_transform(range(0, w),
       |             x -> (media_id * 31 + (y * (((w * 3 + 3) // 4) * 4) + x * 3) * 7) % 251))))::DOUBLE
       |         / (w * 64)::DOUBLE AS REAL) AS f0
       |  FROM meta WHERE branch = 'bmp'),
       |wav AS (
       |  SELECT media_id, kind, CAST(44 + pad AS INT) AS n_bytes, CAST(16 AS INT) AS dim,
       |    CAST(CAST(list_sum(list_transform(range(0, pad // 2), k ->
       |           $wavSmp)) AS DOUBLE)
       |         / CAST(pad // 2 AS DOUBLE) AS REAL) AS f0
       |  FROM meta WHERE branch = 'wav'),
       |png AS (
       |  SELECT media_id, kind,
       |    CAST(64 * (1 + 3 * w) + 68 AS INT) AS n_bytes, CAST(16 AS INT) AS dim,
       |    CAST(CAST(list_sum(list_transform(range(0, w * 64), p ->
       |           (media_id * 31 + (3 * p + 2) * 7) % 251)) AS DOUBLE)
       |         / (w * 64)::DOUBLE AS REAL) AS f0
       |  FROM meta WHERE branch = 'png'),
       |gif AS (
       |  SELECT media_id, kind,
       |    -- closed-form LZW stream size: npix literals + one CLEAR per
       |    -- 254 + EOI, 9 bits each, packed, split into <=255B sub-blocks
       |    CAST(794 + (9 * (w * 64 + (w * 64 + 253) // 254 + 1) + 7) // 8
       |      + ((9 * (w * 64 + (w * 64 + 253) // 254 + 1) + 7) // 8 + 254) // 255
       |      AS INT) AS n_bytes,
       |    CAST(16 AS INT) AS dim,
       |    CAST(CAST(list_sum(list_transform(range(0, w * 64), p ->
       |           (((media_id * 31 + p * 7) % 251) * 31) % 256)) AS DOUBLE)
       |         / (w * 64)::DOUBLE AS REAL) AS f0
       |  FROM meta WHERE branch = 'gif'),
       |mp4 AS (
       |  -- REAL container parse: lane 0 is the stsz frame count; file
       |  -- length is the builder's closed form 579 + 4n + Σ sizes
       |  SELECT media_id, kind,
       |    CAST(579 + 4 * n + list_sum(list_transform(range(0, n),
       |           k -> 16 + ((media_id * 31 + k * 7) % 251))) AS INT) AS n_bytes,
       |    CAST(16 AS INT) AS dim,
       |    CAST(n AS REAL) AS f0
       |  FROM (SELECT media_id, kind, CAST(5 + (media_id % 10) AS BIGINT) AS n
       |        FROM meta WHERE branch = 'mp4'))
       |SELECT * FROM stub UNION ALL SELECT * FROM bmp
       |UNION ALL SELECT * FROM wav UNION ALL SELECT * FROM png
       |UNION ALL SELECT * FROM gif UNION ALL SELECT * FROM mp4""".stripMargin
  }

  // ---- q40: full IVF replay, Lloyd training unrolled as CTEs ---------
  // trainIvfCentroids is engine-invariant by construction (smallest-id
  // exemplar init, first-max-wins cosine argmax, ExactAgg decimal means
  // rounded to float), so the oracle replays the ENTIRE index build —
  // three k-means rounds as chained CTEs, empty cells carrying their
  // previous centroid — then the corpus assignment, the nprobe-cell
  // probe, and the exact-cosine rerank, all on ops already pinned
  // bit-exact by q30/q53. Assumes corpus ≤ the trainer's sampleN
  // (holds at every verification SF; at production scale the persisted
  // index path is the contract, not this replay).
  private def ivfOracleSql: String = {
    val (nlist, iters, nprobe, dim) = (16, 3, 4, 64)
    def cellAssign(cents: String, out: String, extra: String, rnCap: String): String =
      s"""$out AS (
         |  SELECT vec_id, e, cell FROM (
         |    SELECT v.vec_id, v.e, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosSql("v.e", "c.c")} DESC, c.cell ASC) AS rn
         |    FROM v CROSS JOIN $cents c $extra)
         |  WHERE rn $rnCap)""".stripMargin
    val rounds = (1 to iters).map { r =>
      val prev = s"c${r - 1}"
      cellAssign(prev, s"a$r", "", "= 1") + ",\n" +
        s"""m$r AS (
           |  SELECT cell, g.i AS pos,
           |    CAST(CAST(${graft.functions.ExactAgg.sqlAvg("e[g.i]")} AS FLOAT) AS DOUBLE) AS m
           |  FROM a$r, generate_series(1, $dim) AS g(i) GROUP BY cell, g.i),
           |c$r AS (
           |  SELECT p.cell, COALESCE(n.c, p.c) AS c
           |  FROM $prev p LEFT JOIN
           |    (SELECT cell, list(m ORDER BY pos) AS c FROM m$r GROUP BY cell) n
           |  ON p.cell = n.cell)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS c
       |       FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT $nlist)),
       |$rounds,
       |corp AS (
       |  SELECT vec_id AS neighbor_id, e AS cv, cell FROM (
       |    SELECT v.vec_id, v.e, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${cosSql("v.e", "c.c")} DESC, c.cell ASC) AS rn
       |    FROM v CROSS JOIN c$iters c)
       |  WHERE rn = 1),
       |probe AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT v.vec_id AS query_id, v.e AS qv, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${cosSql("v.e", "c.c")} DESC, c.cell ASC) AS rn
       |    FROM v CROSS JOIN c$iters c WHERE v.vec_id < $NQ)
       |  WHERE rn <= $nprobe),
       |j AS (SELECT probe.query_id, corp.neighbor_id,
       |        ${cosSql("corp.cv", "probe.qv")} AS cosine
       |      FROM corp JOIN probe ON corp.cell = probe.cell)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM j)
       |WHERE rank <= $K""".stripMargin
  }
}
