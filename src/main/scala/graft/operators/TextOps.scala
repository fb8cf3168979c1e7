package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Text-analysis operators for a training-data pipeline: tokenization,
  * token counting (whitespace + BPE-ish regex), quality scoring, n-gram
  * language identification, and document fingerprinting. All built from
  * codegen'd Catalyst expressions (no UDFs), so they stay inside
  * whole-stage codegen and scale linearly with input bytes.
  */
object TextOps {

  /** Whitespace tokens; empty / all-space text → empty array (split would
    * yield [""] — normalized here so token counts are honest zeros). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Sentence segmentation with stable positions: split on terminator
    * runs ([.!?]+), keep the 0-based split index as `sent_id` (so ids
    * survive the empty-segment filter identically in any engine), trim,
    * drop empties. Per-row generator work — shuffle-free, the row-count
    * expansion step before sentence-level chunking/scoring. Terminator
    * splitting is deliberately regex-simple (no lookbehind): RE2-class
    * engines (DuckDB) can mirror it exactly. */
  def sentences(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), "[.!?]+")).as(Seq("sent_id", "raw")))
      .withColumn("sentence", trim(col("raw")))
      .filter(length(col("sentence")) > 0)
      .select(col(idCol), col("sent_id"), col("sentence"),
        tokenCount(col("sentence")).as("n_tokens"))

  /** BPE-style pre-tokenizer count: letter runs, digit runs, and single
    * punctuation each count as one piece — the standard approximation of
    * GPT-2-family pre-tokenization without a vocab. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpePattern))

  /** Heuristic quality score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·(distinct tokens / tokens) +
    * 0.3·min(1, 5·stopwords/tokens). Deterministic double arithmetic —
    * mirrored exactly by the DuckDB oracle in TextQueries. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  def qualityScore(text: Column): Column = {
    val t = tokens(lower(text))
    val n = size(t)
    // codegen'd kernel, not filter+isin: higher-order filter is a
    // CodegenFallback whose lambda interprets per token (profiled hot)
    val stop = GraftFunctions.token_set_count(t, stopwords)
    when(n === 0, lit(0.0)).otherwise(
      lit(0.4) * least(lit(1.0), n / lit(100.0)) +
        lit(0.3) * (size(array_distinct(t)) / n.cast("double")) +
        lit(0.3) * least(lit(1.0), lit(5.0) * stop / n.cast("double")))
  }

  /** Small public stopword profiles per language (top function words). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"))

  /** n-gram/stopword language ID: score = profile-token hits per token;
    * CJK character ratio short-circuits to "zh"; ties and no-hit default
    * to "und". Struct-max keeps the whole argmax inside codegen. */
  def langId(text: Column): Column = {
    val t = tokens(lower(text))
    val n = greatest(size(t), lit(1)).cast("double")
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        (GraftFunctions.token_set_count(t, words) / n).as("score"),
        lit(lang).as("lang"))
    }
    // greatest() over (score, lang) structs = lexicographic argmax, the
    // semantics the DuckDB oracle mirrors with list_sort. When used as a
    // GROUPING expression this evaluates interpreted (measured ~0.2 ms/row
    // — an array-argmax reformulation measured slower still, since the
    // aggregate path gives grouping keys no subexpression reuse); as a
    // projected value it codegens fine. Linear in bytes either way.
    val best = greatest(scored: _*)
    val cjk = regexp_count(text, lit("[\\u4e00-\\u9fff]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")
    when(cjk > 0.3, lit("zh"))
      .when(best.getField("score") > 0.0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** FNV-1a rolling-hash document fingerprint (custom codegen'd
    * expression). */
  def fingerprint(text: Column): Column = GraftFunctions.rolling_fingerprint(text)

  /** PII scrub patterns — deliberately engine-portable regex (no
    * lookaround, no backreferences), so the same pattern text runs under
    * Java regex (Spark codegen) and RE2-family engines identically. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails and IPv4 addresses with typed placeholders; pure
    * per-row regexp_replace chain — codegen'd, shuffle-free, linear in
    * bytes (the shape of a 100 TB scrubbing pass). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "[EMAIL]"),
      ipv4Pattern, "[IP]")

  def piiEmailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def piiIpCount(text: Column): Column = regexp_count(text, lit(ipv4Pattern))

  /** Benchmark-contamination check (GPT-3-style n-gram overlap): for each
    * non-benchmark document, the fraction of its distinct word k-grams
    * that appear anywhere in the benchmark documents (`benchFilter`
    * selects those). The benchmark gram set is inherently small (eval
    * sets are MBs against a 100 TB corpus), so membership is a broadcast
    * left join — map-side only; the single shuffle is the per-document
    * count aggregation. Output: (idCol, n_grams, n_contaminated,
    * contamination).
    *
    * Grams travel as distinct 64-bit rolling hashes
    * ([[graft.functions.HashKernels.shingleHashes]]; 8 bytes each), not
    * k-token strings (~k× the document bytes): membership is the only
    * thing probed, so the explode, the broadcast set, and the join keys
    * all shrink by roughly the gram length. A doc with fewer than k
    * tokens is its own single gram; a token-empty doc contributes one
    * sentinel gram (mirroring the "" gram of the string formulation), so
    * every input doc stays present in the output. Cross-doc hash
    * collisions (~n²/2⁶⁴) are the standard accepted trade. */
  def contamination(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      benchFilter: Column,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    val grams = docs
      .select(col(idCol), benchFilter.as("is_bench"), tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("is_bench"),
        explode(
          when(size(col("toks")) === 0, array(lit(Long.MinValue)))
            .otherwise(GraftFunctions.shingle_hashes(col("toks"), k))).as("gram"))
    val bench = grams.filter(col("is_bench"))
      .select(col("gram")).distinct().withColumn("hit", lit(1))
    grams.filter(!col("is_bench"))
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_contaminated"))
      .withColumn("contamination", col("n_contaminated") / col("n_grams"))
  }

  /** Within-document repetition (C4-style quality signal): 1 − distinct/
    * total word k-grams. Pure per-row array expressions — no shuffle,
    * fully codegen'd. Output: (idCol, n_grams, n_distinct, repetition). */
  def repetitionStats(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), Dedup.shinglesAll("toks", k).as("grams"))
      .select(col(idCol),
        size(col("grams")).as("n_grams"),
        size(array_distinct(col("grams"))).as("n_distinct"))
      .withColumn("repetition", lit(1.0) - col("n_distinct") / col("n_grams"))

  /** Token-window document chunking — the context-length splitting pass
    * that precedes tokenization-and-packing in a training pipeline.
    * Chunk `c` covers tokens `[c·step, c·step + width)`; with
    * `step < width` consecutive chunks overlap by `width − step` tokens.
    * Chunk starts run to the last token, so trailing chunks may be
    * shorter than `width` (never empty). Pure per-row explode +
    * array-slice — shuffle-free, codegen'd, embarrassingly parallel;
    * token-empty documents produce no chunks. */
  def chunkByTokens(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      step: Int): org.apache.spark.sql.DataFrame = {
    require(width > 0 && step > 0, s"width=$width and step=$step must be positive")
    docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(step)))
          .as(Seq("chunk_id", "start")))
      .select(col(idCol), col("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(width)).as("chunk_toks"))
      .select(col(idCol), col("chunk_id"),
        size(col("chunk_toks")).as("n_tok"),
        array_join(col("chunk_toks"), " ").as("chunk"))
  }
}
