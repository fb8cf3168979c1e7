package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg._
import graft.operators.{Dedup, TextOps}
import graft.util.SparkUtil.table

/** Text-analysis + dedup queries over the `documents` table. Scalar text
  * math (token counts, quality score) is mirrored exactly in DuckDB SQL;
  * hash-based operators (fingerprint, minhash, simhash) have no SQL
  * equivalent and are verified by planted-duplicate ScalaTest specs
  * instead (rows-only driver check).
  */
object TextQueries {

  private val stopIn = TextOps.stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** q186's synthesized-markup template, shared verbatim by the Spark
    * query and the DuckDB oracle (Left = literal markup, Right = a
    * documents column spliced in as text): head noise that must die
    * (title tag, style, script whose body contains `<`, `&&` and a
    * quoted string), a comment, block + inline body tags, every entity
    * the [[TextOps.htmlTextSteps]] subset decodes, entity-ENCODED markup
    * that must stay literal text, an unclosed inline element, and a
    * trailing unclosed script that swallows to end of input. One shared
    * structure ⇒ the two engines strip byte-identical inputs. */
  private val htmlParts: Seq[Either[String, String]] = Seq(
    Left("<!DOCTYPE html><html lang=\"en\"><head><title>Doc "),
    Right("doc_id"),
    Left(" :: corpus</title><style type=\"text/css\">body { margin: 0 }" +
      "</style><script>var docId = "),
    Right("doc_id"),
    Left("; track(docId && docId < 9, \"x>y\");</script></head>" +
      "<body><!-- begin doc "),
    Right("doc_id"),
    Left(" --><h1 class=\"hd\">Doc &quot;"),
    Right("doc_id"),
    Left("&quot;</h1><p>"),
    Right("text"),
    Left("</p><div id=\"meta\">source &#38; lang: "),
    Right("source"),
    Left(" / "),
    Right("lang"),
    Left("</div><ul><li>chars: "),
    Right("n_chars"),
    Left("&nbsp;total</li><li>tail &lt;b&gt;marked&#39;up&lt;/b&gt;" +
      // hex spellings (mixed case), the ampersand no-redecode corner
      // (&#x26;amp; must yield the literal text `&amp;`), and a
      // zero-padded numeric that stays literal by contract
      "</li><li>hex &#x3C;q&#X3E; mix&#xA0;&#x26;amp; &#x27;pad&#x03C;" +
      // named Latin-1 subset corners (VERDICT r16 item 6): decoded
      // pairs (mdash/rsquo/copy/eacute/frac12), the amp-shielded
      // no-redecode corner (&amp;mdash; -> literal `&mdash;`), a
      // case-mismatch (&COPY; stays literal) and an out-of-subset
      // name (&zwnj; stays literal)
      "</li><li>dash&mdash;here it&rsquo;s &copy; caf&eacute; " +
      "&frac12; off &amp;mdash; &COPY; &zwnj;" +
      "</li></ul><p>unclosed <em>emphasis</body></html><script>leak()"))

  private def partsSql(parts: Seq[Either[String, String]]): String =
    parts.map {
      case Left(s) => "'" + s.replace("'", "''") + "'"
      case Right(c) => s"CAST($c AS VARCHAR)"
    }.mkString(" || ")

  private def partsCol(
      parts: Seq[Either[String, String]]): org.apache.spark.sql.Column =
    concat(parts.map {
      case Left(s) => lit(s)
      case Right(c) => col(c).cast("string")
    }: _*)

  private def htmlMarkupSql: String = partsSql(htmlParts)
  private def htmlMarkupCol: org.apache.spark.sql.Column = partsCol(htmlParts)

  /** q191's link-bearing markup template (VERDICT r15 item 1), shared
    * by the Spark query and the oracle like [[htmlParts]]. One anchor
    * per extraction/classification corner: a double-quoted absolute
    * http link (cross-page, same site), an UPPERCASE single-quoted
    * absolute link to a ccSLD partner domain, an unquoted-rel nofollow
    * relative anchor and a double-quoted multi-token
    * `rel="nofollow sponsored"` absolute anchor (both dropped — no
    * edge), a plain unquoted relative href (→ base-domain edge on
    * even doc_ids, self-edge otherwise), a fragment-only href and an
    * empty href (no edge), mailto: and javascript: schemes (no edge),
    * a no-href anchor, and a protocol-relative CDN link. Even doc_ids
    * carry a `<base href>` naming another host (the `bt` column);
    * odd ones have an empty head — both base branches stay exercised.
    * The `bt`/`next_id`/`p5`/`p3` columns are pre-projected
    * identically on both engines. */
  private val linkParts: Seq[Either[String, String]] = Seq(
    Left("<html><head>"), Right("bt"),
    Left("</head><body><p>See <a href=\"https://"),
    Right("lang"), Left("."), Right("source"), Left("press.com/docs/"),
    Right("next_id"),
    Left("\">next</a> now</p><A CLASS='x' HREF='https://partner"),
    Right("p5"),
    Left(".co.uk/landing?ref="), Right("source"),
    Left("'>partner</A><a rel=nofollow href=/local/"), Right("doc_id"),
    Left(".html>self</a><a href=/p/"), Right("doc_id"),
    Left(">rel</a><a rel=\"nofollow sponsored\" href=\"https://ads"),
    Right("p3"),
    Left(".example.com/buy\">ad</a><a href=\"#top\">top</a>" +
      "<a href=\"\">empty</a>" +
      "<a href=\"mailto:ed@example.com\">mail</a>" +
      "<a href=\"javascript:void(0)\">js</a><a name=\"x\">nohref</a>" +
      "<a href=\"//cdn"),
    Right("p3"),
    Left(".static-example.net/lib.js\">cdn</a></body></html>"))

  /** The q191/q193 page table: each document's own URL + its
    * [[linkParts]] markup, with the template's derived columns
    * pre-projected (mirrored verbatim in the oracle's `d` CTE). */
  private def linkPages(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents").select(
      col("doc_id"), col("lang"), col("source"),
      (col("doc_id") + 1).as("next_id"),
      (col("doc_id") % 5).as("p5"),
      (col("doc_id") % 3).as("p3"),
      when(col("doc_id") % 2 === 0,
        concat(lit("<base href=\"https://mirror"),
          (col("doc_id") % 5).cast("string"),
          lit(".basehost.org/\">")))
        .otherwise(lit("")).as("bt"))
    d.select(
      concat(lit("https://"), col("lang"), lit("."), col("source"),
        lit("press.com/docs/"), col("doc_id").cast("string")).as("url"),
      partsCol(linkParts).as("markup"))
  }

  /** The q191 oracle's CTE chain up to the filtered edge relation `e`
    * — shared verbatim by the q193/q198 oracles, which stack the
    * unrolled PageRank rounds on top of the same edges. Relative links
    * resolve against the page's base-href domain when one names a
    * host, else the page's own domain (the domainLinkEdges rule). */
  private def linkEdgeCtes: String =
    s"""d AS (SELECT doc_id, lang, source,
       |    doc_id + 1 AS next_id, doc_id % 5 AS p5, doc_id % 3 AS p3,
       |    CASE WHEN doc_id % 2 = 0
       |      THEN '<base href="https://mirror' ||
       |        CAST(doc_id % 5 AS VARCHAR) || '.basehost.org/">'
       |      ELSE '' END AS bt
       |  FROM documents),
       |m AS (SELECT
       |    ${TextOps.registrableDomainSql(TextOps.urlHostSql(
             "'https://' || lang || '.' || source || 'press.com/docs/' " +
               "|| CAST(doc_id AS VARCHAR)"))} AS src_domain,
       |    ${partsSql(linkParts)} AS markup
       |  FROM d),
       |mb AS (SELECT src_domain, markup,
       |    ${TextOps.baseHrefDomainSql("markup")} AS base_domain
       |  FROM m),
       |l AS (SELECT src_domain, base_domain,
       |    unnest(${TextOps.extractLinksSql("markup")}) AS href
       |  FROM mb),
       |e0 AS (SELECT src_domain,
       |    ${TextOps.linkDomainSql("href",
             "(CASE WHEN base_domain IS NOT NULL AND base_domain <> '' " +
               "THEN base_domain ELSE src_domain END)")} AS dst_domain
       |  FROM l),
       |e AS (SELECT src_domain, dst_domain FROM e0
       |  WHERE dst_domain IS NOT NULL AND dst_domain <> ''
       |    AND src_domain <> '')""".stripMargin

  /** q187's homoglyph alphabet: Latin chars and the Cyrillic codepoints
    * [[TextOps.unicodeCanonSteps]]'s confusable table folds back —
    * `translate` over these pairs manufactures the script-level
    * near-dup. Explicit \u escapes (same rationale as the table). */
  private val homoglyphLatin = "aeopcyx"
  private val homoglyphCyrillic =
    "\u0430\u0435\u043e\u0440\u0441\u0443\u0445"

  // q96 Count-Min parameters: the bucket family is the md5-hex-prefix
  // value mod width, seeded by appending "#<row>" — pure string/hash
  // expressions DuckDB replays verbatim (same trick as q93's sample
  // order), so sketch counters and estimates hash-match cross-engine.
  private val cmDepth = 4
  private val cmWidth = 512
  private val cmProbes = TextOps.stopwords.take(8)
  private def cmBucket(term: org.apache.spark.sql.Column, i: Int) =
    conv(substring(md5(concat(term, lit("#" + i))), 1, 8), 16, 10)
      .cast("long") % cmWidth

  /** The DuckDB replay of BPE training (q192/q197 and the learned-vocab
    * audits): the same `rounds` greedy rounds unrolled as CTE chains —
    * per round a pair-count CTE, a 1-row best-pair CTE (same
    * count-then-pair tie order), and a LEFT JOIN ON TRUE merge
    * application (the no-pair fixed point passes seqs through on both
    * engines). The wrapped-seq construction mirrors the Spark
    * expression char for char; only the regex replacement spelling
    * differs (`\\1` vs `$$1` — RE2 vs Java backreference syntax, same
    * semantics). `keys` are carried through the chain for the caller's
    * final aggregate (doc_id for q192/q197, source for q149, none for
    * q154). The seq CTEs are MATERIALIZED: each s-CTE is referenced
    * twice (pair count + merge application), so DuckDB's
    * inline-by-default expansion is 2^rounds — exponential past ~8
    * rounds — while materialization keeps the replay linear, exactly
    * like the Spark side's per-round localCheckpoint. */
  private def bpeRoundCtes(rounds: Int, keys: Seq[String]): String = {
    val k = keys.map(_ + ", ").mkString
    val prep =
      s"""s0 AS MATERIALIZED (SELECT $k
         |    substring('|' || regexp_replace(w, '(.)', '\\1| |', 'g'),
         |      1, 4*length(w)-1) AS seq,
         |    CAST(length(w) AS BIGINT) AS n0
         |  FROM (SELECT $k
         |          unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |        FROM documents))""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"s${r - 1}"
      val carried = (1 until r).map(i => s", p$i").mkString
      s"""pr$r AS (SELECT parts[i] || ' ' || parts[i+1] AS pair
         |  FROM (SELECT string_split(seq, ' ') AS parts,
         |               unnest(range(1, len(string_split(seq, ' ')))) AS i
         |        FROM $prev)),
         |b$r AS (SELECT pair AS p$r FROM (
         |    SELECT pair, COUNT(1) AS c FROM pr$r GROUP BY pair)
         |  ORDER BY c DESC, pair ASC LIMIT 1),
         |s$r AS MATERIALIZED (SELECT ${k}n0$carried, p$r,
         |    CASE WHEN p$r IS NULL THEN seq
         |         ELSE replace(seq, p$r, replace(p$r, '| |', '')) END AS seq
         |  FROM $prev LEFT JOIN b$r ON TRUE)""".stripMargin
    }
    s"$prep,\n${roundCtes.mkString(",\n")}"
  }

  private def bpeOracleSql(rounds: Int): String = {
    val mergesExpr =
      (1 to rounds).map(r => s"coalesce(p$r, '')").mkString(" || ';' || ")
    s"""WITH ${bpeRoundCtes(rounds, Seq("doc_id"))}
       |SELECT doc_id,
       |  CAST(COUNT(1) AS BIGINT) AS n_words,
       |  CAST(SUM(n0) AS BIGINT) AS n_syms0,
       |  CAST(SUM(len(string_split(seq, ' '))) AS BIGINT) AS n_syms,
       |  CAST(SUM(CAST(concat('0x', substr(md5(seq), 1, 8)) AS BIGINT))
       |    AS BIGINT) AS fp,
       |  min($mergesExpr) AS merges
       |FROM s$rounds GROUP BY doc_id""".stripMargin
  }

  /** The learned-vocab symbol stream as a CTE suffix: the trained
    * rounds replayed, then one row per post-merge symbol (column `w`)
    * with `keys` carried — the oracle-side analog of
    * [[graft.operators.BpeStore.symbols]]. */
  private def bpeSymbolCtes(rounds: Int, keys: Seq[String]): String = {
    val k = keys.map(_ + ", ").mkString
    s"""${bpeRoundCtes(rounds, keys)},
       |sym AS (SELECT ${k}unnest(string_split(seq, ' ')) AS w
       |  FROM s$rounds)""".stripMargin
  }

  /** Built dedup-index artifact dirs, keyed by dataset dir — the
    * persisted-index lifecycle for q184 (the dedup analog of
    * SimilarityQueries' ivfIndex/pqIndex caches): ONE build job per
    * corpus snapshot signs the corpus (doc_id % 10 != 0) with q52's
    * parameters and persists bands + shingles + meta; every probe after
    * that reads the artifacts. */
  private val dedupIndex =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def dedupIndexPath(s: SparkSession, dir: String): String =
    dedupIndex.getOrElseUpdate(dir, {
      val path = java.nio.file.Files
        .createTempDirectory("graft-dedup-index").toString
      // reaped at JVM exit — repeated bench runs were accumulating
      // index parquet under /tmp (ADVICE r10)
      graft.util.SparkUtil.deleteDirOnExit(path)
      graft.operators.DedupIndexStore.build(
        table(s, dir, "documents").filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", path, k = 2, numHashes = 32, bands = 16)
      path
    })

  /** Trained BPE merge artifacts, keyed by dataset dir — the tokenizer
    * train-once / apply-many lifecycle for q197 and the learned-vocab
    * audits (q149/q154): ONE training job per corpus snapshot persists
    * the [[graft.operators.BpeStore]] merge list; every apply/audit
    * after that loads the artifact (k string literals) and never
    * re-trains. 16 rounds — twice the inline operator's 8-round plan
    * cap, exercising exactly the depth the driver-loop store exists
    * for (the 64-round regime is pinned in BpeStoreSpec; the oracle
    * replay is linear in rounds via MATERIALIZED CTEs, so 16 keeps the
    * correctness gate fast). */
  val bpeStoreRounds = 16

  private val bpeStore =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def bpeStorePath(s: SparkSession, dir: String): String =
    bpeStore.getOrElseUpdate(dir, {
      val path = java.nio.file.Files
        .createTempDirectory("graft-bpe-merges").toString
      graft.util.SparkUtil.deleteDirOnExit(path)
      graft.operators.BpeStore.train(
        graft.util.SparkUtil.fanOutForCpu(
          table(s, dir, "documents"), "doc_id"),
        "text", bpeStoreRounds, path)
      path
    })

  /** q199's pre-packing ladder — markup → htmlText →
    * stripBoilerplateLines → removeDuplicateSpans → q44 keep-filter →
    * chunkByTokens, with lang joined back — as ONE lazy composed plan:
    * every stage is a pure DataFrame transform, nothing here launches a
    * job (PlanShapeSpec pins that on both variants; the registered
    * q199 adds only groupedCumSum's documented tail materialization).
    *
    * `stageCache` (the default, what q199 registers): each stage
    * boundary is an executor-side materialization (`localCheckpoint` —
    * the q193-edges pattern; nothing ever lands on the driver, and
    * under AQE the boundary's stages run at construction like the
    * repo's other eager-checkpoint operators). The boilerplate, span,
    * and filter stages each consume their input 2-5 times (frequency
    * aggregate + membership join + reassembly + row-keeping joins), so
    * WITHOUT the boundaries the consumers multiply: the extraction
    * chain alone re-executes ~24× (measured 13 s at sf0.1 vs ~2 s
    * cached). `stageCache = false` keeps the single pure plan tree —
    * the declarative artifact PlanShapeSpec audits for zero
    * construction jobs, the Generate boundaries, and the
    * chain-copy-per-operator invariant (a checkpoint boundary hides
    * upstream plan structure). */
  private[graft] def webToSequencesLadder(
      s: SparkSession, dir: String,
      stageCache: Boolean = true): DataFrame = {
    def stage(df: DataFrame): DataFrame =
      if (stageCache) df.localCheckpoint(false) else df
    val docs = graft.util.SparkUtil.fanOutForCpu(
      table(s, dir, "documents"), "doc_id")
    val extracted = stage(docs
      .select(col("doc_id"), TextOps.htmlText(htmlMarkupCol).as("x0"))
      // the q188 Generate boundary: evaluate the ~25-pass chain once
      // per row into an attribute before the multi-consumer stages
      .select(col("doc_id"), explode(array(col("x0"))).as("x")))
    val deBoilered = stage(TextOps.stripBoilerplateLines(
      extracted, "doc_id", "x", maxDocFreq = 10)
      .select(col("doc_id"), col("clean_text")))
    val deSpanned = stage(TextOps.removeDuplicateSpans(
      deBoilered, "doc_id", "clean_text", k = 5, maxDocFreq = 1)
      .select(col("doc_id"), col("clean_text").as("text")))
    val kept = filterPipeline(deSpanned)
      .filter(col("keep")).select(col("doc_id"))
    val chunks = TextOps.chunkByTokens(
      deSpanned.join(kept, Seq("doc_id")), "doc_id", "text",
      width = 32, step = 24)
    chunks.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("chunk_id"), col("lang"), col("n_tok"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: rank within identical-content groups.
    "q20_dedup_exact" -> ((s, dir) =>
      Dedup.exactDuplicates(table(s, dir, "documents"), "doc_id", "text")),

    // Token statistics: chars, whitespace tokens, BPE-ish pieces.
    "q21_token_stats" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"))),

    // Per-document quality score (deterministic double arithmetic).
    "q22_quality" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))),

    // Per-language corpus profile with exact aggregates.
    "q23_lang_profile" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("lang"), col("n_chars"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.qualityScore(col("text")).as("quality"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          davg(col("n_chars")).as("avg_chars"),
          sum(col("n_tokens")).as("total_tokens"),
          // min/max, not a decimal-cast avg: quality is a *derived* double
          // and decimal casts of derived doubles can tie-break differently
          // across engines (see q03 note in ReferenceQueries)
          min(col("quality")).as("min_quality"),
          max(col("quality")).as("max_quality"))),

    // Document fingerprint (custom codegen'd expression) — oracle-checked
    // bit-for-bit: the FNV-1a byte fold replays in DuckDB (HashOracleSql).
    "q24_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"))),

    // Language ID heuristic — rows-only (profile tables are engine-side).
    // NOTE (r17 optimization round): a Generate boundary
    // (explode(array(langId))) was tried to move the struct-argmax out
    // of the interpreted grouping path and REVERTED — generator
    // expressions get no subexpression elimination, so the shared
    // `tokens(lower(text))` re-evaluated once per language profile and
    // the query read 4× slower (bench medians 1.0 s → 4.6 s at sf0.1).
    // The langId scaladoc's measurement stands: the interpreted
    // grouping eval is the cheapest of the known spellings.
    "q25_langid" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("lang"), TextOps.langId(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))),

    // MinHash signatures (per-doc; pair generation exercised in DedupSpec
    // and in q27 below) — oracle-checked bit-for-bit: the signature
    // lanes replay in DuckDB from the same splitmix64 constants.
    "q26_minhash_sigs" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), Dedup.shingles("toks", 3).as("sh"))
        .withColumn("sig", Dedup.minhashSignature("sh", 16))
        .select(col("doc_id"),
          element_at(col("sig"), 1).as("sig0"),
          element_at(col("sig"), 2).as("sig1"),
          element_at(col("sig"), 3).as("sig2"),
          element_at(col("sig"), 4).as("sig3"))),

    // MinHash+LSH near-dup pairs at a low threshold (same-vocab corpus
    // yields genuine mid-Jaccard pairs) — oracle-checked bit-for-bit:
    // banding, bucket cap, overlap prefilter and exact Jaccard all
    // replay in DuckDB (band buckets join on the signature slice itself).
    "q27_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(table(s, dir, "documents"), "doc_id", "text",
        k = 2, numHashes = 32, bands = 16, threshold = 0.2)),

    // Incremental dedup: near-dup pairs of a simulated daily batch
    // (doc_id % 10 == 0) against the standing corpus (the rest) —
    // cost proportional to the batch, never re-pairing the corpus
    // against itself. Oracle-checked bit-for-bit (HashOracleSql);
    // cross-pair equivalence to the full pairing asserted in DedupSpec.
    "q52_incremental_dedup" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.minhashPairsAgainst(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", k = 2, numHashes = 32, bands = 16, threshold = 0.2)
    }),

    // Incremental dedup via the PERSISTED index: same batch-vs-corpus
    // pairing as q52, but the corpus side comes from DedupIndexStore
    // artifacts (banded signatures + shingle sets computed once by a
    // build job) — at 100 TB the probe never re-reads, re-tokenizes, or
    // re-signs the standing corpus. Output ≡ q52, so the same bit-exact
    // oracle checks it; equivalence to the from-raw-text path is also
    // asserted row-for-row in DedupIndexSpec. The build is cached per
    // dataset (one build job per corpus snapshot — Bench times it
    // separately as dedup_build, reps below are probe-only).
    "q184_index_probe" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.operators.DedupIndexStore.probe(
        s, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        dedupIndexPath(s, dir), threshold = 0.2)
    }),

    // Token-window chunking: 32-token chunks on a 24-token stride
    // (8-token overlap) — the context-length split that precedes
    // packing. Oracle-checked bit-for-bit (chunk text included).
    "q54_chunks" -> ((s, dir) =>
      TextOps.chunkByTokens(
        graft.util.SparkUtil.fanOutForCpu(table(s, dir, "documents"), "doc_id"),
        "doc_id", "text", width = 32, step = 24)),

    // SimHash near-dup pairs — oracle-checked bit-for-bit: the 64-bit
    // bit-vote sketch, quarter blocking and Hamming filter replay in
    // DuckDB (HashOracleSql).
    "q28_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(table(s, dir, "documents"), "doc_id", "text",
        maxHamming = 12)),

    // Duplicate clusters: connected components over the SimHash pair set
    // → canonical cluster id per involved doc. Oracle-checked end-to-end:
    // the sketch pipeline replays in DuckDB and the clustering is checked
    // against a WITH RECURSIVE reachability closure (like q73/q74).
    "q43_dup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.simhashPairs(table(s, dir, "documents"), "doc_id", "text",
          maxHamming = 12))),

    // Same cluster graph via large-star/small-star contraction — the
    // edge-rewriting alternative whose per-round state is the shrinking
    // edge set, not a per-node labels table. Oracle-checked against the
    // same reachability closure as q43 (exact equivalence of the two
    // algorithms also asserted in DedupSpec). Side-by-side in the bench
    // with q43 to compare the two shapes' fixed overhead.
    "q56_clusters_star" -> ((s, dir) =>
      Dedup.duplicateClustersStars(
        Dedup.simhashPairs(table(s, dir, "documents"), "doc_id", "text",
          maxHamming = 12))),

    // Connected components, oracle-checked END-TO-END: the exact
    // df-capped shared-shingle edge set (jaccardEdges — counting
    // arithmetic only, so DuckDB reproduces it bit-for-bit, unlike the
    // sketch kernels behind q43/q56) feeds min-label propagation (q73)
    // and large/small-star contraction (q74). cluster = component-min
    // doc_id, hash-matched against a DuckDB WITH RECURSIVE reachability
    // closure — the two iterative graph algorithms get hard correctness
    // rows, not just planted-graph specs.
    "q73_components" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.jaccardEdges(table(s, dir, "documents"), "doc_id", "text"))),

    "q74_components_star" -> ((s, dir) =>
      Dedup.duplicateClustersStars(
        Dedup.jaccardEdges(table(s, dir, "documents"), "doc_id", "text"))),

    // Benchmark-contamination check: per-document fraction of distinct
    // word 5-grams that appear in a holdout "benchmark" set (docs with
    // doc_id % 50 == 0 stand in for the eval set). The benchmark gram set
    // is small by nature, so the membership probe is a broadcast left
    // join — map-side only, no shuffle of the corpus grams; the one
    // shuffle is the per-doc count aggregation.
    "q41_contamination" -> ((s, dir) =>
      TextOps.contamination(table(s, dir, "documents"), "doc_id", "text",
        benchFilter = col("doc_id") % 50 === 0, k = 5)),

    // Within-document repetition (C4-style quality signal): 1 − distinct/
    // total word 3-grams. Pure per-row array expressions — no shuffle at
    // all, fully codegen'd, embarrassingly parallel at any scale.
    "q42_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(table(s, dir, "documents"), "doc_id", "text", k = 3)),

    // Sequence packing: assign documents to fixed-token-budget training
    // bins by running token count per language — the standard
    // pre-tokenization packing pass. The running sum is the salted
    // two-phase `Packing.groupedCumSum` (running-sum within
    // (lang, doc_id-range bucket), broadcast per-bucket offsets, add) —
    // NOT a `partition by lang` window, whose parallelism would be the
    // language count: a single-task sort of most of a 100 TB corpus.
    "q46_sequence_pack" -> ((s, dir) =>
      graft.operators.Packing.groupedCumSum(
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextOps.tokenCount(col("text")).as("n_tokens")),
        group = "lang", orderCols = Seq("doc_id"), tokCol = "n_tokens",
        cumName = "cum_tokens")
        .withColumn("bin",
          floor((col("cum_tokens") - col("n_tokens")) / 2048).cast("int"))),

    // TF-IDF top term per document: tf × (N/df) with the document-
    // frequency join shuffled on term and the corpus size attached as a
    // broadcast 1-row scalar — the correct distributed shape for a global
    // constant (whitelisted in PlanShapeSpec). Deterministic double math:
    // counts are exact longs, and one IEEE divide + one multiply are
    // correctly rounded, so the score hashes identically cross-engine.
    "q50_tfidf" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val terms = docs.select(col("doc_id"),
        explode(TextOps.tokens(lower(col("text")))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      tf.join(dfq, Seq("term"))
        .crossJoin(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"), col("tf"), col("df"), col("score"))
    }),

    // Deterministic stratified sampling: md5-bucket membership per
    // language (en 128/256, es 32/256, default 16/256) — a pure per-row
    // predicate (no RNG, no shuffle) whose decisions survive
    // repartitioning, retries, and cluster-size changes, and reproduce
    // bit-identically in any engine (that's what makes it oracle-
    // checkable where df.sample never could be).
    "q51_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedHashSample(
        table(s, dir, "documents"),
        col("doc_id"), col("lang"),
        Map("en" -> 128, "es" -> 32), default = 16)
        .select(col("doc_id"), col("lang"))),

    // Heavy hitters, candidates-then-verify: a one-pass Misra–Gries
    // aggregate (k=50 counters/task, map-side mergeable) finds a ≤50-item
    // candidate SUPERSET of every token with count > n/51; an exact
    // recount of just the candidates then filters to the true heavy set
    // — so the composed result is bit-identical to the full
    // groupBy-HAVING the oracle runs, without ever shuffling the full
    // distinct-token space. The corpus-frequency analog of the bloom
    // semi join (q67) and minhash verify (q27) shapes.
    "q69_heavy_hitters" -> ((s, dir) => {
      import graft.functions.GraftFunctions
      val toks = table(s, dir, "documents")
        .select(explode(TextOps.tokens(lower(col("text")))).as("token"))
      // ONE sketch pass produces both the candidate superset and the
      // exact global token count (fused aggregates share the scan); the
      // 1-row/≤50-item result is collected — bounded by construction,
      // like the IVF centroid loads — so the exact recount is the only
      // second scan: two corpus passes total, not three.
      val sk = toks.agg(
        GraftFunctions.heavy_hitters(col("token"), 50).as("hh"),
        count(lit(1)).as("n_tokens")).collect()(0)
      val nTokens = sk.getLong(1)
      val candToks = sk.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      toks.filter(col("token").isin(candToks: _*))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > lit(nTokens) / lit(51.0))
        .select(col("token"), col("cnt"))
    }),

    // Dataset assembly: deterministic train/val/test assignment (first
    // md5 byte) + reproducible epoch-shuffle rank (contiguous global
    // index in md5 order via the two-phase partition-offset pattern — NO
    // single-reducer ranking window).
    "q68_corpus_split" -> ((s, dir) =>
      graft.operators.Sampling.shuffleRank(
        graft.operators.Sampling.splitAssign(
          table(s, dir, "documents"), col("doc_id"), val256 = 8, test256 = 8),
        col("doc_id"))
        .select(col("doc_id"), col("split"), col("shuffle_rank"))),

    // PII scrub: per-doc email/IPv4 counts and the md5 of the redacted
    // text (the hash keeps the oracle row narrow while still proving the
    // replacement output matches byte-for-byte).
    "q45_pii_redaction" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextOps.piiEmailCount(col("text")).as("n_emails"),
        TextOps.piiIpCount(col("text")).as("n_ips"),
        md5(TextOps.redactPii(col("text"))).as("redacted_md5"))),

    // The composed training-data filter: quality, repetition,
    // contamination, and exact-dup rank joined into one keep/drop
    // decision per document — the end-to-end shape of a corpus-cleaning
    // job. Benchmark docs drop out via the contamination inner join
    // (eval data must never enter the training set). Every branch
    // re-shuffles only on doc_id, so AQE coalesces the joins; the
    // per-row branches (quality, repetition) are shuffle-free.
    "q44_filter_pipeline" -> ((s, dir) =>
      filterPipeline(graft.util.SparkUtil.fanOutForCpu(
        table(s, dir, "documents"), "doc_id"))),

    // The full corpus-to-training-sequences job: keep-filter (q44) →
    // token-window chunking (q54) → per-language bin packing (q46), one
    // composed plan. This is the end-to-end shape a 100 TB pre-training
    // data build runs; every stage shuffles only on doc_id/lang, the
    // chunker itself is shuffle-free, and the packing running sum is the
    // salted two-phase groupedCumSum (no per-language window funnel), so
    // the composition adds no new scale hazards over its parts.
    // Oracle-checked bit-for-bit.
    "q55_clean_chunks" -> ((s, dir) => {
      // fan the one-row-group scan out to all cores BEFORE the CPU-heavy
      // kernels: the whole keep-filter + chunker otherwise runs on one
      // core of 32 (measured 5 s single-threaded vs ~1 s fanned out)
      val docs = graft.util.SparkUtil.fanOutForCpu(
        table(s, dir, "documents"), "doc_id")
      val kept = filterPipeline(docs).filter(col("keep")).select(col("doc_id"))
      val chunks = TextOps.chunkByTokens(
        docs.join(kept, Seq("doc_id")), "doc_id", "text", width = 32, step = 24)
      graft.operators.Packing.groupedCumSum(
        chunks.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("chunk_id"), col("lang"), col("n_tok")),
        group = "lang", orderCols = Seq("doc_id", "chunk_id"),
        tokCol = "n_tok", cumName = "cum_tok")
        .withColumn("bin",
          floor((col("cum_tok") - col("n_tok")) / 2048).cast("int"))
        .select(col("doc_id"), col("chunk_id"), col("lang"), col("n_tok"),
          col("cum_tok"), col("bin"))
    }),

    // Domain-mixture sampling plan: given per-source token totals and
    // target mixture weights (deterministic per-source, FNV-derived so
    // both engines compute them identically), find the LARGEST total
    // token budget whose w_s/Σw split oversamples no source — the
    // data-recipe rebalancing step every multi-source pre-training build
    // runs before sampling. Pure integer arithmetic end to end (caps and
    // shares via floor division), so the oracle is hash-exact. Scale
    // shape: one groupBy(source) aggregate over the corpus, then two
    // single-row broadcasts — nothing grows with the corpus but the
    // first scan.
    "q124_mixture_plan" -> ((s, dir) => mixturePlan(s, dir)),

    // Mixture-plan EXECUTION — the step after q124: the planned per-
    // source rate_ppm becomes a deterministic md5-threshold scan
    // predicate (the [[Sampling.weightedHashSample]] discipline at
    // 1/65536 granularity, integer threshold arithmetic, "g" sentinel
    // for keep-all), and the realized sample is reported against the
    // plan per source. Two corpus scans total (plan aggregate + execute
    // scan); the rates ride a broadcast — nothing else grows with the
    // corpus. The realized token count tracks planned_tok to sampling
    // noise, which is the contract of rate-based execution at scale.
    "q130_mixture_execute" -> ((s, dir) => {
      val plan = mixturePlan(s, dir)
        .select(col("source"), col("rate_ppm"), col("planned_tok"))
      // floor(rate·65536/10⁶) as pure integer math; rate = 10⁶ (the
      // binding source samples everything) needs the keep-all sentinel
      val thr = when(col("rate_ppm") >= 1000000L, lit("g"))
        .otherwise(lpad(lower(hex(expr("(rate_ppm * 65536) div 1000000"))), 4, "0"))
      val kept = table(s, dir, "documents")
        .join(broadcast(plan), Seq("source"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < thr)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs_kept"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("tok_kept"))
      plan.join(kept, Seq("source"), "left")
        .select(col("source"), col("rate_ppm"), col("planned_tok"),
          coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
          coalesce(col("tok_kept"), lit(0L)).as("tok_kept"))
    }),

    // Sequence materialization — the step AFTER packing: concatenate
    // each (lang, bin)'s chunks, in deterministic (doc_id, chunk_id)
    // order with an EOS separator, into the actual training-sequence
    // text plus its token count. Non-overlapping 32-token chunks (the
    // training shape; q54's 32/24 overlap is the retrieval shape). The
    // per-bin concat is a groupBy aggregate over the bin key — bins are
    // ~2048 tokens by construction, so no group outgrows memory no
    // matter the corpus size. Oracle-checked hash-exact: string_agg
    // ORDER BY replays the sorted-struct concat byte for byte.
    "q125_pack_materialize" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val chunks = TextOps.chunkByTokens(docs, "doc_id", "text", width = 32, step = 32)
      val binned = graft.operators.Packing.groupedCumSum(
        chunks.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("chunk_id"), col("lang"),
            col("n_tok"), col("chunk")),
        group = "lang", orderCols = Seq("doc_id", "chunk_id"),
        tokCol = "n_tok", cumName = "cum_tok")
        .withColumn("bin",
          floor((col("cum_tok") - col("n_tok")) / 2048).cast("int"))
      binned.groupBy(col("lang"), col("bin"))
        .agg(
          count(lit(1)).as("n_chunks"),
          sum(col("n_tok")).as("seq_tok"),
          array_join(
            expr("transform(array_sort(collect_list(struct(doc_id, chunk_id, chunk)))," +
              " x -> x.chunk)"),
            "<|eos|>").as("seq_text"))
    }),

    // Edit-distance near-dups: prefix blocking + exact levenshtein —
    // the typo/version-bump family minhash shingles are least sensitive
    // to. Driven over part names (the entity-resolution shape: catalog
    // entries differing by a word swap); the synthetic documents table
    // has no sub-3-edit pairs at any SF. Blocking key is
    // high-cardinality, so the self-join shuffles evenly; the per-block
    // quadratic is capped, and the cap is sized to this catalog's
    // name-template blocks.
    "q75_edit_neardups" -> ((s, dir) =>
      Dedup.editDistancePairs(table(s, dir, "part"), "p_partkey", "p_name",
        maxDist = 3, prefixLen = 12, maxBlock = 1024)),

    // Quality-weighted deterministic sampling: keep each doc with
    // probability ~ its quality score — shuffle-free scan predicate.
    "q78_weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.weightedHashSample(
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextOps.qualityScore(col("text")).as("quality")),
        col("doc_id"), col("quality"))),

    // Alpha-sampling data mixture (the GPT-3/PaLM recipe at α = 0.5):
    // per-language keep rate √(n_min/n_l), so kept counts ∝ √n_l — big
    // sources down-weighted, the smallest kept whole. Deterministic
    // md5-prefix-vs-hex-threshold membership (weightedHashSample's
    // discipline): a pure scan predicate, shuffle-free over the corpus;
    // the per-group rate table is a tiny broadcast. √ and ÷ are
    // correctly-rounded IEEE ops, so even the thresholds oracle-check.
    "q119_alpha_mixture" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val nmin = counts.agg(min(col("n_docs")).as("n_min"))
      val rates = counts.crossJoin(broadcast(nmin))
        .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_docs")))
        .withColumn("thr", lpad(lower(hex(
          greatest(lit(0), least(floor(col("rate") * 65536), lit(65535)))
            .cast("long"))), 4, "0"))
        .select(col("lang"), col("n_docs"), col("thr"))
      docs.join(broadcast(rates), Seq("lang"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr"))
        .select(col("doc_id"), col("lang"), col("n_docs"), col("thr"))
    }),

    // Leakage-safe train/val/test split: the md5 split key is the
    // near-dup CLUSTER id (SimHash components; singletons key on their
    // own doc_id), so every member of a duplicate cluster lands in the
    // SAME split — the step that keeps eval sets uncontaminated by
    // near-copies of training docs. Composes the components operator
    // with the deterministic splitAssign; oracle replays the sketch
    // pipeline + reachability closure + the same md5 thresholds.
    "q120_leakage_safe_split" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val clusters = Dedup.duplicateClusters(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12))
        .withColumnRenamed("id", "doc_id")
      val labeled = docs.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      graft.operators.Sampling.splitAssign(
          labeled, col("cluster"), val256 = 8, test256 = 8)
        .select(col("doc_id"), col("cluster"), col("split"))
    }),

    // Copy-paste pairs: docs sharing an exact 10-token window — the
    // low-Jaccard copied-paragraph case minhash misses by design.
    "q79_shared_windows" -> ((s, dir) =>
      Dedup.sharedWindowPairs(table(s, dir, "documents"), "doc_id", "text",
        w = 10, maxDf = 10)),

    // Sentence segmentation with stable positions (posexplode) — the
    // per-row generator step before sentence-level scoring/chunking.
    "q82_sentences" -> ((s, dir) =>
      TextOps.sentences(table(s, dir, "documents"), "doc_id", "text")),

    // Per-document n-gram-LM "surprise": for every token bigram, the
    // integer branching ratio prefix_count div bigram_count (≥ 1; rare
    // continuations score high), summed and averaged per doc — the
    // log-free novelty/typicality signal an LLM-data pipeline uses to
    // rank docs against the corpus language model. All-integer until one
    // final divide, so it oracle-checks bit-for-bit. Scale shape: bigram
    // explode → two vocabulary-sized count aggregates (map-side
    // combined) → one shuffle join on the bigram key; no windows, no
    // driver state.
    // Domain-characteristic tokens: per source, the 10 tokens whose
    // corpus share differs most from the source's own share — the
    // log-free domain-shift diagnostic (what vocabulary makes this
    // source unlike the mixture; the KL-divergence question asked with
    // integer arithmetic: shares in ppm via floor division, |Δppm| as
    // the score, so every value hash-matches). Scale shape: one
    // (source, token) map-side-combined aggregate over the corpus, a
    // token-keyed join of two VOCAB-sized tables, totals as tiny
    // broadcasts, and the ranking window runs per source over
    // vocab-sized — never corpus-sized — input.
    "q131_domain_tokens" -> ((s, dir) => {
      val tok = table(s, dir, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      val bySrc = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("obs"))
      val glob = tok.groupBy(col("token")).agg(count(lit(1)).as("gcnt"))
      val srcTot = bySrc.groupBy(col("source")).agg(sum(col("obs")).as("src_total"))
      val corpusTot = glob.agg(sum(col("gcnt")).as("corpus_total"))
      val scored = bySrc
        .join(broadcast(srcTot), Seq("source"))
        .join(glob.crossJoin(broadcast(corpusTot)), Seq("token"))
        .withColumn("ppm_src", expr("(obs * 1000000) div src_total"))
        .withColumn("ppm_corpus", expr("(gcnt * 1000000) div corpus_total"))
        .withColumn("ppm_diff", abs(col("ppm_src") - col("ppm_corpus")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("ppm_diff").desc, col("token"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("source"), col("rank").cast("int").as("rank"), col("token"),
          col("obs"), col("gcnt"), col("ppm_src"), col("ppm_corpus"),
          col("ppm_diff"))
    }),

    // Quality-threshold coverage curve: for every quality cutoff (0.05
    // bins), how many documents and tokens survive — the diagnostic that
    // picks a filter threshold by its data cost BEFORE running the
    // filter. Cumulative counts are built by exploding each bin's
    // contribution to every threshold at or below it (bins² ≤ 400 rows —
    // never a window over data, never a theta-join), plus one broadcast
    // 1-row total for the ppm share. Per-row quality/token math, one
    // 20-row aggregate: the curve costs one scan at any corpus size.
    "q135_quality_coverage" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(TextOps.qualityScore(col("text")).as("q"),
          TextOps.tokenCount(col("text")).cast("long").as("tok"))
        .select(least(floor(col("q") * 20).cast("int"), lit(19)).as("bucket"),
          col("tok"))
      val byB = d.groupBy(col("bucket"))
        .agg(count(lit(1)).as("docs"), sum(col("tok")).as("toks"))
      val tot = byB.agg(sum(col("toks")).as("tot_toks"))
      val cum = byB
        .select(explode(sequence(lit(0), col("bucket"))).as("thr"),
          col("docs"), col("toks"))
        .groupBy(col("thr"))
        .agg(sum(col("docs")).as("cum_docs"), sum(col("toks")).as("cum_toks"))
      byB.join(cum, col("thr") === col("bucket"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("docs"), col("toks"),
          col("cum_docs"), col("cum_toks"),
          expr("(cum_toks * 1000000) div tot_toks").as("cum_tok_ppm"))
    }),

    // Source-pair vocabulary overlap: exact Jaccard between every two
    // sources' distinct-token sets — which corpus components are
    // near-redundant vs complementary (the mixture-design companion to
    // q131's per-source divergence). (source, token) distincts once,
    // then a token-keyed self-join; a token present in s sources
    // contributes s·(s−1)/2 pair rows, so the join output is bounded by
    // vocab × sources², never corpus-sized. Counting arithmetic + one
    // IEEE divide → hash-exact.
    "q134_vocab_jaccard" -> ((s, dir) => {
      val st = table(s, dir, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
        .distinct()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("vsize"))
      val inter = st.select(col("source").as("src_a"), col("token"))
        .join(st.select(col("source").as("src_b"), col("token")), Seq("token"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("src_a"), col("vsize").as("va"))),
          Seq("src_a"))
        .join(broadcast(sizes.select(col("source").as("src_b"), col("vsize").as("vb"))),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("inter"),
          (col("va") + col("vb") - col("inter")).as("vunion"),
          (col("inter").cast("double") /
            (col("va") + col("vb") - col("inter")).cast("double")).as("jaccard"))
    }),

    // Triangle counting on the token co-occurrence graph (window-4
    // co-occurrence; nodes = tokens, edges = distinct canonical pairs) —
    // the third classic of the graph battery beside PageRank (q99) and
    // connected components (q73/q74), and the one whose naive form dies
    // on hubs: wedge enumeration at an unoriented hub is O(deg²). The
    // standard fix is DEGREE-ORDERED ORIENTATION (each edge points from
    // the (degree, token)-smaller endpoint), which bounds every node's
    // out-degree by ~√(2·|E|), so the wedge self-join is skew-proof at
    // any corpus size. Wedges close against the canonical edge set; each
    // triangle materializes exactly once (at its orientation-minimal
    // vertex), then per-token participation is one exploded aggregate.
    // Pure integer counting end to end — hash-exact by construction.
    "q132_cooc_triangles" -> ((s, dir) => {
      val pairs = table(s, dir, "documents")
        .select(TextOps.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(0, size(tk) - 2), i -> " +
            "transform(sequence(i + 1, least(i + 4, size(tk) - 1)), j -> " +
            "struct(tk[i] AS x, tk[j] AS y))))")).as("p"))
        .filter(col("p.x") =!= col("p.y"))
      val edges = pairs
        .select(least(col("p.x"), col("p.y")).as("w1"),
          greatest(col("p.x"), col("p.y")).as("w2"))
        .distinct()
      val deg = edges.select(col("w1").as("t")).union(edges.select(col("w2").as("t")))
        .groupBy(col("t")).agg(count(lit(1)).as("d"))
      val oriented = edges
        .join(deg.select(col("t").as("w1"), col("d").as("d1")), Seq("w1"))
        .join(deg.select(col("t").as("w2"), col("d").as("d2")), Seq("w2"))
        .select(
          when(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("w1") < col("w2")), col("w1"))
            .otherwise(col("w2")).as("src"),
          when(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("w1") < col("w2")), col("w2"))
            .otherwise(col("w1")).as("dst"))
      val e1 = oriented.select(col("src"), col("dst").as("b"))
      val e2 = oriented.select(col("src"), col("dst").as("c"))
      // b < c in string order, so the closing edge's canonical form is
      // exactly (b, c) — a plain equi-join against the edge set
      val wedges = e1.join(e2, Seq("src")).filter(col("b") < col("c"))
      val tri = wedges.join(edges,
        col("b") === col("w1") && col("c") === col("w2"))
        .select(col("src"), col("b"), col("c"))
      tri.select(explode(array(col("src"), col("b"), col("c"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("triangles"))
    }),

    "q117_bigram_surprise" -> ((s, dir) => {
      val bigrams = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bg = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bc"))
      val pf = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("pc"))
      // NOTE (r17 optimization round): a "join bg⋈pf first, attach to
      // the occurrence stream once" rewrite was tried and REVERTED —
      // AQE already broadcasts both small frequency tables here (two
      // broadcast joins, zero shuffles of the occurrence stream), and
      // pre-joining them forced a real exchange pair instead (measured
      // 0.85 s → ~3.5 s at sf0.1). The two-broadcast shape is also the
      // right 100 TB plan whenever the frequency tables fit memory.
      bigrams.join(bg, Seq("w1", "w2")).join(pf, Seq("w1"))
        .withColumn("surprise", expr("pc div bc"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("surprise")).as("sum_surprise"))
        .withColumn("avg_surprise",
          col("sum_surprise").cast("double") / col("n_bigrams"))
    }),

    // Per-document trigram novelty: the fraction of a doc's DISTINCT
    // word 3-shingles that appear in no other document — cross-doc
    // redundancy from the other side (a near-0 novelty doc is template
    // output; near-1 is fresh text). Grams travel as 8-byte FNV-1a
    // fingerprints, never strings (the 100 TB shuffle discipline), and
    // the fingerprint replays in DuckDB, so the whole query
    // oracle-checks. One gram-keyed shuffle + one per-doc aggregate.
    "q118_trigram_novelty" -> ((s, dir) => {
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(Dedup.shingles("toks", 3)).as("g"))
        .select(col("doc_id"), TextOps.fingerprint(col("g")).as("gh"))
      val docFreq = grams.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      grams.join(docFreq, Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("df") === 1, 1)).as("n_unique"))
        .withColumn("novelty",
          col("n_unique").cast("double") / col("n_grams"))
    }),

    // Mixture selection: per language, the highest-quality documents
    // until a 5,000-token budget — greedy-prefix, scale-safe running
    // sum (no per-language window).
    "q83_budget_take" -> ((s, dir) =>
      graft.operators.Packing.budgetTake(
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextOps.qualityScore(col("text")).as("quality"),
            TextOps.tokenCount(col("text")).as("n_tokens")),
        group = "lang", qualityCol = "quality", tieCol = "doc_id",
        tokCol = "n_tokens", budget = 5000L)),

    // Per-source corpus report card: the curation dashboard every
    // ingest run publishes. Map-side-combined single aggregation.
    "q80_source_profile" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.qualityScore(col("text")).as("quality"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("quality")).as("min_quality"),
          max(col("quality")).as("max_quality"))),

    // Canonical-document selection — the step a dedup pass actually
    // ships: label every doc with its duplicate-cluster id (component
    // min over the exact Jaccard edge set; singletons label themselves)
    // and keep the best-quality representative per cluster. Survivor
    // choice uses the bounded-heap top-k aggregate, NOT a ranking
    // window: shuffled rows are clusters × 1, and the tie order
    // (quality DESC, doc_id ASC) matches ROW_NUMBER exactly, which the
    // window-form oracle checks bit-for-bit.
    "q86_canonical_docs" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val clusters = Dedup.duplicateClusters(
        Dedup.jaccardEdges(docs, "doc_id", "text"))
      docs.select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .join(clusters, col("doc_id") === clusters("id"), "left")
        .select(coalesce(col("cluster"), col("doc_id")).as("cluster"),
          col("doc_id"), col("quality"))
        .groupBy(col("cluster"))
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("quality"), col("doc_id"), 1).as("topk"))
        .select(col("cluster"), col("topk")(0).getField("id").as("doc_id"),
          col("topk")(0).getField("score").as("quality"))
    }),

    // Higher-order array-function battery (transform/filter/aggregate/
    // exists over the token array): integer-only outputs so both
    // engines' lambda pipelines hash identically. Pure per-row codegen'd
    // expressions — shuffle-free at any scale.
    "q90_array_hof" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      table(s, dir, "documents").select(
        col("doc_id"),
        size(filter(toks, t => length(t) > 4)).cast("long").as("n_long"),
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("total_len"),
        array_max(transform(toks, t => length(t).cast("long"))).as("max_len"),
        exists(toks, t => t.rlike("[0-9]")).as("has_digit"))
    }),

    // Corpus snapshot diff — the reconciliation step of an incremental
    // ingest: old vs new snapshot full-outer-joined on doc_id, rows
    // classified added / removed / changed / unchanged by content hash.
    // One shuffle on the id; hashes travel instead of text bodies, so
    // shuffle bytes are 32/doc regardless of document size. Snapshots
    // are derived deterministically from the documents table (id mod
    // membership; every id%3==0 doc "edited" in the new snapshot).
    "q91_snapshot_diff" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("old_id"), md5(col("text")).as("h_old"))
      val neu = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("new_id"),
          md5(when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h_new"))
      old.join(neu, col("old_id") === col("new_id"), "full_outer")
        .select(
          coalesce(col("old_id"), col("new_id")).as("doc_id"),
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged").as("status"))
    }),

    // Per-source z-score normalization of document length — the
    // reference's zscore (P9, σ=0 guard included) as a batch group
    // operation: one decimal-exact aggregate per source, stats broadcast
    // back, per-row normalize. Two passes, no window — group count never
    // caps parallelism. n_chars (a stored integer) is the normalized
    // column: derived-double inputs would risk last-ulp decimal ties.
    "q92_source_znorm" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val stats = docs.groupBy(col("source"))
        .agg(davg(col("n_chars")).as("mu"), dstddev0(col("n_chars")).as("sigma"))
      docs.join(broadcast(stats), Seq("source"))
        .select(col("source"), col("doc_id"), col("n_chars"),
          when(col("sigma") === 0.0, lit(0.0))
            .otherwise((col("n_chars") - col("mu")) / col("sigma")).as("z"))
    }),

    // Count-Min sketch frequency estimates, oracle-checked BIT-EXACT:
    // the bucket family is md5-prefix mod width — ordinary codegen'd
    // expressions both engines compute identically — so unlike HLL the
    // sketch itself is reproducible. One pass over token occurrences
    // builds the depth×width counter matrix (map-side merged; shuffled
    // bytes constant in row count), the probe set reads estimates off
    // the broadcast sketch. est ≥ true always; ≤ true + εN w.h.p.
    "q96_countmin" -> ((s, dir) => {
      val sk = table(s, dir, "documents")
        .select(explode(TextOps.tokens(lower(col("text")))).as("term"))
        .select(array((0 until cmDepth).map(i => cmBucket(col("term"), i)): _*).as("bux"))
        .agg(graft.functions.GraftFunctions
          .count_min_build(col("bux"), cmDepth, cmWidth).as("sk"))
      s.range(1).select(explode(array(cmProbes.map(lit): _*)).as("term"))
        .crossJoin(broadcast(sk))
        .select(col("term"),
          least((0 until cmDepth).map(i =>
            element_at(col("sk"),
              (lit(i * cmWidth) + cmBucket(col("term"), i) + 1).cast("int"))): _*)
            .as("est"))
    }),

    // String-function battery (regexp extract/replace-all, translate,
    // case, search, edit distance): per-row codegen'd, shuffle-free.
    // Outputs are lengths/positions/short heads so hashes stay cheap;
    // the oracle passes DuckDB's 'g' flag where Spark's regexp_replace
    // is replace-all by default.
    "q95_string_funcs" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        upper(substring(col("text"), 1, 20)).as("head_upper"),
        regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("n_novowel"),
        length(translate(col("text"), "aeiou", "AEIOU")).cast("long").as("n_translated"),
        instr(col("text"), "the").cast("long").as("pos_the"),
        levenshtein(substring(col("text"), 1, 10),
          reverse(substring(col("text"), 1, 10))).cast("long").as("lev_rev"))),

    // Deterministic k-per-group sample: 10 docs per language in md5
    // order — layout- and engine-invariant "random" selection via the
    // bounded-heap top-k (shuffled rows = langs × 10, never a
    // per-language window sort). Score is the negated first-8-hex-chars
    // value (exact in a double); hash ties break by doc_id, mirroring
    // ROW_NUMBER order exactly.
    "q93_group_sample_k" -> ((s, dir) => {
      val hexv = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
      table(s, dir, "documents")
        .select(col("lang"), col("doc_id"), (-hexv).cast("double").as("nscore"))
        .groupBy(col("lang"))
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("nscore"), col("doc_id"), 10).as("topk"))
        .select(col("lang"), posexplode(col("topk")).as(Seq("pos", "t")))
        .select(col("lang"), col("t.id").as("doc_id"), (col("pos") + 1).as("rnk"))
    }),

    // BM25-scored retrieval (Robertson k1 = 1.2, b = 0.75) for a fixed
    // query-term set, oracle-checked BIT-EXACT: tf and dl come from
    // per-row HOFs (shuffle-free scan), corpus stats (N, avgdl, df per
    // term) from ONE map-side-combined aggregate whose sums stay integer
    // (Σdl as BIGINT — a double Σ would be order-sensitive), broadcast
    // back as a 1-row scalar. The idf uses the log-free rational form
    // (N−df+0.5)/(df+0.5): ln()'s last ulp is libm-dependent, division
    // is IEEE-exact, and it preserves BM25's ranking on any fixed df.
    // Every float op then runs in the SAME left-assoc expression tree in
    // both engines, so scores — and the (score desc, id) top-10 via the
    // bounded heap, no global sort window — match digit for digit.
    "q98_bm25" -> ((s, dir) =>
      bm25Scores(s, dir)
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("score"), col("doc_id"), 10).as("topk"))
        .select(posexplode(col("topk")).as(Seq("pos", "t")))
        .select(col("t.id").as("doc_id"), col("t.score").as("score"),
          (col("pos") + 1).as("rnk"))),

    // HYBRID retrieval with reciprocal-rank fusion (Cormack et al.,
    // SIGIR'09): the lexical BM25 top-50 list and the embedding-cosine
    // top-50 list (query = vec_id 0's embedding; doc_id ≡ vec_id in the
    // synthetic corpus) fused as Σ 1/(60 + rank), absent list → 0
    // contribution, final top-20 by fused score. Every rank is an exact
    // integer and 1/(60+r) a single IEEE divide, so the fusion — unlike
    // score-interpolation hybrids — is bit-reproducible across engines.
    // Scale shape: BOTH candidate lists come from the bounded-heap
    // top-k aggregate (shuffled bytes = partitions × k, constant in
    // corpus size), the fusion join touches ≤ 2k candidate rows, and the
    // final ranking is again the heap — no global sort, no window over
    // data anywhere; at 100 TB the corpus is scanned twice (once per
    // modality) and everything after is O(k).
    "q136_rrf_fusion" -> ((s, dir) => {
      val k = 50
      val lex = bm25Scores(s, dir)
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("score"), col("doc_id"), k).as("topk"))
        .select(posexplode(col("topk")).as(Seq("pos", "t")))
        .select(col("t.id").as("doc_id"), (col("pos") + 1).as("lex_r"))
      val e = table(s, dir, "embeddings")
      val qv = broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
      val sem = e.crossJoin(qv)
        .select(col("vec_id").as("doc_id"),
          graft.functions.GraftFunctions
            .cosine_similarity(col("embedding"), col("qv")).as("cos"))
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("cos"), col("doc_id"), k).as("topk"))
        .select(posexplode(col("topk")).as(Seq("pos", "t")))
        .select(col("t.id").as("doc_id"), (col("pos") + 1).as("sem_r"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(lit(1.0) / (lit(60) + col("lex_r")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("sem_r")), lit(0.0)))
            .as("rrf_score"))
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("rrf_score"), col("doc_id"), 20).as("topk"))
        .select(posexplode(col("topk")).as(Seq("pos", "t")))
        .select(col("t.id").as("doc_id"), col("t.score").as("rrf_score"),
          (col("pos") + 1).as("rnk"))
    }),

    // Cross-document duplicated SPANS (the exact-substring-dedup
    // primitive of Lee et al. 2022, at word-5-gram granularity): every
    // token 5-gram that occurs in ≥ 2 distinct documents, with its doc
    // frequency, total occurrences, and first (min) carrier. Where q41
    // probes a small benchmark set and q20 hashes whole documents, this
    // mines the corpus against ITSELF at sub-document granularity — the
    // signal that catches boilerplate headers, licence blocks, and
    // template text that whole-doc hashing misses. Scale shape: the
    // explode is ~k× corpus tokens but feeds a single map-side-combined
    // aggregate keyed on the gram (count-distinct runs as the standard
    // two-level expand), and the ≥2-doc filter drops the long unique
    // tail before anything leaves the aggregate — output is only the
    // duplicated vocabulary, a vanishing fraction of input at any SF.
    "q138_dup_spans" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(Dedup.shinglesAll("toks", 5)).as("gram"))
        .groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)),

    // Asymmetric near-dup: Broder containment |A∩B|/|A| over distinct
    // 3-shingle sets — catches a small doc quoted whole inside a large
    // one (Jaccard ≈ |A|/|B| misses it). Candidates from the q73
    // rare-gram inverted index; exact intersection via one codegen'd
    // linear merge of the sorted hash sets. See Dedup.containmentEdges.
    "q139_containment" -> ((s, dir) =>
      Dedup.containmentEdges(table(s, dir, "documents"), "doc_id", "text")),

    // Cross-MODAL diagnostic: per source, the exact Pearson correlation
    // between a document's text-quality score and its embedding's L2
    // norm (doc_id ≡ vec_id) — "does the embedding magnitude track the
    // quality signal" before anyone uses norm as a cheap quality proxy.
    // The q114 exact-correlation discipline end to end: five decimal
    // sums (order-invariant), the engine-independent split decimal→
    // double conversion, one fixed IEEE op tree, σ≤0 → 0.0. One doc_id
    // join + one per-source aggregate; embedding norms are per-row
    // index-order folds (q108's op chain).
    "q144_quality_norm_corr" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      val SQ = org.apache.spark.sql.types.DecimalType(38, 12)
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val q = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text")).as("x"))
      val ss = aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), sqrt(ss).as("y"))
      val agg = q.join(e, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("double").as("n"),
          d2(sum(col("x").cast(XI))).as("sx"),
          d2(sum(col("y").cast(XI))).as("sy"),
          d2(sum((col("x").cast(XI) * col("y").cast(XI)).cast(SQ))).as("sxy"),
          d2(sum((col("x").cast(XI) * col("x").cast(XI)).cast(SQ))).as("sxx"),
          d2(sum((col("y").cast(XI) * col("y").cast(XI)).cast(SQ))).as("syy"))
      val num = col("sxy") - col("sx") * col("sy") / col("n")
      val vx = col("sxx") - col("sx") * col("sx") / col("n")
      val vy = col("syy") - col("sy") * col("sy") / col("n")
      agg.select(col("source"), col("n").cast("long").as("n"),
        when(vx <= 0.0 || vy <= 0.0, lit(0.0))
          .otherwise(num / (sqrt(vx) * sqrt(vy))).as("corr"))
    }),

    // BPE seed statistics: the top-50 adjacent CHARACTER pairs across
    // all token occurrences — literally the first merge-candidate table
    // of byte-pair-encoding tokenizer training (Sennrich et al. 2016),
    // weighted by occurrence as BPE requires. Token-level q140 mines
    // multi-word units; this mines sub-word units. Scale shape: per-row
    // explode (≈ corpus bytes) into ONE map-side-combined pair count —
    // the output key space is alphabet², so partial aggregation
    // collapses almost everything before the shuffle — then the global
    // top-50 via TakeOrderedAndProject heaps. Integer counting →
    // hash-exact. (Iterating merges would fold the chosen pair and
    // re-count — each round this same one-aggregate job.)
    "q145_bpe_pairs" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(50)),

    // Corpus-level collocation mining: top-50 adjacent-token bigrams by
    // pointwise mutual information, the log-free integer form
    // c_ab·N·10⁶ div (c_a·c_b) (monotone in PMI for fixed N, so the
    // ranking is PMI's) with a c_ab ≥ 5 support floor — the classic
    // multi-word-expression signal a tokenizer-training pass mines
    // (where q117 scores each DOC against the bigram LM, this ranks the
    // bigrams themselves). All-integer → hash-exact; the i64 product is
    // exact while c_ab·N < 2⁶³/10⁶ — beyond that (≫ this corpus) the
    // same ranking runs in ppm shares. Scale shape: two map-side-
    // combined count aggregates (bigram-keyed, token-keyed), two
    // vocab-sized joins on the component tokens, a 1-row broadcast
    // total, and the global top-50 via TakeOrderedAndProject (per-
    // partition heaps, never a full sort).
    "q140_collocations" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = docs.select(TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      val bc = toks.select(explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val uni = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = uni.agg(sum(col("c")).as("n_tokens"))
      bc.join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          expr("(c_ab * n_tokens * 1000000) div (c_a * c_b)").as("pmi_ppm"))
        .orderBy(col("pmi_ppm").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    // WEIGHTED median (the byte-budget split point): per source, the
    // document length at which half the corpus CHARACTERS sit at or
    // below — the order statistic that sizes a storage/compute split,
    // where the plain median answers a different question. The running
    // weight comes from the salted two-phase Packing.groupedCumSum (no
    // per-source window anywhere); the split row is the minimum
    // (n_chars, doc_id) in the qualifying suffix — one struct-min
    // aggregate, integer arithmetic end to end.
    "q113_weighted_median" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("source"), col("n_chars"), col("doc_id"))
      val cum = graft.operators.Packing.groupedCumSum(
        docs, "source", Seq("n_chars", "doc_id"), "n_chars", "cum")
      val tot = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("total"))
      cum.join(broadcast(tot), "source")
        .filter(col("cum") * 2 >= col("total"))
        .groupBy(col("source"))
        .agg(max(col("total")).as("total_chars"),
          min(struct(col("n_chars"), col("doc_id"))).as("m"))
        .select(col("source"), col("total_chars"),
          col("m.n_chars").as("split_len"), col("m.doc_id").as("split_doc"))
    }),

    // Output-file bin-packing planner (the small-file/large-file layout
    // problem): docs stream into per-source files in ingest (doc_id)
    // order, a file closes when the running byte count crosses the
    // target — file_idx = start_offset div target, the standard
    // streaming packer (files may overrun by one doc, never undershoot
    // by fragmentation). The running offset is the salted two-phase
    // [[Packing.groupedCumSum]] — no per-source window funnel — so the
    // plan is the same at 31 sources × 500 docs and 10⁵ sources × 10⁹
    // docs. Target is 64 KiB here; at 100 TB the same plan runs with
    // 512 MiB and the output IS the compaction manifest (q137's z-order
    // decides row order inside a file; this decides file boundaries).
    // Integer arithmetic end to end → hash-exact.
    "q147_file_plan" -> ((s, dir) => {
      val target = 65536L
      val docs = table(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
      graft.operators.Packing
        .groupedCumSum(docs, "source", Seq("doc_id"), "n_chars", "cum")
        .withColumn("file_idx", expr(s"(cum - n_chars) div ${target}L"))
        .groupBy(col("source"), col("file_idx"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("file_bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
    }),

    // Tokenizer vocabulary coverage: fix the top-K corpus vocabulary
    // (count desc, token asc — a strict total order, so the K-boundary
    // is deterministic) and audit each source's out-of-vocabulary rate
    // in ppm — the go/no-go check before freezing a tokenizer on a new
    // mixture. Since r17 the audited units are the LEARNED vocabulary —
    // post-merge BPE symbols from the persisted q197 artifact (k literal
    // replaces, no training pass) — not whitespace-token proxies: the
    // audit now answers the question about the tokenizer that will
    // actually run. Scale shape: symbols collapse to (source, symbol)
    // counts in ONE map-side-combined aggregate (shuffle ∝ sources ×
    // vocab, not corpus tokens); the K-row vocab comes off that via
    // per-partition top-K heaps (TakeOrderedAndProject) and broadcasts
    // back. K=16; the plan is K-independent (32k at 100 TB). Integer
    // counting → hash-exact (oracle replays the trained rounds).
    "q149_vocab_coverage" -> ((s, dir) => {
      val vocabK = 16
      val sw = graft.operators.BpeStore.symbols(
          graft.util.SparkUtil.fanOutForCpu(
            table(s, dir, "documents"), "doc_id"),
          Seq("source"), "text", bpeStorePath(s, dir))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      val vocab = sw.groupBy(col("w")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(vocabK)
        .select(col("w"), lit(1).as("in_v"))
      sw.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          sum(when(col("in_v").isNull, col("c")).otherwise(lit(0L)))
            .as("n_oov"),
          count(when(col("in_v").isNull, 1)).as("n_oov_types"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          col("n_oov_types"),
          expr("n_oov * 1000000 div n_tokens").as("oov_ppm"))
    }),

    // Per-source DATASET CARD: the one-row-per-source summary panel a
    // curation run publishes — doc/token/char volume, language spread,
    // exact-duplicate exposure (docs whose md5(text) appears ≥2 times
    // CORPUS-wide, so cross-source copies count in both sources), and
    // mean quality. Two shuffles, both bounded: a hash-keyed dup count
    // (32 B/doc travels, never text) joined back, then one per-source
    // aggregate. The quality mean follows the q114 discipline — decimal
    // sum (order-invariant), split decimal→double cast, ONE division —
    // so even the float column hash-matches cross-engine.
    "q150_dataset_card" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val d = table(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          md5(col("text")).as("h"),
          TextOps.tokenCount(col("text")).cast("long").as("n_toks"),
          TextOps.qualityScore(col("text")).as("q"))
      val dupes = d.groupBy(col("h")).agg(count(lit(1)).as("nh"))
      d.join(dupes, "h")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars_total"),
          countDistinct(col("lang")).as("n_langs"),
          count(when(col("nh") >= 2, 1)).as("n_dup_docs"),
          d2(sum(col("q").cast(XI))).as("sq"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars_total"), col("n_langs"), col("n_dup_docs"),
          (col("sq") / col("n_docs").cast("double")).as("mean_quality"))
    }),

    // Duplicate-cluster SIZE distribution: how much of the corpus sits
    // in how-big near-dup clusters — the one-glance answer to "is dedup
    // worth a pass here, and is any cluster pathological" (a 10⁶-doc
    // cluster means a template or a crawler trap, not prose). Composes
    // the q73 connected components (size-adaptive: driver union-find
    // under the edge cap, distributed rounds above) with singletons
    // completing the picture via the same left-join/coalesce labeling as
    // q86; two count aggregates collapse doc rows → cluster sizes →
    // histogram, so the output is bounded by the largest cluster size,
    // not the corpus. Integer counting → hash-exact.
    "q152_cluster_sizes" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val clusters = Dedup.duplicateClusters(
        Dedup.jaccardEdges(docs, "doc_id", "text"))
      docs.select(col("doc_id"))
        .join(clusters, col("doc_id") === clusters("id"), "left")
        .select(coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
        .groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))
        .select(col("csize"), col("n_clusters"),
          (col("csize") * col("n_clusters")).as("n_docs"))
    }),

    // Zipf COVERAGE curve: share of all token occurrences covered by the
    // top-K vocabulary at K ∈ {1,2,4,8,16,32} — the vocab-size/coverage
    // trade-off curve behind q149's single-K audit (pick K where the
    // curve flattens). Scale shape: corpus tokens collapse to one
    // map-side-combined count; the top-32 head comes off it via
    // TakeOrderedAndProject heaps; ranks AND running sums come from ONE
    // executor-side aggregate() fold over that ≤32-struct array (the
    // shuffleRank/groupedCumSum offset pattern — no window, no driver
    // state); K rows equi-join on rank, the 1-row total broadcasts.
    // Integer counting → hash-exact. Ks beyond the vocab size drop out
    // of the equi-join in both engines identically.
    "q154_zipf_curve" -> ((s, dir) => {
      // learned-vocab units since r17 (see q149): post-merge BPE
      // symbols from the stored artifact, not whitespace tokens
      val uni = graft.operators.BpeStore.symbols(
          graft.util.SparkUtil.fanOutForCpu(
            table(s, dir, "documents"), "doc_id"),
          Nil, "text", bpeStorePath(s, dir))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val tot = uni.agg(sum(col("cnt")).as("total"))
      val ranked = uni.orderBy(col("cnt").desc, col("w")).limit(32)
        .agg(sort_array(collect_list(struct(
          (col("cnt") * -1).as("nc"), col("w"), col("cnt")))).as("arr"))
        .select(explode(expr(
          """aggregate(
               arr,
               struct(cast(0 as bigint) as acc,
                      cast(array() as array<struct<rank:int, cum:bigint>>) as out),
               (s, x) -> named_struct(
                 'acc', s.acc + x.cnt,
                 'out', array_append(s.out, named_struct(
                   'rank', cast(size(s.out) + 1 as int),
                   'cum', s.acc + x.cnt))),
               s -> s.out)""")).as("rc"))
        .select(col("rc.rank").as("rank"), col("rc.cum").as("covered"))
      val ks = s.range(1)
        .select(explode(array(Seq(1, 2, 4, 8, 16, 32).map(lit): _*)).as("k"))
      ks.join(ranked, col("rank") === col("k"))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("covered"), col("total"),
          expr("covered * 1000000 div total").as("covered_ppm"))
    }),

    // ZONE-MAP skipping audit: per-file column min/max stats (the
    // Parquet row-group / Iceberg-manifest footer every pruning engine
    // consults) over q147's file layout, then the pruning economics of a
    // representative predicate (n_chars >= 400): how many files — and
    // how many docs of IO — the manifest alone eliminates, per source.
    // A file skips iff max(n_chars) < 400, the exact rule the scan
    // planner applies. This is the 1-d companion of q137's z-order
    // audit (which measures 2-d clustering quality); together they
    // answer "is this layout worth its write cost" before a 100 TB
    // rewrite. Integer min/max/counts end to end → hash-exact.
    "q157_skipping_manifest" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
      val files = graft.operators.Packing
        .groupedCumSum(docs, "source", Seq("doc_id"), "n_chars", "cum")
        .withColumn("file_idx", expr("(cum - n_chars) div 65536"))
        .groupBy(col("source"), col("file_idx"))
        .agg(count(lit(1)).as("n_docs"), max(col("n_chars")).as("max_len"))
      files.groupBy(col("source"))
        .agg(count(lit(1)).as("n_files"),
          count(when(col("max_len") < 400, 1)).as("n_skippable"),
          sum(col("n_docs")).as("n_docs"),
          sum(when(col("max_len") < 400, col("n_docs")).otherwise(lit(0L)))
            .as("docs_skipped"))
        .select(col("source"), col("n_files"), col("n_skippable"),
          col("n_docs"), col("docs_skipped"),
          expr("n_skippable * 1000000 div n_files").as("skip_ppm"))
    }),

    // GOPHER-style structural quality rules (Rae et al. 2021 §A1.1.1),
    // the rule family q44's score-based pipeline does NOT cover: word
    // count in [4, 1000], mean word length in [3, 10], ≥80% words with
    // an alphabetic char, ≤10% purely-numeric words. Every ratio runs as
    // an INTEGER cross-product (3n ≤ chars ≤ 10n, 5·alpha ≥ 4n,
    // 10·digit ≤ n) — no float enters a verdict, so flags replay
    // exactly. Per-row HOF counts (shuffle-free scan) + one per-source
    // aggregate of pass counts: the rule-tuning report a curation run
    // reads before committing a filter at 100 TB.
    "q161_gopher_rules" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val flagged = table(s, dir, "documents").select(
        col("source"),
        size(toks).cast("long").as("n"),
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("chars"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long").as("alpha"),
        size(filter(toks, t => t.rlike("^[0-9]+$"))).cast("long").as("num"))
        .select(col("source"),
          (col("n") >= 4 && col("n") <= 1000).as("f_count"),
          (col("chars") >= col("n") * 3 && col("chars") <= col("n") * 10)
            .as("f_wordlen"),
          (col("alpha") * 5 >= col("n") * 4).as("f_alpha"),
          (col("num") * 10 <= col("n")).as("f_numeric"))
      flagged.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("f_count"), 1)).as("pass_count"),
          count(when(col("f_wordlen"), 1)).as("pass_wordlen"),
          count(when(col("f_alpha"), 1)).as("pass_alpha"),
          count(when(col("f_numeric"), 1)).as("pass_numeric"),
          count(when(col("f_count") && col("f_wordlen") &&
            col("f_alpha") && col("f_numeric"), 1)).as("pass_all"))
    }),

    // Sampling-TEMPERATURE sweep: the q119 mixture plan at α ∈ {¼, ½, ¾}
    // — the dial a data-mixture owner actually turns (α→0 flattens
    // toward uniform, α→1 keeps natural proportions). Non-dyadic powers
    // would need libm pow() (last-ulp engine-dependent); these three run
    // entirely on correctly-rounded IEEE sqrt: r^¼ = √√r, r^¾ = √r·√√r
    // — fixed op trees that replay bit-for-bit, like everything else on
    // this table. Output is the PLAN (per lang × α: rate + the 1/65536
    // md5 threshold q119's scan predicate consumes) — one tiny
    // aggregate + a 3-row explode, no corpus rescan per α.
    "q165_temperature_sweep" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val nmin = counts.agg(min(col("n_docs")).as("n_min"))
      counts.crossJoin(broadcast(nmin))
        .withColumn("r", col("n_min").cast("double") / col("n_docs"))
        .select(col("lang"), col("n_docs"), col("r"),
          explode(array(lit(0.25), lit(0.5), lit(0.75))).as("alpha"))
        .withColumn("rate",
          when(col("alpha") === 0.25, sqrt(sqrt(col("r"))))
            .when(col("alpha") === 0.5, sqrt(col("r")))
            .otherwise(sqrt(col("r")) * sqrt(sqrt(col("r")))))
        .withColumn("thr", lpad(lower(hex(
          greatest(lit(0), least(floor(col("rate") * 65536), lit(65535)))
            .cast("long"))), 4, "0"))
        .select(col("lang"), col("alpha"), col("n_docs"), col("rate"),
          col("thr"))
    }),

    // MMR diversified reranking (Carbonell–Goldstein 1998): greedy top-5
    // from the BM25 top-20, each pick argmax λ·rel − (1−λ)·max-sim-to-
    // selected (λ=0.5; sim = token-set Jaccard — one exact division per
    // pair). The greedy loop is 5 UNROLLED rounds — each a bounded
    // 20-row scan against the 1-row broadcast selected-set array, argmax
    // via struct max with the (score DESC, id ASC) tie rule — so the
    // plan is static and both engines replay the identical pick
    // sequence (BM25 rel is q98's bit-exact scorer; Jaccard and the
    // λ-blend are fixed IEEE trees). The candidate set materializes
    // once (localCheckpoint) so five rounds don't recompute the corpus
    // scan. At 100 TB the same shape reranks per-query shortlists —
    // the expensive part (retrieval) stays the indexed q98/q136 path;
    // MMR touches only candidates × selected.
    "q164_mmr_rerank" -> ((s, dir) => {
      val toksDf = table(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(TextOps.tokens(lower(col("text")))).as("toks"))
      val cand = bm25Scores(s, dir)
        .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        .join(toksDf, "doc_id")
        .select(col("doc_id"), col("score").as("rel"), col("toks"))
        .localCheckpoint(true)
      // each round's 1-row selection is localCheckpointed (r17
      // optimization round): `sel` feeds BOTH the scoring crossJoin and
      // the append crossJoin, so without the cut every round doubled
      // the selection subplan — by round 5 the plan carried 2⁴ copies
      // of round 1's lineage, and planning + the duplicated broadcast
      // builds dominated the query. One ~1-row job per round replaces
      // that; greedy semantics and output are unchanged.
      val sel0 = cand
        .agg(max(struct(col("rel"), (col("doc_id") * -1).as("nid"),
          col("doc_id"), col("toks"))).as("b"))
        .select(array(expr(
          "named_struct('doc_id', b.doc_id, 'toks', b.toks, 'rel', b.rel)"))
          .as("sel"))
        .localCheckpoint(true)
      val selN = (2 to 5).foldLeft(sel0) { (sel, _) =>
        val scored = cand.crossJoin(broadcast(sel))
          .filter(!expr("exists(sel, s -> s.doc_id = doc_id)"))
          .withColumn("maxsim", expr(
            """array_max(transform(sel, s ->
              |  size(array_intersect(toks, s.toks))
              |    / cast(size(array_union(toks, s.toks)) as double)))"""
              .stripMargin))
          .withColumn("mmr", expr(
            "cast(0.5 as double) * rel - cast(0.5 as double) * maxsim"))
        scored
          .agg(max(struct(col("mmr"), (col("doc_id") * -1).as("nid"),
            col("doc_id"), col("toks"), col("rel"))).as("b"))
          .crossJoin(broadcast(sel))
          .select(expr(
            """array_append(sel,
              |  named_struct('doc_id', b.doc_id, 'toks', b.toks,
              |               'rel', b.rel))""".stripMargin).as("sel"))
          .localCheckpoint(true)
      }
      selN.select(posexplode(col("sel")).as(Seq("pos", "r")))
        .select((col("pos") + 1).cast("int").as("rank"),
          col("r.doc_id").as("doc_id"), col("r.rel").as("rel"))
    }),

    // Source-pair COPY matrix: near-dup edge mass by (source, source)
    // pair — who mirrors whom (off-diagonal) and who repeats itself
    // (diagonal), the provenance axis q134's vocabulary overlap (style)
    // does not see. Rides the oracled Jaccard edge set (q73's): two
    // doc_id→source broadcast-able joins + least/greatest pair
    // normalization + one count — edges are already dedup-bounded, so
    // no new pair explosion; output ≤ sources² rows at any corpus size.
    "q162_copy_matrix" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val src = docs.select(col("doc_id"), col("source"))
      Dedup.jaccardEdges(docs, "doc_id", "text")
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          "id_b")
        .select(least(col("sa"), col("sb")).as("s1"),
          greatest(col("sa"), col("sb")).as("s2"))
        .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_pairs"))
    }),

    // Stratified EXACT-proportion split with largest-remainder rounding:
    // q120 keys the split on near-dup clusters (leakage safety); this is
    // the other split discipline — per (source, lang) stratum, the test
    // set gets EXACTLY floor(total/10) docs corpus-wide, apportioned as
    // floor(n_s/10) per stratum plus +1 to the strata with the largest
    // n_s mod 10 (tie: source, lang asc) — the Hare/largest-remainder
    // method, all integer so any engine replays the allocation. Doc
    // assignment is the md5 order within the stratum (q93's discipline)
    // through Sampling.groupedShuffleRank — the bucketed two-phase rank,
    // because a 10 % quota grows with the stratum (a heap top-k can't
    // hold it) and a per-stratum window is the low-cardinality funnel
    // this repo bans. The apportionment itself folds the bounded strata
    // array in ONE aggregate (q154's pattern, no global window).
    // sum(doc_id) of the test rows pins the ASSIGNMENT, not just the
    // counts → hash-exact.
    "q169_stratified_split" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"))
      val strata = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val quota = strata
        .agg(sort_array(collect_list(struct(
            (lit(0L) - expr("n_docs % 10")).as("negrem"),
            col("source"), col("lang"), col("n_docs")))).as("arr"),
          sum(col("n_docs")).as("total"),
          sum(expr("n_docs div 10")).as("base_sum"))
        .select(col("total"), col("base_sum"),
          posexplode(col("arr")).as(Seq("pos", "r")))
        .select(col("r.source").as("source"), col("r.lang").as("lang"),
          col("r.n_docs").as("n_docs"),
          (expr("r.n_docs div 10") +
            when(col("pos") < expr("total div 10") - col("base_sum"),
              lit(1L)).otherwise(lit(0L))).as("quota"))
      graft.operators.Sampling
        .groupedShuffleRank(docs, Seq("source", "lang"), col("doc_id"))
        .join(broadcast(quota), Seq("source", "lang"))
        .groupBy(col("source"), col("lang"))
        .agg(max(col("n_docs")).as("n_docs"), max(col("quota")).as("quota"),
          sum(when(col("shuffle_rank") <= col("quota"), 1L).otherwise(0L))
            .as("n_test"),
          sum(when(col("shuffle_rank") <= col("quota"), col("doc_id"))
            .otherwise(lit(0L))).as("test_id_sum"))
    }),

    // Canonicalized dedup: exact dedup AFTER text normalization —
    // ASCII case-fold via translate (a pure codepoint map, so no
    // engine-specific Unicode casing), every non-[a-z0-9 ] byte to
    // space, runs of spaces collapsed, trimmed. Reports per source how
    // many docs the RAW md5 already flags as duplicates vs the CANONICAL
    // md5 — the delta is the near-copy mass punctuation/case variation
    // hides from q20's exact pass. Two 32-byte-hash grouped counts
    // joined back per doc (hashes shuffle, text bodies never), one
    // per-source rollup; output ≤ sources rows.
    "q170_canonical_dedup" -> ((s, dir) => {
      val up = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("text")).as("raw_h"),
          md5(trim(regexp_replace(regexp_replace(
            translate(col("text"), up, up.toLowerCase),
            "[^a-z0-9 ]", " "), " +", " "))).as("can_h"))
      def dupFlag(c: String) = docs
        .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
      docs
        .join(dupFlag("raw_h").select(col("raw_h"), lit(1).as("raw_dup")),
          Seq("raw_h"), "left")
        .join(dupFlag("can_h").select(col("can_h"), lit(1).as("can_dup")),
          Seq("can_h"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("raw_dup"), lit(0))).as("raw_dup_docs"),
          sum(coalesce(col("can_dup"), lit(0))).as("canon_dup_docs"))
    }),

    // Raw-web text extraction (VERDICT r14 item 1): markup is
    // synthesized DETERMINISTICALLY from the documents fixture (the
    // [[htmlParts]] template — title/style/script/comment head, block
    // and inline body tags, the entity subset, an unclosed element, a
    // trailing unclosed script), then [[TextOps.htmlText]] strips it.
    // Both the template and the strip chain render into the DuckDB
    // oracle from the same data structures, so the hash-exact compare
    // covers the full pipeline: tag/script/style/comment removal, block
    // segmentation, entity decode order, whitespace discipline. Per-row
    // codegen'd replace chain — shuffle-free, linear in bytes, the
    // 100 TB scrubbing-pass shape.
    "q186_html_extract" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.htmlText(htmlMarkupCol).as("x"))
        .select(col("doc_id"),
          md5(col("x")).as("extracted_md5"),
          length(col("x")).as("x_chars"),
          TextOps.tokenCount(col("x")).as("x_tokens"))
    }),

    // Cross-document line-level boilerplate removal (CCNet/RefinedWeb
    // paragraph dedup): lines are synthesized deterministically — a
    // global cookie banner (docfreq = corpus), a per-source legal footer
    // (docfreq = source size), the unique body and a unique id line —
    // and every line with docfreq > 10 drops. Line hashes shuffle, text
    // bodies never; reassembly is one doc-keyed aggregate with per-doc
    // state bounded by document size. The op document-level dedup can't
    // express: the surrounding content differs on every page.
    "q189_boilerplate_lines" -> ((s, dir) => {
      // null-PROPAGATING concat, matching the oracle's `||` exactly —
      // concat_ws would skip a NULL text and emit a 3-line doc where the
      // oracle's row vanishes (the fixture has no nulls, but the two
      // engines must diverge on NO input)
      val docs = table(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("please accept cookies to continue\n"),
          col("text"),
          lit("\ncopyright "), col("source"), lit(" all rights reserved"),
          lit("\ndocument "), col("doc_id").cast("string")).as("t"))
      TextOps.stripBoilerplateLines(docs, "doc_id", "t", maxDocFreq = 10)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_kept"), col("n_removed"))
    }),

    // Domain quotas (the C4/RefinedWeb per-site cap): synthesize each
    // doc's URL deterministically (subdomain from lang, registrable
    // domain from source, TLD cycling through a generic gTLD and two
    // pinned ccSLDs, a credentialed-userinfo stripe and an FQDN
    // trailing-dot stripe — the three crawl-URL corners ADVICE r15
    // flagged), extract host → registrable domain with the
    // engine-portable regex ops, then keep at most 10 docs per domain by
    // the content-derived md5 rank — Sampling.groupedShuffleRank, the
    // bucketed two-phase rank that survives a 100 TB stratum where a
    // per-domain window funnels one reducer. Output is the kept set:
    // deterministic under any partitioning, so it hash-matches the
    // oracle's ROW_NUMBER replay.
    "q190_domain_quota" -> ((s, dir) => {
      val tld = when(col("doc_id") % 3 === 0, lit("com"))
        .when(col("doc_id") % 3 === 1, lit("co.uk"))
        .otherwise(lit("com.au"))
      val userinfo =
        when(col("doc_id") % 7 === 0, lit("user:pw@")).otherwise(lit(""))
      val fqdnDot = when(col("doc_id") % 11 === 0, lit(".")).otherwise(lit(""))
      val d = table(s, dir, "documents").select(
        col("doc_id"),
        concat(lit("https://"), userinfo, col("lang"), lit("."),
          col("source"), lit("press."), tld, fqdnDot, lit("/docs/"),
          col("doc_id").cast("string"),
          lit("?utm_source=feed#top")).as("url"))
      val dom = d.select(col("doc_id"), col("url"),
        TextOps.registrableDomain(TextOps.urlHost(col("url"))).as("domain"))
      graft.operators.Sampling
        .groupedShuffleRank(dom, Seq("domain"), col("doc_id"))
        .filter(col("shuffle_rank") <= 10)
        .select(col("domain"), col("doc_id"),
          col("shuffle_rank").cast("long").as("quota_rank"))
    }),

    // The domain LINK GRAPH (VERDICT r15 item 1): anchor hrefs pulled
    // from fixture-synthesized markup ([[linkParts]] — every quote
    // style, relative/fragment/empty/mailto/javascript/no-href corners,
    // a ccSLD partner and a protocol-relative CDN), resolved through
    // urlHost/registrableDomain/linkDomain to (src_domain, dst_domain,
    // n_links) edges — the link-structure half of web-corpus processing
    // that q186's text extraction discards, feeding the same graph
    // battery as q99/q132/q175. Markup bytes never shuffle; the one
    // shuffle is the map-side-combinable edge count.
    "q191_link_graph" -> ((s, dir) =>
      TextOps.domainLinkEdges(linkPages(s, dir), "markup", "url")),

    // PageRank over the REAL link graph (composition): the q191 edges —
    // extracted from markup, not synthesized — feed the same
    // integer-arithmetic fixed-iteration PageRank as q99, so the
    // crawl-prioritization score every web pipeline derives from link
    // structure is computed end-to-end from raw HTML. Unweighted
    // distinct domain edges (q191's grouped output), self-edges kept
    // (intra-site navigation mass), bit-exact vs the same three rounds
    // unrolled in DuckDB with the operator's src-node coalesce
    // mirrored.
    "q193_domain_pagerank" -> ((s, dir) => {
      // the edge table (|E| short domain pairs) materializes once:
      // the rank's degree and mass-passing sides would otherwise each
      // re-run the whole markup extraction chain
      val edges = TextOps.domainLinkEdges(linkPages(s, dir), "markup", "url")
        .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
        .localCheckpoint(true)
      graft.operators.Graphs.integerPageRank(edges, iters = 3)
    }),

    // WEIGHTED PageRank over the same real link graph (VERDICT r16
    // item 3): q193 discards the n_links weights q191 computes — here a
    // node's mass splits across its out-edges proportionally to link
    // mass ((pr·w) div Σw per src, the crawl-prioritization form), so a
    // domain linked 100× from a site outranks one in its footer.
    // Bit-exact vs the weighted rounds unrolled in DuckDB.
    "q198_weighted_pagerank" -> ((s, dir) => {
      // edge table materialized once, like q193
      val edges = TextOps.domainLinkEdges(linkPages(s, dir), "markup", "url")
        .select(col("src_domain").as("src"), col("dst_domain").as("dst"),
          col("n_links"))
        .localCheckpoint(true)
      graft.operators.Graphs.integerWeightedPageRank(
        edges, "n_links", iters = 3)
    }),

    // The composed WEB-CORPUS INGEST shape: raw markup → htmlText →
    // quality gate on the EXTRACTED text → integer mass accounting per
    // source — q186's operator in its production position, upstream of
    // the same keep-filter family as q44. The gate compares a fixed IEEE
    // quality tree per row (the q22 formula, already bit-exact cross-
    // engine) and both thresholds split the fixture non-trivially
    // (measured ~230/500 above quality, ~329/500 above the token floor);
    // only integers aggregate, so the output hash-matches exactly. One
    // shuffle total (the final source rollup) — everything upstream is
    // per-row codegen.
    "q188_web_pipeline" -> ((s, dir) => {
      // fanOutForCpu like q44/q55: the extract+score chain is CPU-bound
      // per-row work, and a single-file fixture scan would otherwise run
      // it on one core (production multi-split scans make this a no-op —
      // both directions pinned by FanOutSpec)
      graft.util.SparkUtil.fanOutForCpu(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("source"),
          TextOps.htmlText(htmlMarkupCol).as("x0"))
        // Generate boundary (explode of a 1-element array): evaluate the
        // ~25-pass extraction chain ONCE per row into an attribute.
        // Without it, projection collapse into the fused partial hash-agg
        // re-inlined the chain at every use inside qualityScore +
        // tokenCount and the generated doAggregateWithKeys method grew
        // past the JVM's 64 KB limit — janino failed and the whole stage
        // silently ran interpreted (observed in the r16 bench log as
        // 'ERROR CodeGenerator ... Code grows beyond 64 KB').
        .select(col("source"), explode(array(col("x0"))).as("x"))
        .select(col("source"),
          TextOps.qualityScore(col("x")).as("quality"),
          TextOps.tokenCount(col("x")).as("n_tokens"))
        .filter(col("quality") > 0.55 && col("n_tokens") >= 60)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(col("n_tokens").cast("long")).as("token_mass"))
    }),

    // The FULL web→training-sequences ladder as ONE registered plan
    // (VERDICT r16 item 4): raw markup → htmlText extraction →
    // cross-doc boilerplate-line removal (q189) → duplicated-span
    // removal (q196) → the q44 keep-decision over the CLEANED text →
    // token-window chunking (q54) → per-language packing (q55). Each
    // stage is individually oracle-checked; this pins the COMPOSITION
    // the 100 TB pipeline actually runs — one lazy plan, no driver
    // materialization between stages (PlanShapeSpec pins that), with
    // the q188 Generate boundary keeping the ~25-pass extraction chain
    // evaluated once per row before the multi-consumer stages fan out.
    // Scale shape is the union of its parts': text bytes shuffle only
    // in the two doc-keyed reassemblies; frequency/membership tables
    // travel as md5s; packing is the salted two-phase groupedCumSum.
    "q199_web_to_sequences" -> ((s, dir) =>
      graft.operators.Packing.groupedCumSum(
        webToSequencesLadder(s, dir),
        group = "lang", orderCols = Seq("doc_id", "chunk_id"),
        tokCol = "n_tok", cumName = "cum_tok")
        .withColumn("bin",
          floor((col("cum_tok") - col("n_tok")) / 2048).cast("int"))
        .select(col("doc_id"), col("chunk_id"), col("lang"), col("n_tok"),
          col("cum_tok"), col("bin"))),

    // URL canonicalization dedup (the C4/CCNet pre-fetch pass): strip
    // fragments and tracking params (utm_*/fbclid/gclid/msclkid/mc_eid,
    // the pinned chain in TextOps.urlCanonSteps) and count how many
    // distinct URLs collapse per source — the URL-level dedup that runs
    // BEFORE any content is fetched at crawl scale. The fixture cycles
    // four variants (two tracking-parameter shapes, a fragment, bare)
    // over colliding paths; integer distinct counts hash-match the same
    // chain rendered into DuckDB.
    "q194_url_canon_dedup" -> ((s, dir) => {
      val variant = when(col("doc_id") % 4 === 0,
          lit("?utm_source=feed&utm_campaign=spring"))
        .when(col("doc_id") % 4 === 1, lit("?q=1&gclid=CjkKEQ"))
        .when(col("doc_id") % 4 === 2, lit("#section-2"))
        .otherwise(lit(""))
      table(s, dir, "documents")
        .select(col("source"),
          concat(lit("https://"), col("lang"), lit("."), col("source"),
            lit("press.com/a/"), (col("doc_id") % 50).cast("string"),
            variant).as("url"))
        .select(col("source"), col("url"),
          TextOps.canonicalizeUrl(col("url")).as("canon"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("url")).as("raw_distinct"),
          countDistinct(col("canon")).as("canon_distinct"))
    }),

    // Duplicated-SPAN removal (the Lee et al. exact-substring dedup
    // granularity): a 9-word block planted verbatim on every third doc
    // — plus whatever 5-grams the fixture naturally repeats — is cut
    // from ALL carriers, while the junction-spanning grams (unique per
    // doc) keep their unique-side tokens. Completes the dedup ladder
    // below q20 (document) and q189 (line). Gram md5s computed
    // map-side, gram text never shuffles; reassembly is the q189
    // doc-keyed positioned aggregate.
    "q196_span_dedup" -> ((s, dir) => {
      val planted = table(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"),
            lit(" this block is quoted verbatim across many pages today")))
          .otherwise(col("text")).as("t"))
      TextOps.removeDuplicateSpans(planted, "doc_id", "t",
          k = 5, maxDocFreq = 1)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_kept"), col("n_removed"))
    }),

    // Model-based quality filtering, execution shape (the fastText
    // keep/drop classifier of the CCNet/LLaMA recipes): hashed word
    // uni+bigram features, a deterministic md5-derived integer weight
    // table (no artifact to drift between engines), doc score = summed
    // weights, keep = score > 0. Weights are pure expressions — no
    // weight-table join, no broadcast — and the one shuffle is the
    // doc-keyed sum: the canonical linear inference pass at 100 TB.
    "q195_hashed_classifier" -> ((s, dir) =>
      TextOps.hashedLinearScore(table(s, dir, "documents"), "doc_id", "text")),

    // Learned-subword tokenization (VERDICT r15 item 5): 3 unrolled
    // greedy BPE merge rounds over the corpus's letter runs — the
    // upgrade from whitespace/regex token proxies (q21/q149/q154) to a
    // trained tokenizer. Per-doc word/symbol counts before/after, an
    // order-insensitive exact fingerprint of the merged seqs, and the
    // learned merge list itself (pinning WHICH pairs won each round,
    // tie order included) — all hash-exact against the same rounds
    // unrolled in DuckDB CTEs.
    // fanOutForCpu like q44/q188: the per-round pair build is CPU-bound
    // per-row work and the fixture is a single-file scan (production
    // multi-split scans make the repartition a no-op)
    "q192_bpe_merges" -> ((s, dir) =>
      TextOps.applyBpeMerges(
        graft.util.SparkUtil.fanOutForCpu(table(s, dir, "documents"), "doc_id"),
        "doc_id", "text", rounds = 3)),

    // Tokenizer artifact lifecycle (VERDICT r16 item 2): train 16 BPE
    // merge rounds ONCE per corpus snapshot, persist the merge list as
    // a parquet artifact (BpeStore), and apply it here with NO training
    // pass — 16 nested literal replaces in one codegen'd projection
    // before the doc aggregate. 16 rounds is past applyBpeMerges' 8-round
    // inline plan cap, which is the point of the driver-loop store. The
    // oracle replays the full training inline (MATERIALIZED CTEs keep it
    // linear), so hash-equality proves stored-then-applied ≡ trained
    // inline, merge list included — the q184 persisted-artifact pattern.
    "q197_bpe_store" -> ((s, dir) =>
      graft.operators.BpeStore.applyFromStore(
        graft.util.SparkUtil.fanOutForCpu(table(s, dir, "documents"), "doc_id"),
        "doc_id", "text", bpeStorePath(s, dir))),

    // Homoglyph-canonical dedup (VERDICT r14 item 6): the dedup family
    // case/punct folding cannot see — script-level near-dups (Cyrillic
    // `а` for Latin `a`) and NFC-form splits (decomposed a+U+0301 vs
    // precomposed á). Four deterministic variants per document: the
    // original, a Cyrillic-homoglyph copy, a precomposed-accent copy,
    // and its decomposed spelling. Raw md5s are 4·docs distinct;
    // [[TextOps.canonicalizeUnicode]] must collapse them 2:1 (original
    // ≡ homoglyph, precomposed ≡ decomposed) — the per-source distinct
    // counts pin exactly that, hash-exact against the same table-driven
    // chain in DuckDB.
    "q187_homoglyph_dedup" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(array(
            col("text"),
            translate(col("text"), homoglyphLatin, homoglyphCyrillic),
            replace(col("text"), lit("a"), lit("\u00e1")),
            replace(col("text"), lit("a"), lit("a\u0301")))).as("vtext"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(md5(col("vtext"))).as("raw_distinct"),
          countDistinct(md5(TextOps.canonicalizeUnicode(col("vtext"))))
            .as("canon_distinct"))
    }),

    // Pareto FRONTIER (skyline) per source: docs not dominated on the
    // (shorter, more alphabetic) preference pair — the multi-objective
    // selection query class (preference/skyline queries), distinct from
    // every single-score ranking in the battery. A row survives iff its
    // alpha_ppm strictly exceeds the running max over all preceding rows
    // in (n_chars ASC, alpha_ppm DESC, doc_id ASC) order — the classic
    // 2-d sort-scan skyline, no self-join. The running max routes
    // through Packing.groupedRunningMax (n_chars-bucketed two-phase, DESC
    // encoded by negation), not a per-source window — source is a
    // low-cardinality funnel key. alpha_ppm is an integer floor ratio,
    // so dominance replays exactly; output is the frontier, not the
    // corpus.
    "q171_pareto_front" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("(cast(length(regexp_replace(text, '[^A-Za-z]', '')) " +
            "as bigint) * 1000000) div n_chars").as("alpha_ppm"))
        .withColumn("neg_a", lit(0L) - col("alpha_ppm"))
      graft.operators.Packing
        .groupedRunningMax(d, "source", Seq("n_chars", "neg_a", "doc_id"),
          "alpha_ppm", "best_prev")
        .filter(col("best_prev").isNull ||
          col("alpha_ppm") > col("best_prev"))
        .select(col("source"), col("doc_id"), col("n_chars"),
          col("alpha_ppm"))
    }),

    // ADAPTIVE quality gate: keep docs strictly above their source's
    // median quality — the per-domain thresholding every curation recipe
    // uses instead of one global cutoff (a clean source and a noisy one
    // need different bars). The median is the distributed exact
    // selection (type-1, a value that EXISTS, so the > comparison
    // replays bit-for-bit on the q22 quality doubles); medians broadcast
    // back (rows = sources), one counting pass. Reports the gate's
    // effect per source: docs kept and char mass retained.
    "q172_quality_gate" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextOps.qualityScore(col("text")).as("quality"))
      val med = graft.operators.TimeSeriesOps
        .exactQuantiles(d, "source", "quality", "doc_id", Seq(0.5),
          materializeInput = false)
        .select(col("source"), col("value").as("median_q"))
      d.join(broadcast(med), Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("median_q")).as("median_q"),
          sum(when(col("quality") > col("median_q"), 1L).otherwise(0L))
            .as("n_kept"),
          sum(when(col("quality") > col("median_q"), col("n_chars"))
            .otherwise(lit(0L))).as("kept_chars"))
    }),

    // Rank-Biased Overlap (Webber et al., TOIS'10), truncated at depth
    // 10 with p = ½: how much the BM25 ranking and the raw
    // term-frequency ranking agree for the same query — the
    // ranking-agreement audit behind any scorer swap. Both top-10 lists
    // come from the bounded heap (no global sort); everything after is
    // O(depth²) on ONE row: per-depth prefix overlaps via array
    // intersection, and the weighted cumulation in EXACT integers —
    // with p = ½ the weight (1−p)p^(d−1)/d = 1/(d·2^d) divides
    // L = lcm(1..10)·2¹⁰ = 2 580 480, so cum·(1/L) needs only a final
    // single IEEE division for the float RBO. The 1-row × 1-row
    // crossJoin is whitelisted by design.
    "q173_rbo" -> ((s, dir) => {
      val f = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("toks"))
        .select(col("doc_id"),
          bmTerms.map(t => size(filter(col("toks"), x => x === lit(t))))
            .reduce(_ + _).as("tf_sum"))
      val aTop = bm25Scores(s, dir)
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("score"), col("doc_id"), 10).as("al"))
        .select(expr("transform(al, x -> x.id)").as("a"))
      val bTop = f
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("tf_sum").cast("double"), col("doc_id"), 10)
          .as("bl"))
        .select(expr("transform(bl, x -> x.id)").as("b"))
      aTop.crossJoin(broadcast(bTop))
        .withColumn("po", expr(
          """transform(sequence(1, 10), d -> named_struct(
            |  'd', d,
            |  'ov', size(array_intersect(slice(a, 1, d), slice(b, 1, d)))))"""
            .stripMargin))
        .withColumn("rows", expr(
          """aggregate(po,
            |  struct(cast(0 as bigint) as cum,
            |         cast(array() as array<struct<d:int,ov:int,cum:bigint>>) as out),
            |  (s, x) -> named_struct(
            |    'cum', s.cum + x.ov * (2580480 div (x.d * shiftleft(1, x.d))),
            |    'out', array_append(s.out, named_struct('d', x.d, 'ov', x.ov,
            |      'cum', s.cum + x.ov * (2580480 div (x.d * shiftleft(1, x.d)))))),
            |  s -> s.out)""".stripMargin))
        .select(explode(col("rows")).as("r"))
        .select(col("r.d").as("depth"), col("r.ov").as("overlap"),
          col("r.cum").as("cum_scaled"),
          (col("r.cum").cast("double") / lit(2580480.0)).as("rbo_trunc"))
    }),

    // Per-source quality ECDF (quantile normalization): each doc's
    // quality mapped to its within-source rank share in ppm — the
    // calibration that makes scores COMPARABLE across heterogeneous
    // sources before any global cutoff (q172 gates at one quantile;
    // this emits the whole transform). The rank is Packing.groupedCumSum
    // OF ONES — a per-group ROW_NUMBER through the salted two-phase
    // plan, no per-source window. Bucketing rides a long projection of
    // quality (cast(q·10¹², long): monotone, ties refined by the true
    // double then doc_id, so the order is exactly (quality, doc_id));
    // the ppm share is an integer floor — hash-exact with the q22
    // quality doubles.
    "q174_quality_ecdf" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text")).as("quality"))
        .withColumn("qs", (col("quality") * lit(1.0e12)).cast("long"))
        .withColumn("one", lit(1L))
      val ranked = graft.operators.Packing.groupedCumSum(
        d, "source", Seq("qs", "quality", "doc_id"), "one", "rnk")
      val n = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      ranked.join(broadcast(n), Seq("source"))
        .select(col("source"), col("doc_id"), col("quality"), col("rnk"),
          expr("(rnk * 1000000) div n_docs").as("ecdf_ppm"))
    }),

    // MAP-typed column surface: per doc, a term→tf map built with
    // map_from_arrays, pruned with map_filter, rewritten with
    // transform_values (tf²), folded with aggregate over map_values,
    // and exploded back to rows — the MAP half of the collection-
    // function battery (q90 covers arrays). Integer outputs; the oracle
    // computes the same semantics relationally, so parity is on VALUES
    // (DuckDB's MAP internals differ by design). Per-row codegen'd
    // expressions, shuffle-free scan.
    "q178_map_funcs" -> ((s, dir) => {
      val terms = Seq("spark", "join", "window", "data", "stream")
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("toks"))
        .withColumn("m", map_from_arrays(
          array(terms.map(lit): _*),
          array(terms.map(t =>
            size(filter(col("toks"), x => x === lit(t)))): _*)))
        .withColumn("m2", expr("map_filter(m, (k, v) -> v > 0)"))
        .withColumn("m3", expr("transform_values(m2, (k, v) -> v * v)"))
        .withColumn("doc_total",
          expr("aggregate(map_values(m3), 0, (a, x) -> a + x)"))
        .filter(size(col("m3")) > 0)
        .select(col("doc_id"), col("doc_total"),
          explode(col("m3")).as(Seq("token", "tf_sq")))
    })
  )

  /** q98 query terms: mid-frequency corpus vocabulary — enough df spread
    * to exercise the idf, present in most shards at any SF. */
  private val bmTerms = Seq("spark", "join", "window")

  /** BM25 (k1 = 1.2, b = 0.75) per-document scores for [[bmTerms]] —
    * the scorer shared by q98 (lexical top-k) and q136 (hybrid RRF).
    * tf/dl are per-row HOFs (shuffle-free scan); corpus stats (N, avgdl,
    * df) are ONE map-side-combined aggregate with integer Σdl (a double
    * Σ would be order-sensitive), broadcast back as a 1-row scalar. The
    * idf is the log-free rational form (N−df+0.5)/(df+0.5) — ln()'s
    * last ulp is libm-dependent, division is IEEE-exact — so scores
    * replay digit-for-digit in the DuckDB oracle. */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val f = table(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("double").as("dl") +:
        bmTerms.map(t =>
          size(filter(col("toks"), x => x === lit(t))).cast("double")
            .as(s"tf_$t")): _*)
    val statCols =
      count(lit(1)).cast("double").as("n") +:
        (sum(col("dl").cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("avgdl") +:
        bmTerms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).cast("double")
            .as(s"df_$t"))
    val st = f.agg(statCols.head, statCols.tail: _*)
    def sTerm(t: String) =
      (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) *
        (col(s"tf_$t") * lit(2.2)) /
        (col(s"tf_$t") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    f.crossJoin(broadcast(st))
      .select(col("doc_id"), bmTerms.map(sTerm).reduce(_ + _).as("score"))
  }

  /** The DuckDB replay of [[bm25Scores]] as a WITH-chain body ending in
    * `sc(doc_id, score)` — shared verbatim by the q98 and q136 oracles. */
  private lazy val bm25OracleCtes: String = {
    val tf = bmTerms.map(t =>
      s"    CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf_$t")
      .mkString(",\n")
    val df = bmTerms.map(t =>
      s"    CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t")
      .mkString(",\n")
    val score = bmTerms.map(t =>
      s"(n - df_$t + 0.5) / (df_$t + 0.5) * (tf_$t * 2.2) / " +
        s"(tf_$t + 1.2 * (0.25 + 0.75 * dl / avgdl))")
      .mkString(" + ")
    s"""t AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
       |$tf
       |  FROM t),
       |st AS (
       |  SELECT CAST(COUNT(1) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE) AS avgdl,
       |$df
       |  FROM f),
       |sc AS (SELECT doc_id, $score AS score FROM f CROSS JOIN st)""".stripMargin
  }

  /** The composed training-data keep/drop decision (q44): quality,
    * repetition, contamination, and exact-dup rank joined per document.
    * Benchmark docs drop out via the contamination inner join (eval data
    * must never enter the training set). Every branch re-shuffles only on
    * doc_id, so AQE coalesces the joins; the per-row branches (quality,
    * repetition) are shuffle-free. Shared by q44 and the end-to-end q55. */
  private def filterPipeline(docs: DataFrame): DataFrame = {
    // quality + repetition are both per-row: one projection, one scan
    val perRow = docs
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"),
        Dedup.shinglesAll("toks", 3).as("grams"))
      .select(col("doc_id"), col("quality"),
        (lit(1.0) - size(array_distinct(col("grams"))) / size(col("grams")))
          .as("repetition"))
    val cont = TextOps.contamination(docs, "doc_id", "text",
      benchFilter = col("doc_id") % 50 === 0, k = 5)
      .select(col("doc_id"), col("contamination"))
    val dup = Dedup.exactDuplicates(docs, "doc_id", "text")
      .select(col("doc_id"), col("is_duplicate"))
    perRow.join(dup, Seq("doc_id")).join(cont, Seq("doc_id"))
      .withColumn("keep",
        col("quality") >= 0.5 && col("repetition") <= 0.2 &&
          col("contamination") < 0.5 && !col("is_duplicate"))
  }

  /** q124's domain-mixture plan, shared with q130's execution: per-source
    * token totals + FNV-derived weights → largest no-oversampling budget
    * → per-source planned tokens and ppm sampling rates. Pure integer
    * arithmetic; one corpus aggregate + two 1-row broadcasts. */
  private def mixturePlan(s: SparkSession, dir: String): DataFrame = {
    val perSource = table(s, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(TextOps.tokenCount(col("text")).cast("long")).as("tok_total"))
      .withColumn("weight",
        pmod(graft.functions.GraftFunctions.rolling_fingerprint(col("source")),
          lit(900L)) + lit(100L))
    val wsum = perSource.agg(sum(col("weight")).as("wsum"))
    val capped = perSource.crossJoin(broadcast(wsum))
      .withColumn("cap", expr("(tok_total * wsum) div weight"))
    val budget = capped.agg(min(col("cap")).as("budget"))
    capped.crossJoin(broadcast(budget))
      .select(col("source"), col("weight"), col("tok_total"),
        expr("(budget * weight) div wsum").as("planned_tok"))
      .withColumn("rate_ppm", expr(
        "CASE WHEN tok_total = 0 THEN 0L ELSE (planned_tok * 1000000) div tok_total END"))
  }

  def oracles: Map[String, String] = Map(
    "q86_canonical_docs" -> canonicalSql,

    "q91_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS h_old FROM documents WHERE doc_id % 7 <> 0),
        |neu AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS h_new
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
        |  CASE WHEN h_old IS NULL THEN 'added'
        |       WHEN h_new IS NULL THEN 'removed'
        |       WHEN h_old <> h_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM old FULL JOIN neu ON old.doc_id = neu.doc_id""".stripMargin,

    "q92_source_znorm" ->
      s"""WITH stats AS (
         |  SELECT source, ${sqlAvg("n_chars")} AS mu, ${sqlStddev0("n_chars")} AS sigma
         |  FROM documents GROUP BY source)
         |SELECT d.source, d.doc_id, d.n_chars,
         |  CASE WHEN sigma = 0.0 THEN 0.0 ELSE (d.n_chars - mu) / sigma END AS z
         |FROM documents d JOIN stats USING (source)""".stripMargin,

    "q96_countmin" -> {
      val probeList = cmProbes.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH toks AS (
         |  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
         |         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
         |  FROM documents),
         |occ AS (SELECT unnest(toks) AS term FROM toks),
         |seeds AS (SELECT unnest(range(0, $cmDepth)) AS i),
         |counts AS (
         |  SELECT i,
         |    CAST(concat('0x', substr(md5(term || '#' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % $cmWidth AS b,
         |    COUNT(1) AS c
         |  FROM occ CROSS JOIN seeds GROUP BY i, b),
         |pb AS (
         |  SELECT p.term, s.i,
         |    CAST(concat('0x', substr(md5(p.term || '#' || CAST(s.i AS VARCHAR)), 1, 8)) AS BIGINT) % $cmWidth AS b
         |  FROM (SELECT unnest($probeList) AS term) p CROSS JOIN seeds s)
         |SELECT pb.term, CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est
         |FROM pb LEFT JOIN counts c ON c.i = pb.i AND c.b = pb.b
         |GROUP BY pb.term""".stripMargin
    },

    "q95_string_funcs" ->
      """SELECT doc_id,
        |  upper(substr(text, 1, 20)) AS head_upper,
        |  regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
        |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_novowel,
        |  CAST(length(translate(text, 'aeiou', 'AEIOU')) AS BIGINT) AS n_translated,
        |  CAST(instr(text, 'the') AS BIGINT) AS pos_the,
        |  CAST(levenshtein(substr(text, 1, 10), reverse(substr(text, 1, 10))) AS BIGINT) AS lev_rev
        |FROM documents""".stripMargin,

    "q93_group_sample_k" ->
      """SELECT lang, doc_id, CAST(rn AS INT) AS rnk FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) ASC,
        |               doc_id ASC) AS rn
        |  FROM documents) WHERE rn <= 10""".stripMargin,

    "q90_array_hof" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long,
        |  CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS total_len,
        |  CAST(list_max(list_transform(toks, t -> length(t))) AS BIGINT) AS max_len,
        |  len(list_filter(toks, t -> regexp_matches(t, '[0-9]'))) > 0 AS has_digit
        |FROM t""".stripMargin,

    "q54_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |starts AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS s FROM toks)
        |SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id,
        |  CAST(len(toks[s+1:s+32]) AS INT) AS n_tok,
        |  array_to_string(toks[s+1:s+32], ' ') AS chunk
        |FROM starts""".stripMargin,

    "q50_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |terms AS (SELECT doc_id, unnest(toks) AS term FROM toks),
        |tf AS (SELECT doc_id, term, COUNT(1) AS tf FROM terms GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(1) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(1) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, term AS top_term, tf, df, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term ASC) AS rn
        |  FROM scored) WHERE rn = 1""".stripMargin,

    "q51_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE WHEN lang = 'es' THEN '20'
        |       WHEN lang = 'en' THEN '80'
        |       ELSE '10' END""".stripMargin,

    "q69_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0),
        |n AS (SELECT COUNT(1) AS n_tokens FROM toks)
        |SELECT token, COUNT(1) AS cnt
        |FROM toks CROSS JOIN n
        |GROUP BY token, n_tokens
        |HAVING COUNT(1) > n_tokens / 51.0""".stripMargin,

    "q68_corpus_split" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '08' THEN 'val'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10' THEN 'test'
        |       ELSE 'train' END AS split,
        |  ROW_NUMBER() OVER (ORDER BY
        |    md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR)) AS shuffle_rank
        |FROM documents""".stripMargin,

    "q41_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, CASE WHEN len(toks) < 5 THEN 2 ELSE len(toks) - 3 END)) AS i
        |  FROM toks),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    CASE WHEN len(toks) < 5 THEN array_to_string(toks, ' ')
        |         ELSE array_to_string(toks[i:i+4], ' ') END AS gram
        |  FROM idx),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0)
        |SELECT g.doc_id,
        |  COUNT(*) AS n_grams,
        |  COUNT(b.gram) AS n_contaminated,
        |  COUNT(b.gram) / COUNT(*) AS contamination
        |FROM grams g LEFT JOIN bench b USING (gram)
        |WHERE g.doc_id % 50 <> 0
        |GROUP BY g.doc_id""".stripMargin,

    "q42_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, CASE WHEN len(toks) < 3 THEN 2 ELSE len(toks) - 1 END)) AS i
        |  FROM toks),
        |grams AS (
        |  SELECT doc_id,
        |    list(CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
        |         ELSE array_to_string(toks[i:i+2], ' ') END) AS grams
        |  FROM idx GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(len(grams) AS INT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
        |  1.0 - len(list_distinct(grams)) / len(grams) AS repetition
        |FROM grams""".stripMargin,

    "q46_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS INT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
        |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 2048) AS INT) AS bin
        |FROM t""".stripMargin,

    "q45_pii_redaction" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')) AS redacted_md5
        |FROM documents""".stripMargin,

    "q73_components" -> componentsSql,
    "q74_components_star" -> componentsSql,

    // Integer branching ratios mirror Spark's `div` with DuckDB's `//`
    // (both positive operands); the single final divide is one IEEE op.
    // q135: the quality replay (q22's formula), the same bin + exploded
    // cumulative + integer ppm share.
    "q135_quality_coverage" -> {
      val tokExpr =
        """CAST(CASE WHEN length(trim(text)) = 0 THEN 0
          |     ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)""".stripMargin
      s"""WITH qual AS (SELECT doc_id, quality FROM ($qualityLangSql)),
         |tk AS (SELECT doc_id, $tokExpr AS tok FROM documents),
         |d AS (
         |  SELECT least(CAST(floor(quality * 20) AS INT), 19) AS bucket, tok
         |  FROM qual JOIN tk USING (doc_id)),
         |byb AS (SELECT bucket, COUNT(*) AS docs, SUM(tok) AS toks
         |        FROM d GROUP BY bucket),
         |ex AS (SELECT unnest(range(0, bucket + 1)) AS thr, docs, toks FROM byb),
         |cum AS (SELECT thr, SUM(docs) AS cum_docs, SUM(toks) AS cum_toks
         |        FROM ex GROUP BY thr),
         |tot AS (SELECT SUM(toks) AS tot_toks FROM byb)
         |SELECT CAST(b.bucket AS INT) AS bucket, b.docs,
         |  CAST(b.toks AS BIGINT) AS toks,
         |  CAST(c.cum_docs AS BIGINT) AS cum_docs,
         |  CAST(c.cum_toks AS BIGINT) AS cum_toks,
         |  CAST((c.cum_toks * 1000000) // t.tot_toks AS BIGINT) AS cum_tok_ppm
         |FROM byb b JOIN cum c ON c.thr = b.bucket CROSS JOIN tot t""".stripMargin
    },

    // q134: the same (source, token) distincts, self-join intersection
    // counts, and single-divide Jaccard.
    "q134_vocab_jaccard" ->
      s"""WITH st AS (
         |  SELECT DISTINCT source, unnest(${HashOracleSql.tokSql}) AS token
         |  FROM documents),
         |sizes AS (SELECT source, COUNT(*) AS vsize FROM st GROUP BY source),
         |i AS (
         |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
         |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT i.src_a, i.src_b, i.inter,
         |  sa.vsize + sb.vsize - i.inter AS vunion,
         |  CAST(i.inter AS DOUBLE)
         |    / CAST(sa.vsize + sb.vsize - i.inter AS DOUBLE) AS jaccard
         |FROM i JOIN sizes sa ON i.src_a = sa.source
         |JOIN sizes sb ON i.src_b = sb.source""".stripMargin,

    // q132: window-4 co-occurrence pairs (1-based list math mirroring the
    // 0-based Spark HOF), canonical dedup, degree orientation, wedge
    // self-join, closure probe — integer counting throughout.
    "q132_cooc_triangles" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${HashOracleSql.tokSql} AS tk FROM documents),
         |idx AS (
         |  SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
         |  FROM toks WHERE len(tk) >= 2),
         |pr AS (
         |  SELECT least(tk[i], tk[j]) AS w1, greatest(tk[i], tk[j]) AS w2
         |  FROM (SELECT doc_id, tk, i,
         |          unnest(range(i + 1, least(i + 4, len(tk)) + 1)) AS j
         |        FROM idx)
         |  WHERE tk[i] <> tk[j]),
         |edges AS (SELECT DISTINCT w1, w2 FROM pr),
         |deg AS (
         |  SELECT t, COUNT(*) AS d
         |  FROM (SELECT w1 AS t FROM edges UNION ALL SELECT w2 FROM edges)
         |  GROUP BY t),
         |o AS (
         |  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.w1 < e.w2)
         |              THEN e.w1 ELSE e.w2 END AS src,
         |         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.w1 < e.w2)
         |              THEN e.w2 ELSE e.w1 END AS dst
         |  FROM edges e JOIN deg d1 ON e.w1 = d1.t JOIN deg d2 ON e.w2 = d2.t),
         |w AS (
         |  SELECT a.src, a.dst AS b, x.dst AS c
         |  FROM o a JOIN o x ON a.src = x.src WHERE a.dst < x.dst),
         |tri AS (
         |  SELECT w.src, w.b, w.c
         |  FROM w JOIN edges e ON w.b = e.w1 AND w.c = e.w2),
         |t3 AS (SELECT unnest([src, b, c]) AS token FROM tri)
         |SELECT token, COUNT(*) AS triangles FROM t3 GROUP BY token""".stripMargin,

    // q131: the same integer ppm-share arithmetic, vocab-sized CTEs, and
    // (|Δppm| DESC, token) ranking replayed verbatim.
    "q131_domain_tokens" ->
      s"""WITH toks AS (
         |  SELECT source, unnest(${HashOracleSql.tokSql}) AS token FROM documents),
         |bysrc AS (SELECT source, token, COUNT(*) AS obs
         |          FROM toks GROUP BY source, token),
         |g0 AS (SELECT token, COUNT(*) AS gcnt FROM toks GROUP BY token),
         |st AS (SELECT source, SUM(obs) AS src_total FROM bysrc GROUP BY source),
         |ct AS (SELECT SUM(obs) AS corpus_total FROM bysrc),
         |sc AS (
         |  SELECT b.source, b.token, b.obs, g.gcnt,
         |    CAST((b.obs * 1000000) // st.src_total AS BIGINT) AS ppm_src,
         |    CAST((g.gcnt * 1000000) // ct.corpus_total AS BIGINT) AS ppm_corpus
         |  FROM bysrc b JOIN st ON b.source = st.source
         |  JOIN g0 g ON b.token = g.token CROSS JOIN ct),
         |r AS (
         |  SELECT *, abs(ppm_src - ppm_corpus) AS ppm_diff,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY abs(ppm_src - ppm_corpus) DESC, token) AS rank
         |  FROM sc)
         |SELECT source, CAST(rank AS INT) AS rank, token, obs, gcnt,
         |       ppm_src, ppm_corpus, ppm_diff
         |FROM r WHERE rank <= 10""".stripMargin,

    "q117_bigram_surprise" ->
      s"""WITH toks AS (SELECT doc_id, ${HashOracleSql.tokSql} AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
         |        FROM toks WHERE len(tk) >= 2)),
         |bc AS (SELECT w1, w2, COUNT(1) AS bc FROM bg GROUP BY w1, w2),
         |pc AS (SELECT w1, COUNT(1) AS pc FROM bg GROUP BY w1)
         |SELECT doc_id, COUNT(1) AS n_bigrams,
         |  CAST(SUM(pc // bc) AS BIGINT) AS sum_surprise,
         |  CAST(SUM(pc // bc) AS DOUBLE) / COUNT(1) AS avg_surprise
         |FROM bg JOIN bc USING (w1, w2) JOIN pc USING (w1)
         |GROUP BY doc_id""".stripMargin,

    "q118_trigram_novelty" ->
      s"""WITH toks AS (SELECT doc_id, ${HashOracleSql.tokSql} AS tk FROM documents),
         |shs AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |         ELSE list_transform(range(0, len(tk) - 2),
         |                i -> array_to_string(tk[i+1:i+3], ' ')) END) AS sh
         |  FROM toks),
         |g AS (SELECT doc_id, ${HashOracleSql.fnvSql("s")} AS gh
         |      FROM (SELECT doc_id, unnest(sh) AS s FROM shs)),
         |d AS (SELECT gh, COUNT(1) AS df FROM g GROUP BY gh)
         |SELECT doc_id, COUNT(1) AS n_grams,
         |  COUNT(1) FILTER (WHERE df = 1) AS n_unique,
         |  CAST(COUNT(1) FILTER (WHERE df = 1) AS DOUBLE) / COUNT(1) AS novelty
         |FROM g JOIN d USING (gh) GROUP BY doc_id""".stripMargin,

    // √ and ÷ are correctly-rounded IEEE ops (unlike ln/pow), so the
    // alpha-mixture thresholds mirror exactly; to_hex/lpad as in q78.
    "q119_alpha_mixture" ->
      """WITH c AS (SELECT lang, COUNT(1) AS n_docs FROM documents GROUP BY lang),
        |m AS (SELECT MIN(n_docs) AS n_min FROM c),
        |r AS (SELECT lang, n_docs,
        |        lpad(lower(to_hex(CAST(greatest(0, least(floor(
        |          sqrt(CAST(n_min AS DOUBLE) / n_docs) * 65536), 65535)) AS BIGINT))),
        |          4, '0') AS thr
        |      FROM c, m)
        |SELECT d.doc_id, d.lang, r.n_docs, r.thr
        |FROM documents d JOIN r USING (lang)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < r.thr""".stripMargin,

    "q120_leakage_safe_split" -> HashOracleSql.leakageSafeSplitSql,

    // The hash-kernel replay family (HashOracleSql): FNV-1a / MinHash /
    // SimHash reproduced in DuckDB with HUGEINT mod-2⁶⁴ arithmetic —
    // previously rows-only, now fully hash-matched.
    "q24_fingerprint" -> HashOracleSql.fingerprintSql,
    "q26_minhash_sigs" -> HashOracleSql.minhashSigsSql,
    "q27_minhash_pairs" -> HashOracleSql.minhashPairsSql,
    "q28_simhash_pairs" -> HashOracleSql.simhashPairsSql,
    "q43_dup_clusters" -> HashOracleSql.simhashComponentsSql,
    "q52_incremental_dedup" -> HashOracleSql.minhashPairsAgainstSql,

    // q184 probes the persisted index built with q52's parameters over
    // q52's batch/corpus split, so its output is definitionally the same
    // pair set — the oracle replay is shared.
    "q184_index_probe" -> HashOracleSql.minhashPairsAgainstSql,
    "q56_clusters_star" -> HashOracleSql.simhashComponentsSql,

    "q44_filter_pipeline" -> filterSql,

    "q55_clean_chunks" ->
      s"""WITH kept AS (SELECT doc_id FROM ($filterSql) WHERE keep),
         |ktoks AS (
         |  SELECT d.doc_id, string_split_regex(trim(d.text), '\\s+') AS toks, d.lang
         |  FROM documents d JOIN kept USING (doc_id)
         |  WHERE length(trim(d.text)) > 0),
         |kstarts AS (
         |  SELECT doc_id, lang, toks, unnest(range(0, len(toks), 24)) AS s FROM ktoks),
         |kchunks AS (
         |  SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id, lang,
         |    CAST(len(toks[s+1:s+32]) AS INT) AS n_tok
         |  FROM kstarts)
         |SELECT doc_id, chunk_id, lang, n_tok,
         |  CAST(SUM(n_tok) OVER w AS BIGINT) AS cum_tok,
         |  CAST(floor((SUM(n_tok) OVER w - n_tok) / 2048) AS INT) AS bin
         |FROM kchunks
         |WINDOW w AS (PARTITION BY lang ORDER BY doc_id, chunk_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    // Mirrors Dedup.editDistancePairs: same prefix blocking, same
    // length-difference bound, same levenshtein (both engines implement
    // the standard unit-cost edit distance).
    "q75_edit_neardups" ->
      """WITH d AS (
        |  SELECT p_partkey, p_name, substr(p_name, 1, 12) AS blk,
        |         length(p_name) AS len
        |  FROM part),
        |c AS (SELECT *, count(*) OVER (PARTITION BY blk) AS bn FROM d),
        |f AS (SELECT * FROM c WHERE bn <= 1024)
        |SELECT a.p_partkey AS doc_id_a, b.p_partkey AS doc_id_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM f a JOIN f b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        |  AND abs(a.len - b.len) <= 3
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,

    // Mirrors Sampling.weightedHashSample over TextOps.qualityScore: the
    // same md5-prefix vs hex-threshold string comparison, the same
    // floor/clamp arithmetic on the same derived double.
    "q78_weighted_sample" ->
      s"""WITH q AS ($qualityLangSql)
         |SELECT doc_id, lang, quality FROM q
         |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
         |  lpad(lower(to_hex(CAST(greatest(0, least(floor(quality * 65536),
         |    65535)) AS BIGINT))), 4, '0')""".stripMargin,

    // Mirrors Dedup.sharedWindowPairs gram-for-gram with string windows
    // (Spark travels 64-bit hashes; counts agree absent a collision —
    // q41's accepted contract).
    "q79_shared_windows" ->
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |    ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 8)) AS i
        |        FROM toks WHERE len(toks) >= 10),
        |grams AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+9], ' ') AS g
        |          FROM idx),
        |rare AS (SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 10)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM grams a JOIN rare USING (g) JOIN grams b USING (g)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    // Mirrors Packing.budgetTake: same quality/token arithmetic, the
    // same greedy-prefix rule — the oracle may use the plain per-lang
    // window (it doesn't need to scale; the Spark side must not).
    "q83_budget_take" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN n = 0 THEN 0.0 ELSE
         |      0.4 * least(1.0, n / 100.0) +
         |      0.3 * (nd / CAST(n AS DOUBLE)) +
         |      0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS quality,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS INT) AS n_tokens
         |  FROM (
         |    SELECT doc_id, lang, text,
         |      CASE WHEN length(trim(text)) = 0 THEN 0
         |           ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n,
         |      len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS nd,
         |      len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |          t -> t IN $stopIn)) AS stop
         |    FROM documents))
         |SELECT doc_id, lang, quality, n_tokens FROM (
         |  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang
         |    ORDER BY -floor(quality * 1e6), doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM base)
         |WHERE cum - n_tokens < 5000""".stripMargin,

    // Mirrors TextOps.sentences: same split regex (RE2-safe), same
    // 0-based pre-filter index, same trim/empty-drop, same token count.
    "q82_sentences" ->
      """WITH s AS (
        |  SELECT doc_id, string_split_regex(text, '[.!?]+') AS parts
        |  FROM documents),
        |i AS (SELECT doc_id, parts, unnest(range(0, len(parts))) AS i FROM s),
        |x AS (SELECT doc_id, CAST(i AS INT) AS sent_id,
        |             trim(parts[i + 1]) AS sentence FROM i)
        |SELECT doc_id, sent_id, sentence,
        |  CAST(len(string_split_regex(sentence, '\s+')) AS INT) AS n_tokens
        |FROM x WHERE length(sentence) > 0""".stripMargin,

    "q80_source_profile" ->
      s"""WITH d AS (
         |  SELECT source, lang, n_chars,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS INT) AS n_tokens,
         |    CASE WHEN n = 0 THEN 0.0 ELSE
         |      0.4 * least(1.0, n / 100.0) +
         |      0.3 * (nd / CAST(n AS DOUBLE)) +
         |      0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS quality
         |  FROM (
         |    SELECT source, lang, n_chars, text,
         |      CASE WHEN length(trim(text)) = 0 THEN 0
         |           ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n,
         |      len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS nd,
         |      len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |          t -> t IN $stopIn)) AS stop
         |    FROM documents))
         |SELECT source, COUNT(1) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  MIN(quality) AS min_quality, MAX(quality) AS max_quality
         |FROM d GROUP BY source""".stripMargin,

    // Same left-assoc float expression tree as the Spark side; integer
    // corpus sums; ROW_NUMBER mirrors the heap's (score desc, id) order.
    "q98_bm25" ->
      s"""WITH $bm25OracleCtes
         |SELECT doc_id, score, CAST(rn AS INT) AS rnk FROM (
         |  SELECT doc_id, score,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |  FROM sc)
         |WHERE rn <= 10""".stripMargin,

    // Hybrid RRF: the BM25 CTE chain is q98's verbatim; the cosine is
    // q30's DOUBLE[]-cast op tree; 1/(60+rank) is forced to IEEE DOUBLE
    // (a bare 1.0 literal would be DECIMAL in DuckDB and round
    // differently than the JVM divide).
    "q136_rrf_fusion" ->
      s"""WITH $bm25OracleCtes,
         |lex AS (SELECT doc_id, rn AS r FROM (
         |  SELECT doc_id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |  FROM sc) WHERE rn <= 50),
         |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id = 0),
         |cv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
         |       FROM embeddings),
         |sem AS (SELECT doc_id, rn AS r FROM (
         |  SELECT vec_id AS doc_id,
         |    ROW_NUMBER() OVER (ORDER BY
         |      CASE WHEN list_inner_product(cv, cv) = 0.0
         |             OR list_inner_product(qv, qv) = 0.0 THEN 0.0
         |           ELSE list_inner_product(cv, qv)
         |             / (sqrt(list_inner_product(cv, cv))
         |                * sqrt(list_inner_product(qv, qv))) END DESC,
         |      vec_id ASC) AS rn
         |  FROM cv CROSS JOIN qv) WHERE rn <= 50),
         |fuse AS (
         |  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         |    COALESCE(CAST(1 AS DOUBLE) / CAST(60 + lex.r AS DOUBLE),
         |             CAST(0 AS DOUBLE))
         |    + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + sem.r AS DOUBLE),
         |               CAST(0 AS DOUBLE)) AS rrf_score
         |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         |SELECT doc_id, rrf_score, CAST(rn AS INT) AS rnk FROM (
         |  SELECT doc_id, rrf_score,
         |    ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rn
         |  FROM fuse)
         |WHERE rn <= 20""".stripMargin,

    // Same trim/\s+ token convention as q41/q98; the <5-token whole-doc
    // gram mirrors Dedup.shinglesAll's CASE exactly.
    "q138_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 4),
        |                i -> array_to_string(toks[i + 1:i + 5], ' ')) END
        |      AS grams
        |  FROM t),
        |e AS (SELECT doc_id, unnest(grams) AS gram FROM g)
        |SELECT gram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(1) AS n_occ,
        |  MIN(doc_id) AS first_doc
        |FROM e GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin,

    // Gram STRINGS here vs 64-bit gram hashes on the Spark side — the
    // same relation modulo ~n²/2⁶⁴ collisions (q73's standard trade).
    // Zero-token docs have no shingles (no '' gram), mirroring the
    // kernel's n=0 case.
    "q139_containment" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
        |         ELSE array_to_string(toks[i:i+2], ' ') END AS gram
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, CASE WHEN len(toks) < 3 THEN 2 ELSE len(toks) - 1 END)) AS i
        |        FROM toks WHERE len(toks) >= 1)),
        |rare AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 20),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM grams a JOIN rare USING (gram) JOIN grams b USING (gram)
        |  WHERE a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS i
        |  FROM cand c
        |  JOIN grams ga ON ga.doc_id = c.id_a
        |  JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
        |  GROUP BY c.id_a, c.id_b)
        |SELECT id_a, id_b, i AS inter, sa.sz AS size_a, sb.sz AS size_b,
        |  CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS cont_a_in_b,
        |  CAST(i AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS cont_b_in_a
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = inter.id_a
        |JOIN sizes sb ON sb.doc_id = inter.id_b
        |WHERE greatest(CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE),
        |               CAST(i AS DOUBLE) / CAST(sb.sz AS DOUBLE)) >= 0.8""".stripMargin,

    "q144_quality_norm_corr" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val sx = "SUM(CAST(x AS DECIMAL(18,6)))"
      val sy = "SUM(CAST(y AS DECIMAL(18,6)))"
      val sxy = "SUM(CAST(CAST(x AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)) AS DECIMAL(38,12)))"
      val sxx = "SUM(CAST(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)) AS DECIMAL(38,12)))"
      val syy = "SUM(CAST(CAST(y AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)) AS DECIMAL(38,12)))"
      s"""WITH q AS (SELECT doc_id, source, quality AS x
         |           FROM (${qualityColSql("source")})),
         |v AS (SELECT vec_id AS doc_id,
         |        sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
         |                                CAST(embedding AS DOUBLE[]))) AS y
         |      FROM embeddings),
         |j AS (SELECT source, x, y FROM q JOIN v USING (doc_id)),
         |a AS (SELECT source, CAST(COUNT(1) AS DOUBLE) AS n,
         |        ${d2(sx)} AS sx, ${d2(sy)} AS sy, ${d2(sxy)} AS sxy,
         |        ${d2(sxx)} AS sxx, ${d2(syy)} AS syy
         |      FROM j GROUP BY source)
         |SELECT source, CAST(n AS BIGINT) AS n,
         |  CASE WHEN sxx - sx * sx / n <= 0.0 OR syy - sy * sy / n <= 0.0
         |       THEN 0.0
         |       ELSE (sxy - sx * sy / n)
         |            / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))
         |  END AS corr
         |FROM a""".stripMargin
    },

    "q145_bpe_pairs" ->
      """WITH t AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |              ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT unnest(toks) AS w FROM t),
        |p AS (
        |  SELECT substr(w, i, 2) AS pair
        |  FROM (SELECT w, unnest(range(1, length(w))) AS i
        |        FROM tok WHERE length(w) >= 2)),
        |c AS (SELECT pair, COUNT(1) AS cnt FROM p GROUP BY pair)
        |SELECT pair, cnt FROM (
        |  SELECT pair, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS rn
        |  FROM c)
        |WHERE rn <= 50""".stripMargin,

    "q140_collocations" ->
      """WITH t AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |              ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
        |  FROM (SELECT toks, unnest(range(0, len(toks) - 1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |bc AS (SELECT w1, w2, COUNT(1) AS c_ab FROM bg GROUP BY w1, w2
        |       HAVING COUNT(1) >= 5),
        |uni AS (SELECT unnest(toks) AS w FROM t),
        |uc AS (SELECT w, COUNT(1) AS c FROM uni GROUP BY w),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uc)
        |SELECT w1, w2, c_ab, c_a, c_b, pmi_ppm FROM (
        |  SELECT bc.w1, bc.w2, bc.c_ab, a.c AS c_a, b.c AS c_b,
        |    (bc.c_ab * tot.n_tokens * 1000000) // (a.c * b.c) AS pmi_ppm,
        |    ROW_NUMBER() OVER (ORDER BY
        |      (bc.c_ab * tot.n_tokens * 1000000) // (a.c * b.c) DESC,
        |      bc.w1 ASC, bc.w2 ASC) AS rn
        |  FROM bc JOIN uc a ON a.w = bc.w1 JOIN uc b ON b.w = bc.w2
        |  CROSS JOIN tot)
        |WHERE rn <= 50""".stripMargin,

    // The oracle's per-source window is fine single-node; the Spark
    // side's running weight is the salted two-phase cumsum.
    "q113_weighted_median" ->
      """WITH c AS (
        |  SELECT source, n_chars, doc_id,
        |    SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(n_chars) OVER (PARTITION BY source) AS total
        |  FROM documents),
        |q AS (
        |  SELECT source, n_chars, doc_id, total,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars, doc_id) AS rn
        |  FROM c WHERE cum * 2 >= total)
        |SELECT source, CAST(total AS BIGINT) AS total_chars,
        |  n_chars AS split_len, doc_id AS split_doc
        |FROM q WHERE rn = 1""".stripMargin,

    // Same running sum (the oracle's window is fine single-node) and
    // the same start_offset div target file assignment.
    "q147_file_plan" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents),
        |f AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST((cum - n_chars) // 65536 AS BIGINT) AS file_idx
        |  FROM c)
        |SELECT source, file_idx, COUNT(1) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS file_bytes,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM f GROUP BY source, file_idx""".stripMargin,

    // The K-boundary is the same strict (cnt DESC, w ASC) total order;
    // tokens are the learned-vocab BPE symbols (trained rounds replayed).
    "q149_vocab_coverage" ->
      s"""WITH ${bpeSymbolCtes(bpeStoreRounds, Seq("source"))},
         |sw AS (SELECT source, w, COUNT(1) AS c FROM sym
         |  GROUP BY source, w),
         |vocab AS (
         |  SELECT w FROM (
         |    SELECT w, SUM(c) AS cnt FROM sw GROUP BY w)
         |  ORDER BY cnt DESC, w ASC LIMIT 16)
         |SELECT source,
         |  CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.w IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
         |  COUNT(CASE WHEN v.w IS NULL THEN 1 END) AS n_oov_types,
         |  CAST(SUM(CASE WHEN v.w IS NULL THEN c ELSE 0 END) * 1000000
         |    // SUM(c) AS BIGINT) AS oov_ppm
         |FROM sw LEFT JOIN vocab v USING (w)
         |GROUP BY source""".stripMargin,

    // Corpus-wide md5 dup counts joined back; the quality mean is the
    // shared split decimal→double discipline (d2).
    "q150_dataset_card" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val sq = "SUM(CAST(q AS DECIMAL(18,6)))"
      s"""WITH d AS (
         |  SELECT source, lang, n_chars, md5(text) AS h,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_toks,
         |    CASE WHEN n = 0 THEN 0.0 ELSE
         |      0.4 * least(1.0, n / 100.0) +
         |      0.3 * (nd / CAST(n AS DOUBLE)) +
         |      0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS q
         |  FROM (
         |    SELECT source, lang, n_chars, text,
         |      CASE WHEN length(trim(text)) = 0 THEN 0
         |           ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n,
         |      len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS nd,
         |      len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |          t -> t IN $stopIn)) AS stop
         |    FROM documents)),
         |dup AS (SELECT h, COUNT(1) AS nh FROM d GROUP BY h)
         |SELECT source, COUNT(1) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
         |  COUNT(DISTINCT lang) AS n_langs,
         |  COUNT(CASE WHEN nh >= 2 THEN 1 END) AS n_dup_docs,
         |  (${d2(sq)}) / CAST(COUNT(1) AS DOUBLE) AS mean_quality
         |FROM d JOIN dup USING (h)
         |GROUP BY source""".stripMargin
    },

    // The q73/q86 reachability closure + singleton labeling, collapsed
    // to the size histogram.
    "q152_cluster_sizes" ->
      s"""$componentsCtes,
         |labels AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
         |lab AS (
         |  SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id),
         |cs AS (SELECT cluster, COUNT(1) AS csize FROM lab GROUP BY cluster)
         |SELECT CAST(csize AS BIGINT) AS csize, COUNT(1) AS n_clusters,
         |  CAST(csize * COUNT(1) AS BIGINT) AS n_docs
         |FROM cs GROUP BY csize""".stripMargin,

    // Rank + running sum via the oracle's window (fine single-node);
    // the same strict (cnt DESC, w ASC) order as the Spark fold; tokens
    // are the learned-vocab BPE symbols (trained rounds replayed).
    "q154_zipf_curve" ->
      s"""WITH ${bpeSymbolCtes(bpeStoreRounds, Nil)},
         |u AS (SELECT w, COUNT(1) AS cnt FROM sym GROUP BY w),
        |r AS (SELECT w, cnt,
        |        ROW_NUMBER() OVER (ORDER BY cnt DESC, w ASC) AS rank
        |      FROM u),
        |c AS (SELECT rank,
        |        SUM(cnt) OVER (ORDER BY rank
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM r WHERE rank <= 32),
        |t AS (SELECT SUM(cnt) AS total FROM u),
        |ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k)
        |SELECT CAST(k AS INT) AS k, CAST(cum AS BIGINT) AS covered,
        |  CAST(total AS BIGINT) AS total,
        |  CAST(cum * 1000000 // total AS BIGINT) AS covered_ppm
        |FROM ks JOIN c ON c.rank = k CROSS JOIN t""".stripMargin,

    // q147's file layout → per-file max → the same skip rule.
    "q157_skipping_manifest" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents),
        |f AS (
        |  SELECT source, CAST((cum - n_chars) // 65536 AS BIGINT) AS file_idx,
        |    COUNT(1) AS n_docs, MAX(n_chars) AS max_len
        |  FROM c GROUP BY source, (cum - n_chars) // 65536)
        |SELECT source, COUNT(1) AS n_files,
        |  COUNT(CASE WHEN max_len < 400 THEN 1 END) AS n_skippable,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN max_len < 400 THEN n_docs ELSE 0 END) AS BIGINT)
        |    AS docs_skipped,
        |  CAST(COUNT(CASE WHEN max_len < 400 THEN 1 END) * 1000000
        |    // COUNT(1) AS BIGINT) AS skip_ppm
        |FROM f GROUP BY source""".stripMargin,

    // The same integer cross-product rules over list-HOF counts.
    "q161_gopher_rules" ->
      """WITH t AS (
        |  SELECT source,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT source,
        |    CAST(len(toks) AS BIGINT) AS n,
        |    CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS chars,
        |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha,
        |    CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$'))) AS BIGINT) AS num
        |  FROM t),
        |f AS (
        |  SELECT source,
        |    n >= 4 AND n <= 1000 AS f_count,
        |    chars >= n * 3 AND chars <= n * 10 AS f_wordlen,
        |    alpha * 5 >= n * 4 AS f_alpha,
        |    num * 10 <= n AS f_numeric
        |  FROM c)
        |SELECT source, COUNT(1) AS n_docs,
        |  COUNT(CASE WHEN f_count THEN 1 END) AS pass_count,
        |  COUNT(CASE WHEN f_wordlen THEN 1 END) AS pass_wordlen,
        |  COUNT(CASE WHEN f_alpha THEN 1 END) AS pass_alpha,
        |  COUNT(CASE WHEN f_numeric THEN 1 END) AS pass_numeric,
        |  COUNT(CASE WHEN f_count AND f_wordlen AND f_alpha AND f_numeric
        |        THEN 1 END) AS pass_all
        |FROM f GROUP BY source""".stripMargin,

    // The same √ / √√ trees and the same 1/65536 hex threshold.
    "q165_temperature_sweep" ->
      """WITH c AS (SELECT lang, COUNT(1) AS n_docs FROM documents GROUP BY lang),
        |m AS (SELECT MIN(n_docs) AS n_min FROM c),
        |r AS (SELECT lang, n_docs,
        |        CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE) AS r
        |      FROM c CROSS JOIN m),
        |a AS (SELECT unnest([0.25, 0.5, 0.75]::DOUBLE[]) AS alpha),
        |x AS (
        |  SELECT lang, alpha, n_docs,
        |    CASE WHEN alpha = 0.25 THEN sqrt(sqrt(r))
        |         WHEN alpha = 0.5 THEN sqrt(r)
        |         ELSE sqrt(r) * sqrt(sqrt(r)) END AS rate
        |  FROM r CROSS JOIN a)
        |SELECT lang, alpha, CAST(n_docs AS BIGINT) AS n_docs, rate,
        |  lpad(lower(hex(CAST(greatest(0, least(floor(rate * 65536),
        |    65535)) AS BIGINT))), 4, '0') AS thr
        |FROM x""".stripMargin,

    // q98's scorer CTEs + the 5 greedy rounds unrolled; each round's
    // maxsim is a MAX over the identical Jaccard divisions, each pick
    // the identical (mmr DESC, doc_id ASC) order. MATERIALIZED pins the
    // multiply-referenced round CTEs (the q129 lesson).
    "q164_mmr_rerank" -> {
      val rounds = (2 to 5).map { i =>
        val prev = s"s${i - 1}"
        s"""r$i AS (
           |  SELECT c.doc_id, any_value(c.toks) AS toks,
           |    any_value(c.rel) AS rel,
           |    MAX(CAST(len(list_intersect(c.toks, s.toks)) AS DOUBLE)
           |      / CAST(len(list_distinct(list_concat(c.toks, s.toks))) AS DOUBLE))
           |      AS maxsim
           |  FROM cand c, $prev s
           |  WHERE c.doc_id NOT IN (SELECT doc_id FROM $prev)
           |  GROUP BY c.doc_id),
           |p$i AS (SELECT doc_id, toks, rel FROM r$i
           |  ORDER BY CAST(0.5 AS DOUBLE) * rel
           |           - CAST(0.5 AS DOUBLE) * maxsim DESC, doc_id ASC
           |  LIMIT 1),
           |s$i AS MATERIALIZED (SELECT * FROM $prev
           |  UNION ALL SELECT * FROM p$i)"""
      }.mkString(",\n")
      s"""WITH $bm25OracleCtes,
         |tk AS (SELECT doc_id, list_distinct(toks) AS toks FROM t),
         |cand AS MATERIALIZED (
         |  SELECT cc.doc_id, cc.score AS rel, tk.toks FROM (
         |    SELECT doc_id, score FROM (
         |      SELECT doc_id, score,
         |        ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
         |      FROM sc) WHERE rn <= 20) cc
         |  JOIN tk ON tk.doc_id = cc.doc_id),
         |s1 AS MATERIALIZED (
         |  SELECT doc_id, toks, rel FROM cand
         |  ORDER BY rel DESC, doc_id ASC LIMIT 1),
         |$rounds,
         |sel AS (
         |  SELECT doc_id, rel, 1 AS rank FROM s1
         |  UNION ALL SELECT doc_id, rel, 2 FROM p2
         |  UNION ALL SELECT doc_id, rel, 3 FROM p3
         |  UNION ALL SELECT doc_id, rel, 4 FROM p4
         |  UNION ALL SELECT doc_id, rel, 5 FROM p5)
         |SELECT CAST(rank AS INT) AS rank, doc_id, rel FROM sel""".stripMargin
    },

    // The q73 edge CTEs + doc→source joins, least/greatest normalized.
    "q162_copy_matrix" ->
      s"""$componentsCtes,
         |m AS (
         |  SELECT least(da.source, db.source) AS s1,
         |         greatest(da.source, db.source) AS s2
         |  FROM edges e
         |  JOIN documents da ON da.doc_id = e.id_a
         |  JOIN documents db ON db.doc_id = e.id_b)
         |SELECT s1, s2, COUNT(1) AS n_pairs FROM m GROUP BY s1, s2""".stripMargin,

    // Same largest-remainder apportionment (integer div/mod, ties by
    // source/lang asc) and the same md5 rank-within-stratum assignment.
    "q169_stratified_split" ->
      """WITH strata AS (
        |  SELECT source, lang, COUNT(1) AS n_docs
        |  FROM documents GROUP BY source, lang),
        |tot AS (SELECT SUM(n_docs) AS total, SUM(n_docs // 10) AS base_sum
        |        FROM strata),
        |q AS (
        |  SELECT source, lang, n_docs,
        |    n_docs // 10 +
        |    CASE WHEN ROW_NUMBER() OVER (ORDER BY n_docs % 10 DESC,
        |           source, lang) <= (SELECT total // 10 - base_sum FROM tot)
        |         THEN 1 ELSE 0 END AS quota
        |  FROM strata),
        |r AS (
        |  SELECT d.source, d.lang, d.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY d.source, d.lang
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
        |  FROM documents d)
        |SELECT r.source, r.lang,
        |  CAST(MAX(q.n_docs) AS BIGINT) AS n_docs,
        |  CAST(MAX(q.quota) AS BIGINT) AS quota,
        |  CAST(SUM(CASE WHEN r.rk <= q.quota THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test,
        |  CAST(SUM(CASE WHEN r.rk <= q.quota THEN r.doc_id ELSE 0 END)
        |    AS BIGINT) AS test_id_sum
        |FROM r JOIN q ON r.source = q.source AND r.lang = q.lang
        |GROUP BY r.source, r.lang""".stripMargin,

    // Same translate case-fold + regex canonicalization ('g' flag =
    // Spark's replace-all default) and the same two md5 dup passes.
    "q170_canonical_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) AS raw_h,
        |    md5(trim(regexp_replace(regexp_replace(
        |      translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
        |                'abcdefghijklmnopqrstuvwxyz'),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS can_h
        |  FROM documents),
        |rd AS (SELECT raw_h FROM d GROUP BY raw_h HAVING COUNT(1) > 1),
        |cd AS (SELECT can_h FROM d GROUP BY can_h HAVING COUNT(1) > 1)
        |SELECT d.source, COUNT(1) AS n_docs,
        |  CAST(SUM(CASE WHEN rd.raw_h IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS raw_dup_docs,
        |  CAST(SUM(CASE WHEN cd.can_h IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS canon_dup_docs
        |FROM d LEFT JOIN rd ON d.raw_h = rd.raw_h
        |       LEFT JOIN cd ON d.can_h = cd.can_h
        |GROUP BY d.source""".stripMargin,

    // the markup template AND the strip chain are generated from the
    // same Scala structures the Spark query folds over
    // (htmlParts / TextOps.htmlTextSteps) — symmetry by construction
    "q186_html_extract" ->
      s"""WITH m AS (SELECT doc_id, $htmlMarkupSql AS markup FROM documents),
         |x AS (SELECT doc_id, ${TextOps.htmlTextSql("markup")} AS x FROM m)
         |SELECT doc_id, md5(x) AS extracted_md5,
         |  CAST(length(x) AS INT) AS x_chars,
         |  CAST(CASE WHEN length(trim(x)) = 0 THEN 0
         |       ELSE len(string_split_regex(trim(x), '\\s+')) END AS INT)
         |    AS x_tokens
         |FROM x""".stripMargin,

    // the host/domain SQL is GENERATED from the same TextOps vals the
    // Spark ops compile (urlHostSql/registrableDomainSql — pattern,
    // trailing-dot strip, and ccSLD list all shared), and the rank
    // replays q169's ROW_NUMBER idiom (md5 is collision-free across
    // distinct ids, so the secondary key never decides)
    "q190_domain_quota" ->
      s"""WITH d AS (SELECT doc_id,
         |    'https://' ||
         |    CASE WHEN doc_id % 7 = 0 THEN 'user:pw@' ELSE '' END ||
         |    lang || '.' || source || 'press.' ||
         |    CASE WHEN doc_id % 3 = 0 THEN 'com'
         |         WHEN doc_id % 3 = 1 THEN 'co.uk' ELSE 'com.au' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN '.' ELSE '' END ||
         |    '/docs/' ||
         |    CAST(doc_id AS VARCHAR) || '?utm_source=feed#top' AS url
         |  FROM documents),
         |h AS (SELECT doc_id,
         |    ${TextOps.registrableDomainSql(TextOps.urlHostSql("url"))}
         |      AS domain
         |  FROM d),
         |r AS (SELECT domain, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY domain
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM h)
         |SELECT domain, doc_id, CAST(rk AS BIGINT) AS quota_rank
         |FROM r WHERE rk <= 10""".stripMargin,

    // the markup template, the three href patterns, and the
    // classification CASE all render from the same TextOps/linkParts
    // structures the Spark query compiles — symmetry by construction
    "q191_link_graph" ->
      s"""WITH $linkEdgeCtes
         |SELECT src_domain, dst_domain,
         |  CAST(COUNT(1) AS BIGINT) AS n_links
         |FROM e GROUP BY src_domain, dst_domain""".stripMargin,

    // q191's edge CTEs + the q99 integer PageRank rounds unrolled, with
    // the operator's src-node coalesce (a src that is never a dst keeps
    // contributing the floor mass) mirrored via the pf CTEs
    "q193_domain_pagerank" ->
      s"""WITH $linkEdgeCtes,
         |edges AS (SELECT src_domain AS src, dst_domain AS dst FROM e
         |          GROUP BY src_domain, dst_domain),
         |deg AS (SELECT src, COUNT(1) AS outdeg FROM edges GROUP BY src),
         |wd AS (SELECT x.src, x.dst, d2.outdeg
         |       FROM edges x JOIN deg d2 USING (src)),
         |sn AS (SELECT src AS node FROM deg),
         |pf0 AS (SELECT node, 1000000::BIGINT AS pr FROM sn),
         |p1 AS (SELECT dst AS node, 150000 + (85 * SUM(pr // outdeg)) // 100 AS pr
         |       FROM wd JOIN pf0 ON src = node GROUP BY dst),
         |pf1 AS (SELECT sn.node, coalesce(p1.pr, 150000) AS pr
         |        FROM sn LEFT JOIN p1 USING (node)),
         |p2 AS (SELECT dst AS node, 150000 + (85 * SUM(pr // outdeg)) // 100 AS pr
         |       FROM wd JOIN pf1 ON src = node GROUP BY dst),
         |pf2 AS (SELECT sn.node, coalesce(p2.pr, 150000) AS pr
         |        FROM sn LEFT JOIN p2 USING (node)),
         |p3 AS (SELECT dst AS node, 150000 + (85 * SUM(pr // outdeg)) // 100 AS pr
         |       FROM wd JOIN pf2 ON src = node GROUP BY dst)
         |SELECT node, CAST(pr AS BIGINT) AS pr FROM p3""".stripMargin,

    // the q193 rounds with weighted mass passing: per edge
    // (pr * n_links) // wsum, wsum = per-src weight total
    "q198_weighted_pagerank" ->
      s"""WITH $linkEdgeCtes,
         |edges AS (SELECT src_domain AS src, dst_domain AS dst,
         |            COUNT(1) AS w
         |          FROM e GROUP BY src_domain, dst_domain),
         |ws AS (SELECT src, SUM(w) AS wsum FROM edges GROUP BY src),
         |wd AS (SELECT x.src, x.dst, x.w, s2.wsum
         |       FROM edges x JOIN ws s2 USING (src)),
         |sn AS (SELECT src AS node FROM ws),
         |pf0 AS (SELECT node, 1000000::BIGINT AS pr FROM sn),
         |p1 AS (SELECT dst AS node,
         |         150000 + (85 * SUM((pr * w) // wsum)) // 100 AS pr
         |       FROM wd JOIN pf0 ON src = node GROUP BY dst),
         |pf1 AS (SELECT sn.node, coalesce(p1.pr, 150000) AS pr
         |        FROM sn LEFT JOIN p1 USING (node)),
         |p2 AS (SELECT dst AS node,
         |         150000 + (85 * SUM((pr * w) // wsum)) // 100 AS pr
         |       FROM wd JOIN pf1 ON src = node GROUP BY dst),
         |pf2 AS (SELECT sn.node, coalesce(p2.pr, 150000) AS pr
         |        FROM sn LEFT JOIN p2 USING (node)),
         |p3 AS (SELECT dst AS node,
         |         150000 + (85 * SUM((pr * w) // wsum)) // 100 AS pr
         |       FROM wd JOIN pf2 ON src = node GROUP BY dst)
         |SELECT node, CAST(pr AS BIGINT) AS pr FROM p3""".stripMargin,

    // positioned line split via the componentsCtes range-unnest idiom;
    // string_agg skips the CASE's NULLs in pos order, mirroring Spark's
    // null-dropping collect_list + sort_array reassembly; the
    // all-boilerplate doc coalesces to '' on both sides
    "q189_boilerplate_lines" ->
      """WITH d AS (SELECT doc_id,
        |    'please accept cookies to continue' || chr(10) || text ||
        |    chr(10) || 'copyright ' || source || ' all rights reserved' ||
        |    chr(10) || 'document ' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents),
        |l AS (SELECT doc_id, i AS pos, parts[i] AS ln
        |      FROM (SELECT doc_id, string_split(t, chr(10)) AS parts,
        |                   unnest(range(1, len(string_split(t, chr(10))) + 1)) AS i
        |            FROM d)),
        |f AS (SELECT md5(ln) AS h, COUNT(DISTINCT doc_id) AS docfreq
        |      FROM l GROUP BY 1),
        |k AS (SELECT l.doc_id, l.pos, l.ln, f.docfreq <= 10 AS keep
        |      FROM l JOIN f ON md5(l.ln) = f.h)
        |SELECT doc_id,
        |  md5(coalesce(string_agg(CASE WHEN keep THEN ln END, chr(10)
        |                          ORDER BY pos), '')) AS clean_md5,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM k GROUP BY doc_id""".stripMargin,

    // the q22 quality formula replayed over the EXTRACTED text; only
    // integers aggregate past the per-row IEEE gate
    "q188_web_pipeline" ->
      s"""WITH m AS (SELECT doc_id, source, $htmlMarkupSql AS markup
         |           FROM documents),
         |x AS (SELECT doc_id, source, ${TextOps.htmlTextSql("markup")} AS x
         |      FROM m),
         |t AS (SELECT doc_id, source,
         |    CASE WHEN length(trim(x)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(lower(x)), '\\s+')) END AS n,
         |    len(list_distinct(string_split_regex(trim(lower(x)), '\\s+'))) AS nd,
         |    len(list_filter(string_split_regex(trim(lower(x)), '\\s+'),
         |        w -> w IN $stopIn)) AS stop
         |  FROM x),
         |q AS (SELECT source, n,
         |    CASE WHEN n = 0 THEN 0.0 ELSE
         |      0.4 * least(1.0, n / 100.0) +
         |      0.3 * (nd / CAST(n AS DOUBLE)) +
         |      0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS quality
         |  FROM t)
         |SELECT source, CAST(COUNT(1) AS BIGINT) AS kept_docs,
         |  CAST(SUM(n) AS BIGINT) AS token_mass
         |FROM q WHERE quality > 0.55 AND n >= 60
         |GROUP BY source""".stripMargin,

    // the same 3 greedy rounds unrolled as CTEs (see bpeRoundCtes)
    "q192_bpe_merges" -> bpeOracleSql(3),

    // the stored-artifact application replayed as the full 16 trained
    // rounds inline — hash-equality IS the stored ≡ inline proof
    "q197_bpe_store" -> bpeOracleSql(bpeStoreRounds),

    // the whole ladder replayed: q186's extraction, q189's line strip
    // (docfreq ≤ 10), q196's span removal (k=5, df>1), q44's keep
    // decision over the cleaned relation (filterSqlOver nested as a
    // subquery), then q55's chunk+pack with lang joined back from
    // documents. MATERIALIZED at each stage boundary — the chain
    // references each stage 2-3×, and inline expansion would re-run
    // the 25-pass extraction per reference (the bpeRoundCtes lesson).
    "q199_web_to_sequences" ->
      s"""WITH m AS MATERIALIZED (
         |  SELECT doc_id, $htmlMarkupSql AS markup FROM documents),
         |x AS MATERIALIZED (
         |  SELECT doc_id, ${TextOps.htmlTextSql("markup")} AS x FROM m),
         |bl AS (SELECT doc_id, i AS pos, parts[i] AS ln
         |  FROM (SELECT doc_id, string_split(x, chr(10)) AS parts,
         |          unnest(range(1, len(string_split(x, chr(10))) + 1)) AS i
         |        FROM x)),
         |bf AS (SELECT md5(ln) AS h, COUNT(DISTINCT doc_id) AS docfreq
         |       FROM bl GROUP BY 1),
         |bk AS (SELECT bl.doc_id, bl.pos, bl.ln, bf.docfreq <= 10 AS keep
         |       FROM bl JOIN bf ON md5(bl.ln) = bf.h),
         |sb AS MATERIALIZED (SELECT doc_id,
         |    coalesce(string_agg(CASE WHEN keep THEN ln END, chr(10)
         |                        ORDER BY pos), '') AS t
         |  FROM bk GROUP BY doc_id),
         |b AS (SELECT doc_id,
         |    CASE WHEN length(trim(t)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE string_split_regex(trim(t), '\\s+') END AS toks
         |  FROM sb),
         |tok AS (SELECT doc_id, i AS pos, toks[i] AS tok
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(1, len(toks) + 1)) AS i FROM b)),
         |g AS (SELECT doc_id, n, j AS gpos,
         |    md5(array_to_string(toks[j:j+4], ' ')) AS gh
         |  FROM (SELECT doc_id, toks, len(toks) AS n,
         |          unnest(range(1, greatest(len(toks) - 3, 2))) AS j
         |        FROM b WHERE len(toks) > 0)),
         |sdup AS (SELECT gh FROM (
         |    SELECT gh, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gh)
         |  WHERE df > 1),
         |cov AS (SELECT DISTINCT doc_id, pos FROM (
         |    SELECT g.doc_id,
         |      unnest(range(g.gpos, least(g.gpos + 5, g.n + 1))) AS pos
         |    FROM g JOIN sdup USING (gh))),
         |skept AS (SELECT t.doc_id, t.pos, t.tok
         |  FROM tok t LEFT JOIN cov c
         |    ON t.doc_id = c.doc_id AND t.pos = c.pos
         |  WHERE c.pos IS NULL),
         |sr AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean,
         |       COUNT(1) AS n_kept FROM skept GROUP BY doc_id),
         |cl AS MATERIALIZED (
         |  SELECT sb.doc_id, coalesce(sr.clean, '') AS text
         |  FROM sb LEFT JOIN sr USING (doc_id)),
         |fkept AS (SELECT doc_id FROM (${filterSqlOver("cl")}) WHERE keep),
         |ktoks AS (
         |  SELECT c.doc_id, string_split_regex(trim(c.text), '\\s+') AS toks,
         |         d.lang
         |  FROM cl c JOIN fkept USING (doc_id)
         |    JOIN documents d ON d.doc_id = c.doc_id
         |  WHERE length(trim(c.text)) > 0),
         |kstarts AS (
         |  SELECT doc_id, lang, toks, unnest(range(0, len(toks), 24)) AS s
         |  FROM ktoks),
         |kchunks AS (
         |  SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id, lang,
         |    CAST(len(toks[s+1:s+32]) AS INT) AS n_tok
         |  FROM kstarts)
         |SELECT doc_id, chunk_id, lang, n_tok,
         |  CAST(SUM(n_tok) OVER w AS BIGINT) AS cum_tok,
         |  CAST(floor((SUM(n_tok) OVER w - n_tok) / 2048) AS INT) AS bin
         |FROM kchunks
         |WINDOW w AS (PARTITION BY lang ORDER BY doc_id, chunk_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    // positioned tokens + grams via the range-unnest idiom (1-based —
    // positions never leave either engine, so the base doesn't matter);
    // DuckDB's inclusive list slice toks[j:j+4] ≡ Spark's slice(t,i,5),
    // both capped at the list end; the LEFT JOIN brings back
    // all-duplicate docs as empty rows
    "q196_span_dedup" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text ||
        |      ' this block is quoted verbatim across many pages today'
        |    ELSE text END AS t FROM documents),
        |b AS (SELECT doc_id,
        |    CASE WHEN length(trim(t)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(t), '\s+') END AS toks
        |  FROM d),
        |tok AS (SELECT doc_id, i AS pos, toks[i] AS tok
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, len(toks) + 1)) AS i FROM b)),
        |g AS (SELECT doc_id, n, j AS gpos,
        |    md5(array_to_string(toks[j:j+4], ' ')) AS gh
        |  FROM (SELECT doc_id, toks, len(toks) AS n,
        |          unnest(range(1, greatest(len(toks) - 3, 2))) AS j
        |        FROM b WHERE len(toks) > 0)),
        |dup AS (SELECT gh FROM (
        |    SELECT gh, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gh)
        |  WHERE df > 1),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |    SELECT g.doc_id,
        |      unnest(range(g.gpos, least(g.gpos + 5, g.n + 1))) AS pos
        |    FROM g JOIN dup USING (gh))),
        |kept AS (SELECT t.doc_id, t.pos, t.tok
        |  FROM tok t LEFT JOIN cov c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean,
        |    COUNT(1) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT d2.doc_id, md5(coalesce(r.clean, '')) AS clean_md5,
        |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST((CASE WHEN length(trim(d2.t)) = 0 THEN 0
        |        ELSE len(string_split_regex(trim(d2.t), '\s+')) END)
        |    - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        |FROM d d2 LEFT JOIN r USING (doc_id)""".stripMargin,

    // same md5 bucket/weight arithmetic; uni and bigram features as two
    // UNION ALL branches (Spark's single concat-explode ≡ the union);
    // token-empty/null docs come back via the LEFT JOIN with score 0
    "q195_hashed_classifier" ->
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN length(trim(lower(text))) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |f AS (SELECT doc_id, unnest(toks) AS f FROM t
        |      UNION ALL
        |      SELECT doc_id, toks[i] || '_' || toks[i+1] AS f
        |      FROM (SELECT doc_id, toks,
        |              unnest(range(1, len(toks))) AS i FROM t)),
        |w AS (SELECT doc_id,
        |    (CAST(concat('0x', substr(md5('w:' || CAST(
        |       CAST(concat('0x', substr(md5('gw1:' || f), 1, 8)) AS BIGINT)
        |         % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS w
        |  FROM f),
        |s AS (SELECT doc_id, COUNT(1) AS n_feats, SUM(w) AS score
        |      FROM w GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
        |  CAST(coalesce(score, 0) AS BIGINT) AS score,
        |  CAST(CASE WHEN coalesce(score, 0) > 0 THEN 1 ELSE 0 END AS INT)
        |    AS kept
        |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,

    // the canonicalization chain renders from TextOps.urlCanonSteps
    "q194_url_canon_dedup" ->
      s"""WITH d AS (SELECT source,
         |    'https://' || lang || '.' || source || 'press.com/a/' ||
         |    CAST(doc_id % 50 AS VARCHAR) ||
         |    CASE WHEN doc_id % 4 = 0
         |           THEN '?utm_source=feed&utm_campaign=spring'
         |         WHEN doc_id % 4 = 1 THEN '?q=1&gclid=CjkKEQ'
         |         WHEN doc_id % 4 = 2 THEN '#section-2' ELSE '' END AS url
         |  FROM documents)
         |SELECT source, CAST(COUNT(1) AS BIGINT) AS n_urls,
         |  CAST(COUNT(DISTINCT url) AS BIGINT) AS raw_distinct,
         |  CAST(COUNT(DISTINCT ${TextOps.canonicalizeUrlSql("url")})
         |    AS BIGINT) AS canon_distinct
         |FROM d GROUP BY source""".stripMargin,

    // chr(769) = U+0301 combining acute — the decomposed spelling; the
    // canonicalization chain is generated from TextOps.unicodeCanonSteps
    "q187_homoglyph_dedup" ->
      s"""WITH v AS (
         |  SELECT source, text AS vtext FROM documents
         |  UNION ALL SELECT source,
         |    translate(text, '$homoglyphLatin', '$homoglyphCyrillic')
         |    FROM documents
         |  UNION ALL SELECT source, replace(text, 'a', chr(225))
         |    FROM documents
         |  UNION ALL SELECT source, replace(text, 'a', 'a' || chr(769))
         |    FROM documents)
         |SELECT source, CAST(COUNT(1) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT md5(vtext)) AS BIGINT) AS raw_distinct,
         |  CAST(COUNT(DISTINCT md5(${TextOps.canonicalizeUnicodeSql("vtext")}))
         |    AS BIGINT) AS canon_distinct
         |FROM v GROUP BY source""".stripMargin,

    // Same sort-scan skyline: strict running-max dominance over the
    // identical (n_chars, alpha_ppm DESC, doc_id) order.
    "q171_pareto_front" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |      AS BIGINT) * 1000000) // n_chars AS alpha_ppm
        |  FROM documents WHERE n_chars > 0),
        |w AS (
        |  SELECT source, doc_id, n_chars, alpha_ppm,
        |    MAX(alpha_ppm) OVER (PARTITION BY source
        |      ORDER BY n_chars, alpha_ppm DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
        |  FROM d)
        |SELECT source, doc_id, n_chars, alpha_ppm FROM w
        |WHERE best_prev IS NULL OR alpha_ppm > best_prev""".stripMargin,

    // The q22 quality formula + the q107 selection rule (rn = ceil(q·n)
    // over (quality, doc_id)) + the same strict > gate.
    "q172_quality_gate" -> {
      s"""WITH qd AS (
         |${qualityColSql("source, n_chars")}),
         |r AS (
         |  SELECT source, doc_id, quality, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |                       ORDER BY quality, doc_id) AS rn,
         |    COUNT(1) OVER (PARTITION BY source) AS n
         |  FROM qd),
         |m AS (SELECT source, quality AS median_q FROM r
         |      WHERE rn = CAST(ceil(0.5 * n) AS BIGINT))
         |SELECT qd.source, COUNT(1) AS n_docs, MAX(m.median_q) AS median_q,
         |  CAST(SUM(CASE WHEN qd.quality > m.median_q THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN qd.quality > m.median_q THEN qd.n_chars
         |    ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM qd JOIN m ON qd.source = m.source
         |GROUP BY qd.source""".stripMargin
    },

    // The bm25 CTE chain supplies both rankings (sc scores, f raw tfs);
    // ROW_NUMBER mirrors the heap's (score DESC, id) order; prefix
    // overlaps and the same L = 2 580 480 integer weight cumulation.
    "q173_rbo" -> {
      s"""WITH $bm25OracleCtes,
         |a AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC,
         |        doc_id) AS rn FROM sc),
         |b AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY
         |        (tf_spark + tf_join + tf_window) DESC, doc_id) AS rn
         |      FROM f),
         |dd AS (SELECT unnest(generate_series(1, 10)) AS depth),
         |ov AS (
         |  SELECT depth,
         |    (SELECT COUNT(1) FROM a JOIN b ON a.doc_id = b.doc_id
         |     WHERE a.rn <= depth AND b.rn <= depth) AS overlap
         |  FROM dd),
         |c AS (
         |  SELECT depth, overlap,
         |    SUM(overlap * (2580480 // (depth * (1 << depth))))
         |      OVER (ORDER BY depth
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum
         |  FROM ov)
         |SELECT CAST(depth AS INT) AS depth, CAST(overlap AS INT) AS overlap,
         |  CAST(cum AS BIGINT) AS cum_scaled,
         |  CAST(cum AS DOUBLE) / 2580480.0 AS rbo_trunc
         |FROM c""".stripMargin
    },

    // ROW_NUMBER over (quality, doc_id) mirrors the cumsum-of-ones rank
    // (the long projection only buckets; ties resolve on the true
    // double then doc_id); same integer ppm floor.
    "q174_quality_ecdf" -> {
      s"""WITH qd AS (
         |${qualityColSql("source")}),
         |r AS (
         |  SELECT source, doc_id, quality,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |                       ORDER BY quality, doc_id) AS rnk,
         |    COUNT(1) OVER (PARTITION BY source) AS n
         |  FROM qd)
         |SELECT source, doc_id, quality, CAST(rnk AS BIGINT) AS rnk,
         |  (rnk * 1000000) // n AS ecdf_ppm
         |FROM r""".stripMargin
    },

    // The same term-tf semantics relationally (DuckDB MAP internals
    // differ by design; parity is on the exploded values).
    "q178_map_funcs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, term.t AS token,
        |         len(list_filter(toks, x -> x = term.t)) AS c
        |  FROM t CROSS JOIN (SELECT unnest(
        |    ['spark', 'join', 'window', 'data', 'stream']) AS t) term),
        |p AS (SELECT doc_id, token, c * c AS tf_sq FROM f WHERE c > 0),
        |tot AS (SELECT doc_id, SUM(tf_sq) AS doc_total FROM p GROUP BY doc_id)
        |SELECT p.doc_id, CAST(tot.doc_total AS INT) AS doc_total, p.token,
        |  CAST(p.tf_sq AS INT) AS tf_sq
        |FROM p JOIN tot USING (doc_id)""".stripMargin
  ) ++ scalarOracles

  /** doc_id, lang, quality — TextOps.qualityScore mirrored exactly (the
    * q22 formula, plus lang carried through for q78's output). */
  private def qualityColSql(carry: String): String =
    s"""SELECT doc_id, $carry,
       |  CASE WHEN n = 0 THEN 0.0 ELSE
       |    0.4 * least(1.0, n / 100.0) +
       |    0.3 * (nd / CAST(n AS DOUBLE)) +
       |    0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS quality
       |FROM (
       |  SELECT doc_id, $carry,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n,
       |    len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS nd,
       |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |        t -> t IN $stopIn)) AS stop
       |  FROM documents)""".stripMargin

  private def qualityLangSql: String = qualityColSql("lang")

  /** q73/q74's shared oracle: jaccardEdges mirrored in counting SQL
    * (grams → df-capped inverted index → candidate pairs → exact Jaccard
    * i/(szA+szB−i), one IEEE divide), then connected components as a
    * recursive reachability closure with MIN over reached ids — the
    * standard WITH RECURSIVE formulation of min-label components. Both
    * Spark algorithms (propagation q73, star contraction q74) must
    * hash-match this single SQL text. */
  private val componentsCtes: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
      |         ELSE array_to_string(toks[i:i+2], ' ') END AS gram
      |  -- len(toks) >= 1: a zero-token doc has NO shingles (the kernel's
      |  -- n=0 case), not one '' gram — two empty docs must not edge-pair
      |  FROM (SELECT doc_id, toks,
      |          unnest(range(1, CASE WHEN len(toks) < 3 THEN 2 ELSE len(toks) - 1 END)) AS i
      |        FROM toks WHERE len(toks) >= 1)),
      |rare AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 20),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM grams a JOIN rare USING (gram) JOIN grams b USING (gram)
      |  WHERE a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
      |inter AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS i
      |  FROM cand c
      |  JOIN grams ga ON ga.doc_id = c.id_a
      |  JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
      |  GROUP BY c.id_a, c.id_b),
      |edges AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = inter.id_a
      |  JOIN sizes sb ON sb.doc_id = inter.id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
      |nodes AS (SELECT id_a AS id FROM edges UNION SELECT id_b AS id FROM edges),
      |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
      |        UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id)""".stripMargin

  private val componentsSql: String =
    s"""$componentsCtes
       |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id""".stripMargin

  /** q86's oracle: the same reachability closure, extended to the keep
    * decision — every document labeled (cluster = component min for
    * edge-connected docs, own id for singletons), then one survivor per
    * cluster by (quality DESC, doc_id ASC). The window form here is the
    * oracle's prerogative; the Spark side uses the heap top-k aggregate. */
  private def canonicalSql: String =
    s"""$componentsCtes,
       |labels AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
       |qual AS (SELECT doc_id, quality FROM ($qualityLangSql)),
       |lab AS (
       |  SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster, q.quality
       |  FROM documents d
       |  LEFT JOIN labels l ON l.id = d.doc_id
       |  JOIN qual q ON q.doc_id = d.doc_id)
       |SELECT cluster, doc_id, quality FROM (
       |  SELECT cluster, doc_id, quality,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY quality DESC, doc_id ASC) AS rn
       |  FROM lab) WHERE rn = 1""".stripMargin

  /** q44's oracle SQL, shared verbatim by q55's `kept` stage and — over
    * the cleaned-text relation instead of raw `documents` — by q199's.
    * `rel` must expose (doc_id, text). */
  private def filterSqlOver(rel: String): String =
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
         |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
         |  FROM $rel),
         |rep AS (
         |  SELECT doc_id, 1.0 - len(list_distinct(grams)) / len(grams) AS repetition
         |  FROM (
         |    SELECT doc_id,
         |      list(CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
         |           ELSE array_to_string(toks[i:i+2], ' ') END) AS grams
         |    FROM (SELECT doc_id, toks,
         |            unnest(range(1, CASE WHEN len(toks) < 3 THEN 2 ELSE len(toks) - 1 END)) AS i
         |          FROM toks)
         |    GROUP BY doc_id)),
         |grams5 AS (
         |  SELECT DISTINCT doc_id,
         |    CASE WHEN len(toks) < 5 THEN array_to_string(toks, ' ')
         |         ELSE array_to_string(toks[i:i+4], ' ') END AS gram
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(1, CASE WHEN len(toks) < 5 THEN 2 ELSE len(toks) - 3 END)) AS i
         |        FROM toks)),
         |bench AS (SELECT DISTINCT gram FROM grams5 WHERE doc_id % 50 = 0),
         |cont AS (
         |  SELECT g.doc_id, COUNT(b.gram) / COUNT(*) AS contamination
         |  FROM grams5 g LEFT JOIN bench b USING (gram)
         |  WHERE g.doc_id % 50 <> 0
         |  GROUP BY g.doc_id),
         |qual AS (
         |  SELECT doc_id, CASE WHEN n = 0 THEN 0.0 ELSE
         |      0.4 * least(1.0, n / 100.0) +
         |      0.3 * (nd / CAST(n AS DOUBLE)) +
         |      0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS quality
         |  FROM (
         |    SELECT doc_id,
         |      CASE WHEN length(trim(text)) = 0 THEN 0
         |           ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n,
         |      len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS nd,
         |      len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |          t -> t IN $stopIn)) AS stop
         |    FROM $rel)),
         |dup AS (
         |  SELECT doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 AS is_duplicate
         |  FROM $rel)
         |SELECT q.doc_id, q.quality, r.repetition, c.contamination, d.is_duplicate,
         |  (q.quality >= 0.5 AND r.repetition <= 0.2 AND
         |   c.contamination < 0.5 AND NOT d.is_duplicate) AS keep
         |FROM qual q
         |JOIN rep r USING (doc_id)
         |JOIN dup d USING (doc_id)
         |JOIN cont c USING (doc_id)""".stripMargin

  private val filterSql: String = filterSqlOver("documents")

  private val scalarOracles: Map[String, String] = Map(
    "q20_dedup_exact" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS INT) AS dup_rank,
        |  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 AS is_duplicate
        |FROM documents""".stripMargin,

    // integer floor-division mirror of the Spark plan; the FNV weight
    // replays via the HUGEINT fold, pmod via the double-mod idiom
    "q124_mixture_plan" -> {
      val tokExpr =
        """CAST(CASE WHEN length(trim(text)) = 0 THEN 0
          |     ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)""".stripMargin
      s"""WITH per_source AS (
         |  SELECT source, SUM($tokExpr) AS tok_total,
         |    ((${HashOracleSql.fnvSql("source")} % 900) + 900) % 900 + 100 AS weight
         |  FROM documents GROUP BY source),
         |ws AS (SELECT SUM(weight) AS wsum FROM per_source),
         |capped AS (
         |  SELECT p.*, w.wsum, (p.tok_total * w.wsum) // p.weight AS cap
         |  FROM per_source p CROSS JOIN ws w),
         |b AS (SELECT MIN(cap) AS budget FROM capped)
         |SELECT source, weight, CAST(tok_total AS BIGINT) AS tok_total,
         |  CAST((b.budget * weight) // wsum AS BIGINT) AS planned_tok,
         |  CAST(CASE WHEN tok_total = 0 THEN 0
         |       ELSE (((b.budget * weight) // wsum) * 1000000) // tok_total END
         |    AS BIGINT) AS rate_ppm
         |FROM capped CROSS JOIN b""".stripMargin
    },

    // q130: the q124 plan CTE extended with the md5-threshold execution
    // — integer threshold, lowercase-hex lpad, 'g' keep-all sentinel,
    // all mirrored from the Spark predicate character for character.
    "q130_mixture_execute" -> {
      val tokExpr =
        """CAST(CASE WHEN length(trim(text)) = 0 THEN 0
          |     ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)""".stripMargin
      val tokExprD = tokExpr.replace("trim(text)", "trim(d.text)")
      s"""WITH per_source AS (
         |  SELECT source, SUM($tokExpr) AS tok_total,
         |    ((${HashOracleSql.fnvSql("source")} % 900) + 900) % 900 + 100 AS weight
         |  FROM documents GROUP BY source),
         |ws AS (SELECT SUM(weight) AS wsum FROM per_source),
         |capped AS (
         |  SELECT p.*, w.wsum, (p.tok_total * w.wsum) // p.weight AS cap
         |  FROM per_source p CROSS JOIN ws w),
         |b AS (SELECT MIN(cap) AS budget FROM capped),
         |plan AS (
         |  SELECT source,
         |    (b.budget * weight) // wsum AS planned_tok,
         |    CASE WHEN tok_total = 0 THEN 0
         |         ELSE (((b.budget * weight) // wsum) * 1000000) // tok_total
         |    END AS rate_ppm
         |  FROM capped CROSS JOIN b),
         |kept AS (
         |  SELECT d.source, COUNT(*) AS docs_kept, SUM($tokExprD) AS tok_kept
         |  FROM documents d JOIN plan p ON d.source = p.source
         |  WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) <
         |    CASE WHEN p.rate_ppm >= 1000000 THEN 'g'
         |         ELSE lpad(lower(hex((p.rate_ppm * 65536) // 1000000)), 4, '0') END
         |  GROUP BY d.source)
         |SELECT p.source, CAST(p.rate_ppm AS BIGINT) AS rate_ppm,
         |  CAST(p.planned_tok AS BIGINT) AS planned_tok,
         |  CAST(COALESCE(k.docs_kept, 0) AS BIGINT) AS docs_kept,
         |  CAST(COALESCE(k.tok_kept, 0) AS BIGINT) AS tok_kept
         |FROM plan p LEFT JOIN kept k ON p.source = k.source""".stripMargin
    },

    "q125_pack_materialize" ->
      """WITH toks AS (
        |  SELECT d.doc_id, string_split_regex(trim(d.text), '\s+') AS toks, d.lang
        |  FROM documents d WHERE length(trim(d.text)) > 0),
        |starts AS (
        |  SELECT doc_id, lang, toks, unnest(range(0, len(toks), 32)) AS s FROM toks),
        |chunks AS (
        |  SELECT doc_id, CAST(s // 32 AS INT) AS chunk_id, lang,
        |    CAST(len(toks[s+1:s+32]) AS INT) AS n_tok,
        |    array_to_string(toks[s+1:s+32], ' ') AS chunk
        |  FROM starts),
        |binned AS (
        |  SELECT doc_id, chunk_id, lang, n_tok, chunk,
        |    CAST(floor((SUM(n_tok) OVER w - n_tok) / 2048) AS INT) AS bin
        |  FROM chunks
        |  WINDOW w AS (PARTITION BY lang ORDER BY doc_id, chunk_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT lang, bin, COUNT(1) AS n_chunks,
        |  CAST(SUM(n_tok) AS BIGINT) AS seq_tok,
        |  string_agg(chunk, '<|eos|>' ORDER BY doc_id, chunk_id) AS seq_text
        |FROM binned GROUP BY lang, bin""".stripMargin,

    "q21_token_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "q22_quality" -> {
      s"""SELECT doc_id,
         |  CASE WHEN n = 0 THEN 0.0 ELSE
         |    0.4 * least(1.0, n / 100.0) +
         |    0.3 * (nd / CAST(n AS DOUBLE)) +
         |    0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS quality
         |FROM (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n,
         |    len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS nd,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        t -> t IN $stopIn)) AS stop
         |  FROM documents)""".stripMargin
    },

    "q25_langid" -> {
      // Mirrors TextOps.langId exactly: per-language stopword-hit rate,
      // argmax via lexicographic (score, lang) struct ordering (DuckDB
      // list_sort ≡ Spark greatest-over-structs), CJK short-circuit.
      val structs = TextOps.langProfiles.toSeq.sortBy(_._1).map { case (l, words) =>
        val in = words.map(w => s"'$w'").mkString("(", ", ", ")")
        s"struct_pack(score := len(list_filter(toks, t -> t IN $in)) / n, lang := '$l')"
      }.mkString(",\n        ")
      s"""WITH t AS (
         |  SELECT lang, text,
         |    CASE WHEN length(trim(text)) = 0 THEN []
         |         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
         |  FROM documents),
         | s AS (
         |  SELECT lang, text,
         |    CAST(greatest(len(toks), 1) AS DOUBLE) AS n, toks
         |  FROM t),
         | scored AS (
         |  SELECT lang, text,
         |    list_sort([$structs])[-1] AS best,
         |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))
         |      / CAST(greatest(length(text), 1) AS DOUBLE) AS cjk
         |  FROM s)
         |SELECT lang,
         |  CASE WHEN cjk > 0.3 THEN 'zh'
         |       WHEN best.score > 0.0 THEN best.lang
         |       ELSE 'und' END AS predicted,
         |  COUNT(1) AS n
         |FROM scored GROUP BY lang, predicted""".stripMargin
    },

    "q23_lang_profile" -> {
      s"""SELECT lang, COUNT(1) AS n_docs,
         |  ${sqlAvg("n_chars")} AS avg_chars,
         |  CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens,
         |  MIN(quality) AS min_quality, MAX(quality) AS max_quality
         |FROM (
         |  SELECT lang, n_chars, text,
         |    CASE WHEN n = 0 THEN 0.0 ELSE
         |      0.4 * least(1.0, n / 100.0) +
         |      0.3 * (nd / CAST(n AS DOUBLE)) +
         |      0.3 * least(1.0, 5.0 * stop / CAST(n AS DOUBLE)) END AS quality
         |  FROM (
         |    SELECT lang, n_chars, text,
         |      CASE WHEN length(trim(text)) = 0 THEN 0
         |           ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n,
         |      len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS nd,
         |      len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |          t -> t IN $stopIn)) AS stop
         |    FROM documents))
         |GROUP BY lang""".stripMargin
    }
  )
}
