package graft.queries

import graft.functions.HashKernels

/** DuckDB SQL that replays the repo's hash kernels BIT-FOR-BIT — the
  * machinery that turns the MinHash / SimHash / fingerprint family from
  * rows-only checks into full hash-matched oracles.
  *
  * Three ingredients make the kernels engine-portable:
  *  1. FNV-1a is a byte fold of xor + one wrapping 64-bit multiply. DuckDB
  *     BIGINT arithmetic is CHECKED (overflow throws), so the multiply
  *     routes through HUGEINT and an explicit mod 2⁶⁴, re-centered to the
  *     signed domain — bit-identical to JVM long wraparound. The corpus
  *     is ASCII, so `ord` per character equals the UTF-8 byte the kernel
  *     folds.
  *  2. The MinHash constants a_i/b_i come from the SAME splitmix64 the
  *     kernel runs ([[HashKernels.splitmix64]]), embedded as SQL literal
  *     arrays — no second implementation to drift.
  *  3. LSH band buckets key on `xxhash64(slice)` in Spark purely as an
  *     equi-join surrogate for slice equality; the oracle joins on the
  *     signature-slice LIST directly, which is the same relation
  *     (modulo 2⁻⁶⁴ xxhash collisions).
  *
  * Everything downstream (bucket caps, overlap prefilter, exact Jaccard,
  * Hamming distance, recursive reachability) is integer counting or a
  * single IEEE divide — the repo's standard cross-engine discipline.
  */
object HashOracleSql {

  private val U64 = "18446744073709551616"

  /** Re-center an unsigned HUGEINT expression into signed 64-bit. */
  private def s64(u: String): String =
    s"(CASE WHEN ($u) >= 9223372036854775808 THEN ($u) - $U64 ELSE ($u) END)::BIGINT"

  /** Lift a signed BIGINT expression to its unsigned HUGEINT value. */
  private def u64(v: String): String =
    s"(CASE WHEN ($v) < 0 THEN ($v)::HUGEINT + $U64 ELSE ($v)::HUGEINT END)"

  /** Wrapping 64-bit multiply of a signed expression by a small positive
    * constant — JVM `h * c` semantics under DuckDB's checked BIGINTs. */
  private[queries] def wmul(h: String, c: Long): String =
    s64(s"(${u64(h)} * $c) % $U64")

  private val FnvOffset = "-3750763034362895579::BIGINT"
  private val FnvPrime = 1099511628211L

  /** FNV-1a of a VARCHAR expression — [[HashKernels.fnv1a]] replayed as a
    * per-character list fold (ASCII input: ord == byte). */
  def fnvSql(t: String): String =
    s"list_reduce(list_prepend($FnvOffset, " +
      s"list_transform(range(1, length($t) + 1), i -> ord(($t)[i]))), " +
      s"(h, b) -> ${wmul("xor(h, b)", FnvPrime)})"

  /** TextOps.tokens: whitespace split of trimmed text, [] for blank. */
  val tokSql: String =
    """CASE WHEN trim(text) = '' THEN []::VARCHAR[]
      |     ELSE regexp_split_to_array(trim(text), '\s+') END""".stripMargin

  /** The kernel's MinHash constants, as DuckDB list literals. */
  private def abLists(numHashes: Int): (String, String) = {
    val a = (0 until numHashes).map(i =>
      (HashKernels.splitmix64(i.toLong) >>> 35) | 1L)
    val b = (0 until numHashes).map(i =>
      HashKernels.splitmix64(i.toLong + 7919L) >>> 33)
    (a.mkString("[", ",", "]"), b.mkString("[", ",", "]"))
  }

  /** q24: rolling fingerprint = FNV-1a of the whole document. */
  val fingerprintSql: String =
    s"SELECT doc_id, ${fnvSql("text")} AS fingerprint FROM documents"

  /** q26: first four lanes of the 16-hash MinHash signature over word
    * 3-shingle STRINGS (Dedup.shingles → HashKernels.minhashSig). */
  val minhashSigsSql: String = {
    val (al, bl) = abLists(16)
    val sigCols = (0 until 4).map(i =>
      s"list_min(list_transform(sh, s -> ($al[${i + 1}] * ((${fnvSql("s")}) & 2147483647) " +
        s"+ $bl[${i + 1}]) % 2147483647)) AS sig$i").mkString(",\n  ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
       |shs AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |         ELSE list_transform(range(0, len(tk) - 2),
       |                i -> array_to_string(tk[i+1:i+3], ' ')) END AS sh
       |  FROM toks)
       |SELECT doc_id, $sigCols FROM shs""".stripMargin
  }

  /** Shared CTE prefix for the token-combine MinHash family (k = 2,
    * 32 hashes): token FNV hashes → windowed-combine shingle values
    * (HashKernels.minhashTokens / shingleHashes) → signatures. */
  private def tokenMinhashCtes: String = {
    val (al, bl) = abLists(32)
    val one = s"${wmul(s"xor($FnvOffset, th[1])", FnvPrime)}"
    def win(s: String) =
      wmul(s"xor(${wmul(s"xor($FnvOffset, th[$s])", FnvPrime)}, th[$s+1])", FnvPrime)
    s"""toks AS (
       |  SELECT doc_id, $tokSql AS tk FROM documents WHERE len($tokSql) > 0),
       |th AS (SELECT doc_id, list_transform(tk, t -> ${fnvSql("t")}) AS th FROM toks),
       |xs AS (
       |  SELECT doc_id,
       |    CASE WHEN len(th) = 1 THEN [($one) & 2147483647]
       |    ELSE list_transform(range(1, len(th)), s -> (${win("s")}) & 2147483647)
       |    END AS xs
       |  FROM th),
       |sigs AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 32), m ->
       |      list_min(list_transform(xs, x -> ($al[m+1] * x + $bl[m+1]) % 2147483647))) AS sig
       |  FROM xs),
       |gramsets AS (
       |  SELECT doc_id,
       |    CASE WHEN len(th) = 1 THEN [$one]
       |    ELSE list_distinct(list_transform(range(1, len(th)), s -> ${win("s")}))
       |    END AS gs
       |  FROM th)""".stripMargin
  }

  private val overlapPrune =
    "CAST(list_sum(list_transform(range(1,33), i -> " +
      "CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 32 >= 0.1"

  private val jaccardExpr =
    "CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE) / " +
      "(len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))"

  /** q27: full MinHash+LSH pair generation (16 bands × 2 rows, bucket
    * cap, overlap prefilter, exact Jaccard ≥ 0.2). */
  val minhashPairsSql: String =
    s"""WITH $tokenMinhashCtes,
       |banded AS (
       |  SELECT doc_id, sig, g.band AS band, sig[g.band*2+1:g.band*2+2] AS slice
       |  FROM sigs, generate_series(0, 15) AS g(band)),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, slice) AS bn FROM banded)
       |  WHERE bn <= 1000),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM capped a JOIN capped b ON a.band = b.band AND a.slice = b.slice
       |  WHERE a.doc_id < b.doc_id AND $overlapPrune)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT c.id_a, c.id_b, $jaccardExpr AS jaccard
       |  FROM cand c JOIN gramsets ga ON ga.doc_id = c.id_a
       |              JOIN gramsets gb ON gb.doc_id = c.id_b)
       |WHERE jaccard >= 0.2""".stripMargin

  /** q52: the incremental variant — batch (doc_id % 10 = 0) bands probe
    * the capped corpus bands; within-side pairs never generated. */
  val minhashPairsAgainstSql: String =
    s"""WITH $tokenMinhashCtes,
       |cb AS (
       |  SELECT * FROM (
       |    SELECT doc_id, sig, g.band AS band, sig[g.band*2+1:g.band*2+2] AS slice,
       |      count(*) OVER (PARTITION BY g.band, sig[g.band*2+1:g.band*2+2]) AS bn
       |    FROM sigs, generate_series(0, 15) AS g(band)
       |    WHERE doc_id % 10 != 0)
       |  WHERE bn <= 1000),
       |nb AS (
       |  SELECT doc_id, sig, g.band AS band, sig[g.band*2+1:g.band*2+2] AS slice
       |  FROM sigs, generate_series(0, 15) AS g(band)
       |  WHERE doc_id % 10 = 0),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_corpus
       |  FROM nb a JOIN cb b ON a.band = b.band AND a.slice = b.slice
       |  WHERE $overlapPrune)
       |SELECT id_new, id_corpus, jaccard FROM (
       |  SELECT c.id_new, c.id_corpus, $jaccardExpr AS jaccard
       |  FROM cand c JOIN gramsets ga ON ga.doc_id = c.id_new
       |              JOIN gramsets gb ON gb.doc_id = c.id_corpus)
       |WHERE jaccard >= 0.2""".stripMargin

  /** CTEs through the SimHash pair set (HashKernels.simhash64 bit votes,
    * 16-bit quarter blocking, bucket cap, Hamming ≤ 12). The `WITH
    * RECURSIVE` prefix makes the same text usable under the q43/q56
    * reachability closure. */
  private val simhashPairCtes: String =
    s"""WITH RECURSIVE th AS (
       |  SELECT doc_id, list_transform($tokSql, t -> ${fnvSql("t")}) AS hs FROM documents),
       |bt AS (
       |  SELECT doc_id, list_transform(range(0, 64), j ->
       |      CASE WHEN len(hs) > 0 AND
       |             list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0
       |           THEN 1 ELSE 0 END) AS bits
       |  FROM th),
       |sk AS (
       |  SELECT doc_id,
       |    (CASE WHEN bits[64] = 1 THEN (-9223372036854775808)::HUGEINT ELSE 0::HUGEINT END
       |     + list_sum(list_transform(range(0, 63),
       |         j -> bits[j + 1] * (1::BIGINT << j))))::BIGINT AS sketch
       |  FROM bt),
       |quarters AS (
       |  SELECT doc_id, sketch, g.q AS q, (sketch >> (g.q * 16)) & 65535 AS qhash
       |  FROM sk, generate_series(0, 3) AS g(q)),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY q, qhash) AS bn FROM quarters)
       |  WHERE bn <= 1000),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.sketch, b.sketch)) AS INT) AS hamming
       |  FROM capped a JOIN capped b USING (q, qhash)
       |  WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sketch, b.sketch)) <= 12)""".stripMargin

  /** q28: the SimHash pair set itself. */
  val simhashPairsSql: String =
    s"""$simhashPairCtes
       |SELECT id_a, id_b, hamming FROM pairs""".stripMargin

  /** q43/q56: connected components over the SimHash pair set — the same
    * recursive min-label reachability closure as the q73/q74 oracle, on
    * this edge set. */
  val simhashComponentsSql: String =
    s"""$simhashPairCtes,
       |nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b AS id FROM pairs),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |        UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id)
       |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id""".stripMargin

  /** q120: the same closure labels every document with its near-dup
    * cluster (singletons label themselves) and the md5 split thresholds
    * key on the CLUSTER — the leakage-safe split's oracle. */
  val leakageSafeSplitSql: String =
    s"""$simhashPairCtes,
       |nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b AS id FROM pairs),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |        UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id),
       |labels AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
       |SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster,
       |  CASE WHEN substring(md5(CAST(COALESCE(l.cluster, d.doc_id) AS VARCHAR)), 1, 2) < '08'
       |         THEN 'val'
       |       WHEN substring(md5(CAST(COALESCE(l.cluster, d.doc_id) AS VARCHAR)), 1, 2) < '10'
       |         THEN 'test'
       |       ELSE 'train' END AS split
       |FROM documents d LEFT JOIN labels l ON l.id = d.doc_id""".stripMargin
}
