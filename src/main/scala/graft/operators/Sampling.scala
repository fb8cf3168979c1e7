package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation.
  *
  * `df.sample()` draws from a per-partition RNG, so its output changes
  * with partition layout — useless for a reproducible 100 TB pipeline
  * where re-runs, retries, and repartitions must select the SAME rows.
  * These samplers decide membership from a content hash of a stable key:
  * the decision is a pure per-row function, so it survives any cluster
  * size, AQE re-plan, or retry, and composes with incremental reruns
  * (yesterday's kept rows stay kept).
  *
  * The hash is the first byte of md5 of the key's decimal string — chosen
  * over xxhash64 because md5-of-string is engine-portable (bit-identical
  * in any SQL engine), which is what makes the sample oracle-checkable.
  * Granularity is 1/256; md5's avalanche makes the byte uniform even for
  * sequential keys.
  */
object Sampling {

  /** Hex-string sampling bucket in "00".."ff" for a key column — string
    * comparison against a threshold avoids any hex-parse builtin (not all
    * engines have one); lowercase hex compares identically everywhere. */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Threshold literal: keep buckets strictly below n/256. n=256 renders
    * "g", which sorts above every hex bucket (keep-all) — the naive "100"
    * would sort BELOW "ff" in the 2-char string comparison and keep
    * nothing. */
  def threshold(n256: Int): String = if (n256 >= 256) "g" else f"$n256%02x"

  /** Keep ~n256/256 of rows, decided by key hash. n256=256 keeps all. */
  def hashSample(df: DataFrame, key: Column, n256: Int): DataFrame = {
    require(n256 >= 0 && n256 <= 256, s"fraction $n256/256 out of range")
    if (n256 == 256) df else df.filter(hashBucket(key) < lit(threshold(n256)))
  }

  /** Stratified deterministic sample: per-stratum fractions (in 1/256
    * units) with a default for unlisted strata. One shuffle-free scan —
    * the filter is a pure row predicate, so it pushes into the scan and
    * costs nothing at any corpus size. */
  def stratifiedHashSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      fractions: Map[String, Int],
      default: Int = 0): DataFrame = {
    (fractions.values ++ Seq(default)).foreach(n =>
      require(n >= 0 && n <= 256, s"fraction $n/256 out of range"))
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(lit(threshold(default))) {
      case (acc, (value, n)) => when(stratum === value, lit(threshold(n))).otherwise(acc)
    }
    df.filter(hashBucket(key) < thr)
  }
}
