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

  /** Quality-weighted deterministic sample: keep a row with probability
    * ~`weight` (clamped to [0,1]), decided by comparing the first 4 hex
    * chars of md5(key) against a per-row threshold derived from the
    * weight — 1/65,536 granularity. The importance-sampling step of a
    * corpus build ("keep high-quality docs at full rate, tail quality at
    * their score"), with the same engine-portability contract as
    * [[hashSample]]: lowercase-hex string comparison only, no hex-parse
    * builtin, so DuckDB reproduces the exact keep set (q78's oracle).
    * Pure per-row predicate — pushes to the scan, shuffle-free. */
  def weightedHashSample(df: DataFrame, key: Column, weight: Column): DataFrame = {
    // floor(w * 65536) clamped to [0, 65535]: weight >= 1 keeps all but
    // 1/65536 of rows (threshold "ffff" still excludes bucket "ffff");
    // exact keep-all would need the 5-char sentinel trick of threshold()
    val thr = lpad(lower(hex(
      greatest(lit(0), least(floor(weight * 65536), lit(65535))).cast("long"))),
      4, "0")
    df.filter(substring(md5(key.cast("string")), 1, 4) < thr)
  }

  /** Deterministic train/val/test split, derived from the first md5 byte
    * of the key — the dataset-assembly step after curation: val gets
    * buckets [0, val256), test [val256, val256+test256), train the rest.
    * Content-keyed, so any engine, cluster size, or rerun deals the same
    * row to the same split. Pure per-row predicate: shuffle-free. */
  def splitAssign(
      df: DataFrame,
      key: Column,
      val256: Int,
      test256: Int): DataFrame = {
    require(val256 >= 0 && test256 >= 0 && val256 + test256 <= 256,
      "val + test fractions exceed the whole")
    val h = md5(key.cast("string"))
    val split = when(substring(h, 1, 2) < lit(threshold(val256)), "val")
      .when(substring(h, 1, 2) < lit(threshold(val256 + test256)), "test")
      .otherwise("train")
    df.withColumn("split", split)
  }

  /** Deterministic epoch-shuffle rank: a contiguous 1-based global index
    * in md5(key) order — the reproducible "shuffled dataset" every
    * training run needs. `key` must be unique (it breaks md5 ties and
    * makes the order total).
    *
    * NOT a `row_number()` window over the whole table — that plans a
    * single-partition sort, the classic scale-killer. This is the
    * two-phase global-index pattern with CONTENT-derived buckets: rows
    * bucket on the first 4 hex chars of md5 (≤ 65,536 buckets, uniform by
    * avalanche, and prefix-ordered so bucket order == global hash order),
    * a tiny aggregate counts rows per bucket, an executor-side fold over
    * the one sorted (bucket, count) array turns counts into exclusive
    * running offsets (≤ 65,536 structs, ~1 MB in a single bounded task —
    * the driver never materializes a row of it), and rank = bucket
    * offset + row_number within the bucket. Every step is a pure
    * function of row CONTENT — unlike a cached sampled range
    * partitioning, a recompute after shuffle loss or an AQE re-plan
    * reproduces the identical ranks, so nothing needs to be persisted
    * between the two passes. */
  def shuffleRank(df: DataFrame, key: Column): DataFrame = {
    // null keys hash to "" (sorts before every hex bucket — the nulls-
    // first convention) instead of poisoning the offset order with a null
    val keyed = df
      .withColumn("__sk", coalesce(
        concat(md5(key.cast("string")), key.cast("string")), lit("")))
      .withColumn("__bk", substring(col("__sk"), 1, 4))
    // exclusive prefix sums over the sorted bucket counts, distributed
    // end to end (same fold as Packing.groupedCumSum's offset pass)
    val offDf = keyed.groupBy(col("__bk")).count()
      .agg(sort_array(collect_list(struct(col("__bk"), col("count")))).as("__bc"))
      .select(explode(expr(
        """aggregate(
             __bc,
             struct(cast(0 as bigint) as acc,
                    cast(array() as array<struct<b:string, off:bigint>>) as out),
             (s, x) -> named_struct(
               'acc', s.acc + x.count,
               'out', array_append(s.out, named_struct('b', x.__bk, 'off', s.acc))),
             s -> s.out)""")).as("__o"))
      .select(col("__o.b").as("__obk"), col("__o.off").as("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bk")).orderBy(col("__sk"))
    keyed.join(offDf, keyed("__bk") === offDf("__obk"))
      .withColumn("shuffle_rank", col("__off") + row_number().over(w))
      .select(df.columns.map(col) :+ col("shuffle_rank"): _*)
  }

  /** Per-GROUP [[shuffleRank]]: each row's 1-based rank within its group
    * in the md5 shuffle order — `row_number() over (partition by group
    * order by md5(key))` without a group-wide window (a stratum at
    * 100 TB is billions of rows through one reducer; a heap top-k does
    * not generalize because the rank cutoff — e.g. a 10 % test quota —
    * grows with the stratum). Same two-phase plan, keyed by (group,
    * 4-hex md5 bucket): local row_number within the sub-bucket, one
    * count per (group, bucket), per-group exclusive offsets folded from
    * the sorted bucket array. Content-derived, so recomputes and AQE
    * re-plans reproduce identical ranks. */
  def groupedShuffleRank(
      df: DataFrame, groups: Seq[String], key: Column): DataFrame = {
    require(groups.nonEmpty, "need at least one group column")
    val keyed = df
      .withColumn("__sk", coalesce(
        concat(md5(key.cast("string")), key.cast("string")), lit("")))
      .withColumn("__bk", substring(col("__sk"), 1, 4))
    val gcols = groups.map(col)
    val offDf = keyed
      .groupBy(gcols :+ col("__bk"): _*).count()
      .groupBy(gcols: _*)
      .agg(sort_array(collect_list(struct(col("__bk"), col("count")))).as("__bc"))
      .select(gcols :+ explode(expr(
        """aggregate(
             __bc,
             struct(cast(0 as bigint) as acc,
                    cast(array() as array<struct<b:string, off:bigint>>) as out),
             (s, x) -> named_struct(
               'acc', s.acc + x.count,
               'out', array_append(s.out, named_struct('b', x.__bk, 'off', s.acc))),
             s -> s.out)""")).as("__o"): _*)
      .select(groups.zipWithIndex.map { case (g, i) => col(g).as(s"__og$i") } :+
        col("__o.b").as("__obk") :+ col("__o.off").as("__off"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols :+ col("__bk"): _*).orderBy(col("__sk"))
    // null-safe on the groups (a null stratum value is a legal window
    // partition in the form this replaces; plain equality would drop it)
    val joinCond = groups.zipWithIndex
      .map { case (g, i) => keyed(g) <=> offDf(s"__og$i") }
      .reduce(_ && _) && keyed("__bk") === offDf("__obk")
    keyed.join(offDf, joinCond)
      .select(df.columns.map(keyed(_)) :+
        (offDf("__off") + row_number().over(w)).as("shuffle_rank"): _*)
  }
}
