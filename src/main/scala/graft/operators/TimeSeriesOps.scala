package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg

/** Time-series analytics over the tick domain the reference engine lives
  * in (per-symbol price streams — `/root/reference/src/Tranforms/
  * moving_statistic.py:76-87` computes windowed avg/stddev and
  * `zscore_calculator.py:123-128` a σ-based outlier score with a σ=0
  * guard; these extend that domain with the row-frame/per-tick toolkit):
  * lagged returns, row-frame rolling statistics, running-max drawdown,
  * robust (median/MAD) outlier detection — the MAD=0 guard mirrors the
  * reference's σ=0 guard — and exponentially-weighted moving averages.
  *
  * Scale design: everything keys and shuffles ONCE per query on the
  * series key (`symbol`); window functions evaluate inside the sorted
  * partition. Double-valued outputs are either single IEEE ops on
  * identical operands (lag subtraction, divides, running max) or flow
  * through [[ExactAgg]]'s decimal sums, so results are bit-reproducible
  * across cluster sizes and verifiable against a single-threaded oracle.
  *
  * The EWMA — an inherently sequential recurrence that no associative
  * aggregate expresses — uses Spark's secondary-sort pattern:
  * `repartition(key).sortWithinPartitions(key, time)` + one streaming
  * pass with O(1) state per key run. That is the canonical shape for
  * order-dependent per-key logic at scale (state never exceeds one
  * accumulator regardless of series length; a 100 TB symbol history
  * streams through without materializing).
  */
object TimeSeriesOps {

  /** Deterministic per-symbol ordering: event time, then a unique
    * tiebreak column, so every engine sees the same total order. */
  private def ordered(tsCol: String, tieCol: String) =
    Window.partitionBy(col("symbol")).orderBy(col(tsCol), col(tieCol))

  /** Per-symbol tick derivatives over a deterministic total order:
    * absolute and fractional lag-1 returns, rolling mean/stddev over the
    * trailing `rollRows`-row frame (decimal-exact), cumulative max and
    * drawdown from it. Input needs (symbol, tsCol, tieCol, price).
    * One shuffle on symbol; all five windows share the sort. */
  def tickDerivatives(
      ticks: DataFrame,
      tsCol: String,
      tieCol: String,
      rollRows: Int = 10): DataFrame = {
    val w = ordered(tsCol, tieCol)
    val roll = w.rowsBetween(-(rollRows - 1), 0)
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val prev = lag(col("price"), 1).over(w)
    val runMax = max(col("price")).over(cum)
    ticks
      .withColumn("ret", col("price") - prev)
      .withColumn("pct_ret",
        when(prev.isNull || prev === 0.0, lit(null).cast("double"))
          .otherwise((col("price") - prev) / prev))
      .withColumn("roll_avg", ExactAgg.wavg(col("price"), roll))
      .withColumn("roll_std", ExactAgg.wstddev0(col("price"), roll))
      .withColumn("run_max", runMax)
      .withColumn("drawdown",
        when(runMax === 0.0, lit(0.0))
          .otherwise((runMax - col("price")) / runMax))
  }

  /** Exact per-group median by iterative range-count selection — NOT a
    * per-group ranking window, whose parallelism is the group count and
    * whose cost is a full sort of every group (the low-cardinality
    * funnel: 5 symbols ⇒ 5 tasks each sorting a whole symbol history).
    *
    * Algorithm (the classic distributed order statistic):
    *   1. one aggregate → (n, min, max) per group; the median ranks are
    *      k1 = ⌊(n+1)/2⌋ and k2 = ⌊n/2⌋+1;
    *   2. bucket-count rounds: split each group's candidate value range
    *      into `buckets` equal sub-ranges, count rows per (group, bucket)
    *      (a tiny map-side-combined aggregate, ≤ groups × buckets rows to
    *      the driver), locate the buckets holding k1/k2, and narrow the
    *      candidate range to them — each round divides the candidate set
    *      by ~buckets, so a 10¹²-row group resolves in 2-3 scans with
    *      pushed-down filters and NO sort;
    *   3. final resolve: rank only the ≤ `resolveLimit` surviving rows
    *      with a window (partitioned by group, input bounded) offset by
    *      the count of rows excluded below, and average the one or two
    *      middle rows.
    *
    * Bucket membership IS the predicate (the same floor expression
    * filters and counts), so float rounding can never make the offset
    * bookkeeping disagree with the rows a round keeps. The averaging is
    * the same fixed IEEE op sequence as a rank-and-average median —
    * engine-portable where interpolating percentile built-ins differ in
    * the last ulp. Values must be non-null and non-NaN.
    *
    * `materializeInput` controls whether the projected input is
    * localCheckpointed before the multi-pass selection. Keep the default
    * (true) when the upstream is expensive or nondeterministic — every
    * pass must see identical rows. Pass false when the upstream is a
    * deterministic bare scan or broadcast-join projection: re-reading a
    * column-pruned parquet scan 2-3 times is cheaper than writing the
    * whole projection to block storage first, at any scale.
    * Output one row per group: (groupCol, n, median). */
  def exactMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      buckets: Int = 4096,
      resolveLimit: Long = 4096,
      materializeInput: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val gType = df.schema(df.schema.fieldIndex(groupCol)).dataType
    // the stats pass, every bucket-count round, and the final resolve all
    // re-read this projection; materialize it once (unless the caller
    // says the upstream is a cheap deterministic scan) so an expensive
    // upstream (a derived tick table) isn't recomputed per round
    val proj = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"), col(tieCol).as("t"))
    val base = if (materializeInput) proj.localCheckpoint(true) else proj
    val stats = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect()
    // per-group driver state: candidate range, rows excluded below it,
    // rows remaining inside it. groups × a few fields — bounded like the
    // IVF centroid pull, not proportional to row count.
    final case class St(g: Any, n: Long, var lo: Double, var hi: Double,
        var off: Long, var rem: Long) {
      val k1: Long = (n + 1) / 2
      val k2: Long = n / 2 + 1
    }
    val (trivial, active0) = stats
      .map(r => St(r.get(0), r.getLong(1), r.getDouble(2), r.getDouble(3), 0L, r.getLong(1)))
      .partition(s => s.lo == s.hi)
    var active = active0
    var candidate = base
    val idx = least(lit(buckets - 1), greatest(lit(0),
      floor((col("v") - col("lo")) * buckets / (col("hi") - col("lo"))).cast("int")))
    var rounds = 0
    while (active.exists(_.rem > resolveLimit) && rounds < 16) {
      rounds += 1
      val ranges = spark.createDataFrame(
        spark.sparkContext.parallelize(
          active.toSeq.map(s => Row(s.g, s.lo, s.hi)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("g", gType),
          org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.DoubleType))))
      // <=> join: a null group is a legal partition (the window form it
      // replaced kept it); Seq("g") equality would silently drop it
      val counts = candidate.join(broadcast(ranges),
          candidate("g") <=> ranges("g")).drop(ranges("g"))
        .groupBy(col("g"), idx.as("b")).agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.get(0))
        .map { case (g, rows) =>
          g -> rows.map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq }
      var progressed = false
      val chosen = active.map { s =>
        val bs = counts.getOrElse(s.g, Seq.empty[(Int, Long)])
        // cumulative walk: bucket holding k1, bucket holding k2
        var cum = s.off
        var bl = -1; var bh = -1; var below = s.off; var inside = 0L
        bs.foreach { case (b, c) =>
          if (bl < 0 && cum + c >= s.k1) { bl = b; below = cum }
          if (bh < 0 && cum + c >= s.k2) bh = b
          if (bl >= 0 && (bh < 0 || b <= bh)) inside += (if (b >= bl) c else 0L)
          cum += c
        }
        if (bl < 0) {
          // no counts came back for this group (defensive: should be
          // unreachable while rem > 0) — keep its state, make no progress
          (s, 0, buckets - 1, s.lo, s.hi, s.off, s.rem)
        } else {
          val w = (s.hi - s.lo) / buckets
          val nLo = s.lo + bl * w
          val nHi = if (bh >= buckets - 1) s.hi else s.lo + (bh + 1) * w
          if (inside < s.rem) progressed = true
          (s, bl, bh, nLo, nHi, below, inside)
        }
      }
      // next round's candidate = rows whose bucket (under THIS round's
      // ranges) is within [bl, bh] — the exact rows `inside` counted
      val sel = spark.createDataFrame(
        spark.sparkContext.parallelize(
          chosen.toSeq.map { case (s, bl, bh, _, _, _, _) => Row(s.g, s.lo, s.hi, bl, bh) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("g", gType),
          org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("bl", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("bh", org.apache.spark.sql.types.IntegerType))))
      candidate = candidate.join(broadcast(sel), candidate("g") <=> sel("g"))
        .drop(sel("g"))
        .filter(idx.between(col("bl"), col("bh")))
        .select(col("g"), col("v"), col("t"))
      chosen.foreach { case (s, _, _, nLo, nHi, below, inside) =>
        s.lo = nLo; s.hi = nHi; s.off = below; s.rem = inside
      }
      if (!progressed) rounds = 16 // width underflow: resolve what remains
    }
    val resolved = if (active.isEmpty) None else Some {
      val ks = spark.createDataFrame(
        spark.sparkContext.parallelize(
          active.toSeq.map(s => Row(s.g, s.n, s.off, s.k1, s.k2)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("g", gType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("off", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("k1", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("k2", org.apache.spark.sql.types.LongType))))
      val wo = Window.partitionBy(col("g")).orderBy(col("v"), col("t"))
      candidate.join(broadcast(ks), candidate("g") <=> ks("g")).drop(ks("g"))
        .withColumn("rn", row_number().over(wo) + col("off"))
        .filter(col("rn") === col("k1") || col("rn") === col("k2"))
        .groupBy(col("g"))
        .agg(max(col("n")).as("n"), (sum(col("v")) / count(lit(1))).as("median"))
    }
    val trivialDf = if (trivial.isEmpty) None else Some {
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          trivial.toSeq.map(s => Row(s.g, s.n, s.lo)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("g", gType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("median", org.apache.spark.sql.types.DoubleType))))
    }
    val out = (resolved, trivialDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => resolvedSchemaEmpty(spark, gType)
    }
    out.withColumnRenamed("g", groupCol)
  }

  private def resolvedSchemaEmpty(
      spark: org.apache.spark.sql.SparkSession,
      gType: org.apache.spark.sql.types.DataType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", gType),
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("median", org.apache.spark.sql.types.DoubleType))))

  /** Robust outlier detection per symbol: modified z-score
    * 0.6745·(x − median)/MAD (Iglewicz–Hoaglin), with the reference
    * engine's σ=0 guard carried over to MAD=0 (constant series → no
    * outliers, not a divide-by-zero). Two median passes (values, then
    * absolute deviations), each an [[exactMedian]]; the per-symbol stats
    * join back by broadcast — symbols are low-cardinality dimensions.
    * Output: (symbol, n, median, mad, n_outliers). */
  def madOutliers(
      ticks: DataFrame,
      tieCol: String,
      zCut: Double = 3.5,
      materializeInput: Boolean = true): DataFrame = {
    // med/mad are one row per symbol — checkpoint them so the broadcast
    // joins below never re-run the selection's resolve chain (each
    // re-evaluation would otherwise replay a filter + bounded window
    // over the candidate set)
    val med = exactMedian(ticks, "symbol", "price", tieCol,
        materializeInput = materializeInput)
      .select(col("symbol"), col("n"), col("median"))
      .localCheckpoint(true)
    val dev = ticks.join(broadcast(med), Seq("symbol"))
      .withColumn("adev", abs(col("price") - col("median")))
    val mad = exactMedian(dev, "symbol", "adev", tieCol,
        materializeInput = materializeInput)
      .select(col("symbol"), col("median").as("mad"))
      .localCheckpoint(true)
    dev.join(broadcast(mad), Seq("symbol"))
      .withColumn("rz",
        when(col("mad") === 0.0, lit(0.0))
          .otherwise(lit(0.6745) * (col("price") - col("median")) / col("mad")))
      .groupBy(col("symbol"))
      .agg(
        max(col("n")).as("n"),
        max(col("median")).as("median"),
        max(col("mad")).as("mad"),
        count(when(abs(col("rz")) > zCut, 1)).as("n_outliers"))
  }

  /** Exponentially-weighted moving average per symbol:
    * acc₀ = x₀; accᵢ = α·xᵢ + (1−α)·accᵢ₋₁ over the (tsMs, tie) order.
    * Secondary-sort implementation — the input is hash-partitioned on
    * symbol and sorted within partitions on (symbol, tsMs, tie), then a
    * single streaming pass folds each contiguous key run with one
    * accumulator. No state table, no collect; memory is O(1) per key
    * run, and the op sequence per step is two IEEE multiplies + one add,
    * reproducible in any engine that folds the same order.
    * Input columns: (symbol string, ts_ms long, tie long, price double).
    * Output: (symbol, n_ticks, ewma_price) — the final smoothed level. */
  def ewmaBySymbol(ticks: DataFrame, alpha: Double): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val oneMinus = 1.0 - alpha
    val sorted = ticks
      .select(
        col("symbol").cast("string"),
        col("ts_ms").cast("long"),
        col("tie").cast("long"),
        col("price").cast("double"))
      .repartition(col("symbol"))
      .sortWithinPartitions("symbol", "ts_ms", "tie")
    sorted.mapPartitions { rows: Iterator[Row] =>
      // rows arrive grouped by key and time-ordered; fold each run with a
      // single accumulator, emitting one (key, n, ewma) per run — the
      // output buffer holds per-KEY results only, never the row stream
      val out = scala.collection.mutable.ListBuffer.empty[(String, Long, Double)]
      var key: String = null
      var acc = 0.0
      var n = 0L
      while (rows.hasNext) {
        val r = rows.next()
        val k = r.getString(0)
        val x = r.getDouble(3)
        if (key == null || k != key) {
          if (key != null) out += ((key, n, acc))
          key = k; acc = x; n = 1L
        } else {
          acc = alpha * x + oneMinus * acc
          n += 1
        }
      }
      if (key != null) out += ((key, n, acc))
      out.iterator
    }.toDF("symbol", "n_ticks", "ewma_price")
  }

  /** Exact per-group MULTI-quantile by the same iterative range-count
    * selection as [[exactMedian]], generalized to one virtual group per
    * (group, quantile): each requested quantile q resolves the single
    * type-1 order statistic at rank k = ⌈q·n⌉ (no interpolation — the
    * returned value is a row that EXISTS, and interpolating definitions
    * differ across engines). All quantiles narrow simultaneously: every
    * bucket-count round joins the (shrinking, (g,q)-tagged) candidate set
    * against the broadcast per-(g,q) range table and counts (g,q,bucket)
    * cells, so the scan cost is shared and the driver state stays
    * groups × quantiles × a few fields. NO per-group sort ever happens —
    * the final resolve ranks ≤ resolveLimit surviving rows per (g,q).
    *
    * Use dyadic quantiles (0.25, 0.5, 0.75, …) where bit-exact
    * cross-engine ranks matter: q·n is then an exact IEEE product, so
    * ⌈q·n⌉ cannot straddle engines. Values must be non-null/non-NaN.
    * Output one row per (group, quantile): (groupCol, q, n, value). */
  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      qs: Seq[Double],
      buckets: Int = 4096,
      resolveLimit: Long = 4096,
      materializeInput: Boolean = true): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    // a duplicated q would duplicate its (g, q) range row and double
    // every bucket count through the tag join — reject loudly
    require(qs.distinct.size == qs.size, s"duplicate quantiles: $qs")
    val spark = df.sparkSession
    val gType = df.schema(df.schema.fieldIndex(groupCol)).dataType
    import org.apache.spark.sql.types._
    val proj = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"), col(tieCol).as("t"))
    val base = if (materializeInput) proj.localCheckpoint(true) else proj
    val stats = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect()
    // one selection state per (group, quantile); k = ceil(q*n) is exact
    // for dyadic q (and deterministic either way — computed once, here)
    final case class St(g: Any, q: Double, n: Long, k: Long,
        var lo: Double, var hi: Double, var off: Long, var rem: Long)
    val all = stats.flatMap { r =>
      val (g, n, lo, hi) = (r.get(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      qs.map(q => St(g, q, n, math.ceil(q * n).toLong max 1L, lo, hi, 0L, n))
    }
    val (trivial, active) = all.partition(s => s.lo == s.hi)
    val stSchema = StructType(Seq(
      StructField("sg", gType), StructField("sq", DoubleType),
      StructField("lo", DoubleType), StructField("hi", DoubleType),
      StructField("bl", IntegerType), StructField("bh", IntegerType)))
    def selDf(rows: Seq[Row]) = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), stSchema))
    val idx = least(lit(buckets - 1), greatest(lit(0),
      floor((col("v") - col("lo")) * buckets / (col("hi") - col("lo"))).cast("int")))
    // candidate carries its (g, q) tag from round 1 on; round 0 joins the
    // untagged base on g alone (fanning each row out to its quantiles)
    var candidate = base
    var tagged = false
    var rounds = 0
    while (active.exists(_.rem > resolveLimit) && rounds < 16) {
      rounds += 1
      val sel = selDf(active.toSeq.map(s =>
        Row(s.g, s.q, s.lo, s.hi, 0, buckets - 1)))
      val joined =
        if (tagged)
          candidate.join(sel,
            candidate("g") <=> sel("sg") && candidate("q") === sel("sq"))
        else candidate.join(sel, candidate("g") <=> sel("sg"))
      val counts = joined
        .groupBy(col("g"), col("sq").as("q"), idx.as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(r => (r.get(0), r.getDouble(1)))
        .map { case (k, rows) =>
          k -> rows.map(r => (r.getInt(2), r.getLong(3))).sortBy(_._1).toSeq }
      var progressed = false
      val chosen = active.map { s =>
        val bs = counts.getOrElse((s.g, s.q), Seq.empty[(Int, Long)])
        var cum = s.off
        var b0 = -1; var below = s.off; var inside = 0L
        bs.foreach { case (b, c) =>
          if (b0 < 0 && cum + c >= s.k) { b0 = b; below = cum; inside = c }
          cum += c
        }
        if (b0 < 0) (s, 0, buckets - 1, s.lo, s.hi, s.off, s.rem)
        else {
          val w = (s.hi - s.lo) / buckets
          val nLo = s.lo + b0 * w
          val nHi = if (b0 >= buckets - 1) s.hi else s.lo + (b0 + 1) * w
          if (inside < s.rem) progressed = true
          (s, b0, b0, nLo, nHi, below, inside)
        }
      }
      val sel2 = selDf(chosen.toSeq.map { case (s, bl, bh, _, _, _, _) =>
        Row(s.g, s.q, s.lo, s.hi, bl, bh) })
      val joined2 =
        if (tagged)
          candidate.join(sel2,
            candidate("g") <=> sel2("sg") && candidate("q") === sel2("sq"))
        else candidate.join(sel2, candidate("g") <=> sel2("sg"))
      candidate = joined2
        .filter(idx.between(col("bl"), col("bh")))
        .select(col("g"), col("sq").as("q"), col("v"), col("t"))
      tagged = true
      chosen.foreach { case (s, _, _, nLo, nHi, below, inside) =>
        s.lo = nLo; s.hi = nHi; s.off = below; s.rem = inside
      }
      if (!progressed) rounds = 16
    }
    val outSchema = StructType(Seq(
      StructField("g", gType), StructField("q", DoubleType),
      StructField("n", LongType), StructField("value", DoubleType)))
    val resolved = if (active.isEmpty) None else Some {
      val ks = broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(active.toSeq.map(s =>
          Row(s.g, s.q, s.n, s.off, s.k)), 1),
        StructType(Seq(
          StructField("sg", gType), StructField("sq", DoubleType),
          StructField("n", LongType), StructField("off", LongType),
          StructField("k", LongType)))))
      val joined =
        if (tagged)
          candidate.join(ks,
            candidate("g") <=> ks("sg") && candidate("q") === ks("sq"))
        else candidate.join(ks, candidate("g") <=> ks("sg"))
      val wo = Window.partitionBy(col("g"), col("sq")).orderBy(col("v"), col("t"))
      joined
        .withColumn("rn", row_number().over(wo) + col("off"))
        .filter(col("rn") === col("k"))
        .select(col("g"), col("sq").as("q"), col("n"), col("v").as("value"))
    }
    val trivialDf = if (trivial.isEmpty) None else Some {
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          trivial.toSeq.map(s => Row(s.g, s.q, s.n, s.lo)), 1), outSchema)
    }
    val out = (resolved, trivialDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    }
    out.withColumnRenamed("g", groupCol)
  }
}
