package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    *      (a tiny map-side-combined aggregate), locate the buckets
    *      holding k1/k2, and narrow the candidate range to them — each
    *      round divides the candidate set by ~buckets, so a 10¹²-row
    *      group resolves in 2-3 scans with pushed-down filters and NO
    *      sort;
    *   3. final resolve: rank only the ≤ `resolveLimit` surviving rows
    *      with a window (partitioned by group, input bounded) offset by
    *      the count of rows excluded below, and average the one or two
    *      middle rows.
    *
    * ALL per-group selection state (range, offset, remaining count) lives
    * in a distributed state table joined against the data each round —
    * the driver never materializes a per-group row, so group cardinality
    * is unbounded (a per-user or per-doc grouping at 100 TB works). The
    * bucket walk that locates k1/k2 folds each group's ≤ `buckets`
    * (bucket, count) cells inside one `aggregate()` higher-order function
    * (bounded executor-side state, no window, no sort); the driver reads
    * exactly ONE aggregate row per round to decide loop termination. AQE
    * broadcasts the state-table joins when the group domain is small and
    * shuffle-joins them when it is huge.
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
    * whole projection to block storage first, at any scale. `storage`
    * picks the materialization level — Some(DISK_ONLY) for inputs
    * bigger than cluster RAM (identical results, spec-pinned).
    * Output one row per group: (groupCol, n, median). */
  def exactMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      buckets: Int = 4096,
      resolveLimit: Long = 4096,
      materializeInput: Boolean = true,
      storage: Option[StorageLevel] = None): DataFrame = {
    // the stats pass, every bucket-count round, and the final resolve all
    // re-read this projection; materialize it once (unless the caller
    // says the upstream is a cheap deterministic scan) so an expensive
    // upstream (a derived tick table) isn't recomputed per round
    val proj = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"), col(tieCol).as("t"))
    val base =
      if (!materializeInput) proj
      else storage match {
        case Some(level) => proj.localCheckpoint(true, level)
        case None => proj.localCheckpoint(true)
      }
    // per-group selection state — DISTRIBUTED: candidate range [lo, hi],
    // rows excluded below it (off), rows remaining inside it (rem), and
    // the two median ranks. One row per group; checkpointed each round
    // (tiny) so lineage stays bounded and joins read materialized blocks.
    val stats0 = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("k1", expr("(n + 1) div 2"))
      .withColumn("k2", expr("(n div 2) + 1"))
      .withColumn("off", lit(0L))
      .withColumn("rem", col("n"))
      .localCheckpoint(true)
    // single-valued groups need no selection at all
    val trivial = stats0.filter(col("lo") === col("hi"))
      .select(col("g"), col("n"), col("lo").as("median"))
    var state = stats0.filter(col("lo") =!= col("hi"))
    var candidate = base
    val idx = least(lit(buckets - 1), greatest(lit(0),
      floor((col("v") - col("lo")) * buckets / (col("hi") - col("lo"))).cast("int")))
    // the walk over a group's ≤ `buckets` (bucket, count) cells, folded
    // executor-side: bucket holding k1 (bl) with the cumulative count
    // before it (below), bucket holding k2 (bh) with the cumulative count
    // through it (ie) — so the narrowed remainder is ie - below
    val walkExpr = expr(
      """aggregate(
           cells,
           named_struct('cum', off, 'bl', -1, 'below', off,
                        'bh', -1, 'ie', cast(0 as bigint)),
           (s, x) -> named_struct(
             'cum', s.cum + x.c,
             'bl', if(s.bl >= 0, s.bl, if(s.cum + x.c >= k1, x.b, -1)),
             'below', if(s.bl >= 0, s.below, if(s.cum + x.c >= k1, s.cum, s.below)),
             'bh', if(s.bh >= 0, s.bh, if(s.cum + x.c >= k2, x.b, -1)),
             'ie', if(s.bh >= 0, s.ie, if(s.cum + x.c >= k2, s.cum + x.c, s.ie))))""")
    // ok := the walk located both ranks (always true when counts cover the
    // group; the guard keeps a group's state unchanged — no progress — in
    // the defensive can't-happen case, exactly like the driver loop did)
    val ok = col("bl").isNotNull && col("bl") >= 0 && col("bh") >= 0
    var rounds = 0
    var cont = {
      val m = state.agg(max(col("rem"))).head()
      !m.isNullAt(0) && m.getLong(0) > resolveLimit
    }
    while (cont && rounds < 16) {
      rounds += 1
      val stateR = state.withColumnRenamed("g", "sg")
      // <=> join: a null group is a legal partition (the window form it
      // replaced kept it); plain equality would silently drop it
      val counts = candidate.join(stateR, candidate("g") <=> stateR("sg"))
        .groupBy(col("g"), idx.as("b")).agg(count(lit(1)).as("c"))
      val cells = counts.groupBy(col("g"))
        .agg(sort_array(collect_list(struct(col("b"), col("c")))).as("cells"))
        .withColumnRenamed("g", "cg")
      // one candidate scan per round happens HERE (eager checkpoint of the
      // tiny per-group round table); everything below reads its blocks
      val round = stateR.join(cells, stateR("sg") <=> cells("cg"), "left")
        .withColumn("wk", walkExpr)
        .select(col("sg").as("g"), col("n"), col("k1"), col("k2"),
          col("lo"), col("hi"), col("off"), col("rem"),
          col("wk.bl").as("bl"), col("wk.bh").as("bh"),
          col("wk.below").as("below"), col("wk.ie").as("ie"))
        .localCheckpoint(true)
      // next round's candidate = rows whose bucket (under THIS round's
      // ranges) is within [bl, bh] — the exact rows `ie - below` counted
      val sel = round.select(col("g").as("sg"), col("lo"), col("hi"),
        when(ok, col("bl")).otherwise(lit(0)).as("bl"),
        when(ok, col("bh")).otherwise(lit(buckets - 1)).as("bh"))
      candidate = candidate.join(sel, candidate("g") <=> sel("sg"))
        .filter(idx.between(col("bl"), col("bh")))
        .select(col("g"), col("v"), col("t"))
      // narrow each group's range to the located buckets (same IEEE op
      // sequence the driver version used: w = (hi-lo)/buckets etc. —
      // though the final answer never depends on range rounding, because
      // the count and the filter share the one bucket-index expression)
      val bw = (col("hi") - col("lo")) / buckets
      state = round.select(col("g"), col("n"), col("k1"), col("k2"),
        when(ok, col("lo") + col("bl") * bw).otherwise(col("lo")).as("lo"),
        when(ok && col("bh") >= buckets - 1, col("hi"))
          .when(ok, col("lo") + (col("bh") + 1) * bw)
          .otherwise(col("hi")).as("hi"),
        when(ok, col("below")).otherwise(col("off")).as("off"),
        when(ok, col("ie") - col("below")).otherwise(col("rem")).as("rem"))
      // ONE row to the driver per round: largest remainder + any-progress
      val a = round.agg(
        max(when(ok, col("ie") - col("below")).otherwise(col("rem"))).as("mx"),
        max(when(ok && (col("ie") - col("below")) < col("rem"), 1)
          .otherwise(0)).as("prog")).head()
      cont = !a.isNullAt(0) && a.getLong(0) > resolveLimit && a.getInt(1) == 1
    }
    // final resolve: rank the ≤ resolveLimit survivors per group, offset
    // by the exact excluded-below count, pick ranks k1/k2 and average
    val ks = state.select(col("g").as("sg"), col("n"),
      col("off"), col("k1"), col("k2"))
    val wo = Window.partitionBy(col("g")).orderBy(col("v"), col("t"))
    val resolved = candidate.join(ks, candidate("g") <=> ks("sg"))
      .withColumn("rn", row_number().over(wo) + col("off"))
      .filter(col("rn") === col("k1") || col("rn") === col("k2"))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"), (sum(col("v")) / count(lit(1))).as("median"))
    resolved.unionByName(trivial).withColumnRenamed("g", groupCol)
  }

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

  /** Time-weighted average price per symbol over irregular ticks: each
    * price weighted by its hold time — the integer-second gap to the
    * next tick (the last tick of a series holds nothing and carries no
    * weight). The weighted sum runs in DECIMAL with the split
    * decimal→double cast, so the mark is bit-reproducible across
    * partitionings and engines (q122 oracle). One sort-shuffle on
    * symbol for the lead(); the aggregate map-side combines.
    * Input columns: (symbol, x double, t_us long, event_id).
    * Output: (symbol, n_intervals, weight_s, twap). */
  def twapBySymbol(ticks: DataFrame): DataFrame = {
    val XI = org.apache.spark.sql.types.DecimalType(18, 6)
    val WI = org.apache.spark.sql.types.DecimalType(9, 0)
    def d2(c: org.apache.spark.sql.Column) = {
      val f = floor(c)
      f.cast("double") + (c - f).cast("double")
    }
    ticks
      .withColumn("dt_s",
        expr("(lead(t_us) over (partition by symbol order by t_us, event_id) - t_us) div 1000000"))
      .filter(col("dt_s").isNotNull)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt_s")).as("weight_s"),
        d2(sum(col("x").cast(XI) * col("dt_s").cast(WI))).as("wsum"))
      .select(col("symbol"), col("n_intervals"), col("weight_s"),
        when(col("weight_s") === 0, lit(0.0))
          .otherwise(col("wsum") / col("weight_s").cast("double")).as("twap"))
  }

  /** Tick→bar resample: open/high/low/close + count per (symbol, time
    * bucket). Open and close are deterministic arg-min/arg-max through
    * struct ordering on the unique (t_us, event_id) key — no ranking
    * window, ONE shuffle keyed by (symbol, bucket); values are copied
    * inputs, trivially engine-exact (q123 oracle).
    * Input columns: (symbol, x double, t_us long, event_id). */
  def ohlcBars(ticks: DataFrame, bucketUs: Long): DataFrame =
    ticks
      .withColumn("hour_bucket", expr(s"t_us div ${bucketUs}L"))
      .groupBy(col("symbol"), col("hour_bucket"))
      .agg(count(lit(1)).as("n_ticks"),
        min(struct(col("t_us"), col("event_id"), col("x")))
          .getField("x").as("open"),
        max(col("x")).as("high"),
        min(col("x")).as("low"),
        max(struct(col("t_us"), col("event_id"), col("x")))
          .getField("x").as("close"))

  /** Exact per-group MULTI-quantile by the same iterative range-count
    * selection as [[exactMedian]], generalized to one virtual group per
    * (group, quantile): each requested quantile q resolves the single
    * type-1 order statistic at rank k = ⌈q·n⌉ (no interpolation — the
    * returned value is a row that EXISTS, and interpolating definitions
    * differ across engines). All quantiles narrow simultaneously: every
    * bucket-count round joins the (shrinking, (g,q)-tagged) candidate set
    * against the per-(g,q) state table and counts (g,q,bucket) cells, so
    * the scan cost is shared. Like [[exactMedian]], ALL per-(g,q) state
    * is a distributed DataFrame (AQE broadcasts it when small); the
    * bucket walk folds each (g,q)'s cells in one `aggregate()` call and
    * the driver reads ONE aggregate row per round — group cardinality is
    * unbounded. NO per-group sort ever happens — the final resolve ranks
    * ≤ resolveLimit surviving rows per (g,q).
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
      materializeInput: Boolean = true,
      storage: Option[StorageLevel] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    // a duplicated q would duplicate its (g, q) range row and double
    // every bucket count through the tag join — reject loudly
    require(qs.distinct.size == qs.size, s"duplicate quantiles: $qs")
    val proj = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"), col(tieCol).as("t"))
    val base =
      if (!materializeInput) proj
      else storage match {
        case Some(level) => proj.localCheckpoint(true, level)
        case None => proj.localCheckpoint(true)
      }
    // one distributed state row per (group, quantile): the group stats
    // fan out to the requested quantiles in-plan (explode over a constant
    // array); k = ceil(q*n) is exact for dyadic q (and deterministic
    // either way — the product and ceil are single IEEE ops)
    val stats0 = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .withColumn("k", greatest(ceil(col("q") * col("n")), lit(1L)))
      .withColumn("off", lit(0L))
      .withColumn("rem", col("n"))
      .localCheckpoint(true)
    val trivial = stats0.filter(col("lo") === col("hi"))
      .select(col("g"), col("q"), col("n"), col("lo").as("value"))
    var state = stats0.filter(col("lo") =!= col("hi"))
    val idx = least(lit(buckets - 1), greatest(lit(0),
      floor((col("v") - col("lo")) * buckets / (col("hi") - col("lo"))).cast("int")))
    // the per-(g,q) walk: bucket b0 holding rank k, cumulative count
    // before it (below) and through it (ie); the narrowed remainder is
    // ie - below = the count of that one bucket
    val walkExpr = expr(
      """aggregate(
           cells,
           named_struct('cum', off, 'b0', -1, 'below', off,
                        'ie', cast(0 as bigint)),
           (s, x) -> named_struct(
             'cum', s.cum + x.c,
             'b0', if(s.b0 >= 0, s.b0, if(s.cum + x.c >= k, x.b, -1)),
             'below', if(s.b0 >= 0, s.below, if(s.cum + x.c >= k, s.cum, s.below)),
             'ie', if(s.b0 >= 0, s.ie, if(s.cum + x.c >= k, s.cum + x.c, s.ie))))""")
    val ok = col("b0").isNotNull && col("b0") >= 0
    // candidate carries its (g, q) tag from round 1 on; round 0 joins the
    // untagged base on g alone (fanning each row out to its quantiles)
    var candidate = base
    var tagged = false
    def joinState(c: DataFrame, st: DataFrame): DataFrame =
      if (tagged) c.join(st, c("g") <=> st("sg") && c("q") === st("sq"))
      else c.join(st, c("g") <=> st("sg"))
    var rounds = 0
    var cont = {
      val m = state.agg(max(col("rem"))).head()
      !m.isNullAt(0) && m.getLong(0) > resolveLimit
    }
    while (cont && rounds < 16) {
      rounds += 1
      val stateR = state
        .withColumnRenamed("g", "sg").withColumnRenamed("q", "sq")
      val counts = joinState(candidate, stateR)
        .groupBy(col("g"), col("sq").as("cq"), idx.as("b"))
        .agg(count(lit(1)).as("c"))
      val cells = counts.groupBy(col("g"), col("cq"))
        .agg(sort_array(collect_list(struct(col("b"), col("c")))).as("cells"))
        .withColumnRenamed("g", "cg")
      // the one candidate scan of the round materializes here
      val round = stateR.join(cells,
          stateR("sg") <=> cells("cg") && stateR("sq") === cells("cq"), "left")
        .withColumn("wk", walkExpr)
        .select(col("sg").as("g"), col("sq").as("q"), col("n"), col("k"),
          col("lo"), col("hi"), col("off"), col("rem"),
          col("wk.b0").as("b0"), col("wk.below").as("below"),
          col("wk.ie").as("ie"))
        .localCheckpoint(true)
      val sel = round.select(col("g").as("sg"), col("q").as("sq"),
        col("lo"), col("hi"),
        when(ok, col("b0")).otherwise(lit(0)).as("bl"),
        when(ok, col("b0")).otherwise(lit(buckets - 1)).as("bh"))
      candidate = joinState(candidate, sel)
        .filter(idx.between(col("bl"), col("bh")))
        .select(col("g"), col("sq").as("q"), col("v"), col("t"))
      tagged = true
      val bw = (col("hi") - col("lo")) / buckets
      state = round.select(col("g"), col("q"), col("n"), col("k"),
        when(ok, col("lo") + col("b0") * bw).otherwise(col("lo")).as("lo"),
        when(ok && col("b0") >= buckets - 1, col("hi"))
          .when(ok, col("lo") + (col("b0") + 1) * bw)
          .otherwise(col("hi")).as("hi"),
        when(ok, col("below")).otherwise(col("off")).as("off"),
        when(ok, col("ie") - col("below")).otherwise(col("rem")).as("rem"))
      val a = round.agg(
        max(when(ok, col("ie") - col("below")).otherwise(col("rem"))).as("mx"),
        max(when(ok && (col("ie") - col("below")) < col("rem"), 1)
          .otherwise(0)).as("prog")).head()
      cont = !a.isNullAt(0) && a.getLong(0) > resolveLimit && a.getInt(1) == 1
    }
    val ks = state.select(col("g").as("sg"), col("q").as("sq"),
      col("n"), col("off"), col("k"))
    val wo = Window.partitionBy(col("g"), col("sq")).orderBy(col("v"), col("t"))
    val resolved = joinState(candidate, ks)
      .withColumn("rn", row_number().over(wo) + col("off"))
      .filter(col("rn") === col("k"))
      .select(col("g"), col("sq").as("q"), col("n"), col("v").as("value"))
    resolved.unionByName(trivial).withColumnRenamed("g", groupCol)
  }
}
