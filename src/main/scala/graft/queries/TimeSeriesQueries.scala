package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg
import graft.operators.TimeSeriesOps
import graft.util.SparkUtil

/** Time-series analytics queries over the `events` tick table — the
  * batch face of [[TimeSeriesOps]], each mirrored bit-exactly in DuckDB.
  *
  * The reference engine computes time-windowed moving stats and z-scores;
  * these extend the same domain with the row-frame/per-tick toolkit a
  * quant or feature pipeline expects: lagged returns, rolling stats,
  * drawdown, robust (median/MAD) outliers, and EWMA smoothing.
  */
object TimeSeriesQueries {

  private def ticks(s: SparkSession, dir: String): DataFrame =
    SparkUtil.events(s, dir).select(
      col("event_type").as("symbol"),
      col("value").as("price"),
      col("ts"),
      col("event_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-symbol lag returns + rolling mean/std + running-max drawdown,
    // all window functions sharing ONE sort-shuffle on symbol.
    "q60_tick_derivatives" -> ((s, dir) =>
      TimeSeriesOps.tickDerivatives(ticks(s, dir), "ts", "event_id", rollRows = 10)
        .select(
          col("symbol"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("price"), col("ret"), col("pct_ret"),
          col("roll_avg"), col("roll_std"),
          col("run_max"), col("drawdown"))),

    // Robust per-symbol outlier stats: exact order-statistics median and
    // MAD (no interpolating percentile built-ins — their interpolation op
    // trees differ across engines), modified z-score with MAD=0 guard.
    // materializeInput=false: the input is a deterministic bare parquet
    // projection, so the selection's 2-3 passes re-read the pruned scan
    // instead of checkpointing every tick to block storage first.
    "q61_mad_outliers" -> ((s, dir) =>
      TimeSeriesOps.madOutliers(ticks(s, dir), "event_id",
        materializeInput = false)),

    // EWMA level per symbol via the secondary-sort streaming fold.
    "q62_ewma" -> ((s, dir) =>
      TimeSeriesOps.ewmaBySymbol(
        ticks(s, dir).select(
          col("symbol"),
          unix_micros(col("ts")).as("ts_ms"),
          col("event_id").as("tie"),
          col("price")),
        alpha = 0.25)),

    // Time-RANGE window frame (vs q60's ROWS frames): trailing-1-hour
    // count/avg/max per tick, frame bounds in epoch micros. RANGE
    // includes order-value peers, so ties need no tiebreak column —
    // both engines share that semantic; the windowed average is the
    // decimal-exact wavg, order-invariant within any frame.
    "q94_range_frame" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("t_us"))
        .rangeBetween(-3600000000L, 0L)
      ticks(s, dir)
        .select(col("symbol"), col("event_id"),
          unix_micros(col("ts")).as("t_us"), col("price"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("avg_1h", ExactAgg.wavg(col("price"), w))
        .withColumn("max_1h", max(col("price")).over(w))
    }),

    // Exact per-symbol quartiles (p25/p50/p75) via the multi-rank
    // range-count selection — all three order statistics narrow in the
    // same shared scans, no per-symbol sort anywhere (the ranking-window
    // form is a 5-task funnel at any scale). Dyadic quantiles keep
    // k = ⌈q·n⌉ an exact IEEE product in both engines; type-1 (no
    // interpolation) keeps the answer a row that exists.
    "q100_quartiles" -> ((s, dir) =>
      TimeSeriesOps.exactQuantiles(ticks(s, dir), "symbol", "price",
        "event_id", Seq(0.25, 0.5, 0.75), materializeInput = false)),

    // Forward fill (last observation carried forward) — THE sparse-sensor
    // / irregular-tick densification op. A deterministic 1-in-5 sparsity
    // mask simulates the gaps; `last(_, ignoreNulls)` over the running
    // frame carries the previous reading, per symbol, one sort-shuffle.
    // Both engines define IGNORE NULLS identically; values are copied,
    // never computed, so the fill is trivially engine-exact.
    "q104_locf" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("symbol")).orderBy(col("t_us"), col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      ticks(s, dir)
        .select(col("symbol"), col("event_id"),
          unix_micros(col("ts")).as("t_us"),
          when(col("event_id") % 5 === 0, col("price")).as("sparse"))
        .withColumn("filled", last(col("sparse"), ignoreNulls = true).over(w))
    }),

    // The selection operator on the OTHER domain: document-length
    // quartiles per source — integer-valued doubles, heavy ties, the
    // text table's skew; proves exactQuantiles isn't tick-shaped.
    "q107_len_quartiles" -> ((s, dir) =>
      TimeSeriesOps.exactQuantiles(
        graft.util.SparkUtil.table(s, dir, "documents"),
        "source", "n_chars", "doc_id",
        Seq(0.25, 0.5, 0.75), materializeInput = false)),

    // Exact Pearson correlation of a metric against time (per-stream
    // drift detection): the five sums are exact — built-in corr()
    // accumulates doubles in shuffle order and can't cross-engine-match
    // — then one fixed IEEE op sequence (± × ÷ and the correctly-
    // rounded sqrt) derives covariance and r. Pearson r is invariant to
    // affine transforms of either axis, so the time operand is HOURS
    // SINCE THE STREAM'S FIRST EVENT — rebasing keeps every sum (Σh,
    // Σh², Σxh) small enough that its decimal/int → double cast is
    // value-exact in BOTH engines. Raw epoch seconds would not be:
    // Σt² ≈ 6·10²⁰ needs an int128→double conversion that DuckDB gets
    // wrong by 1 ulp (measured; Spark's BigDecimal path rounds
    // correctly), and a 1-ulp input flips the cancellation-heavy
    // variance. Zero-variance guard to 0.0, the reference's σ=0 policy.
    "q114_time_corr" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      val HI = org.apache.spark.sql.types.DecimalType(9, 0)
      val SQ = org.apache.spark.sql.types.DecimalType(38, 12)
      // deterministic decimal→double: integer and fractional parts are
      // each value-exact as doubles (raw < 2⁵³), and the one IEEE add is
      // the same op in both engines — DuckDB's native int128-decimal
      // cast is 1-ulp wrong for some large-raw values (measured on Σx²),
      // while Spark's BigDecimal path rounds correctly; splitting makes
      // the conversion engine-independent instead of betting on either
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val ev = graft.util.SparkUtil.events(s, dir)
        .select(col("event_type"), col("value").as("x"),
          expr("ts_ns div 1000000000").as("t"))
      val t0 = ev.groupBy(col("event_type")).agg(min(col("t")).as("t0"))
      val agg = ev.join(t0, "event_type")
        .select(col("event_type"), col("x"),
          expr("(t - t0) div 3600").as("h"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          d2(sum(col("x").cast(XI))).as("sx"),
          sum(col("h")).cast("double").as("sh"),
          d2(sum(col("x").cast(XI) * col("h").cast(HI))).as("sxh"),
          d2(sum((col("x").cast(XI) * col("x").cast(XI)).cast(SQ))).as("sxx"),
          sum(col("h") * col("h")).cast("double").as("shh"))
      val num = col("sxh") - col("sx") * col("sh") / col("n")
      val vx = col("sxx") - col("sx") * col("sx") / col("n")
      val vh = col("shh") - col("sh") * col("sh") / col("n")
      agg.select(col("event_type"), col("n").cast("long").as("n"),
        (num / col("n")).as("cov_per_hour"),
        when(vx <= 0.0 || vh <= 0.0, lit(0.0))
          .otherwise(num / (sqrt(vx) * sqrt(vh))).as("corr"))
    }),

    // Per-stream OLS trend line (slope per hour + intercept): the SQL
    // standard's regr_slope/regr_intercept, which both engines implement
    // as order-dependent double accumulation — re-derived here from the
    // q114 exact-sum discipline (same rebased-hours operand, same split
    // decimal→double casts) so the fitted line reproduces bit-for-bit.
    // Constant-time streams guard to slope 0 through the mean.
    "q116_trend_line" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      val HI = org.apache.spark.sql.types.DecimalType(9, 0)
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val ev = graft.util.SparkUtil.events(s, dir)
        .select(col("event_type"), col("value").as("x"),
          expr("ts_ns div 1000000000").as("t"))
      val t0 = ev.groupBy(col("event_type")).agg(min(col("t")).as("t0"))
      val agg = ev.join(t0, "event_type")
        .select(col("event_type"), col("x"),
          expr("(t - t0) div 3600").as("h"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          d2(sum(col("x").cast(XI))).as("sx"),
          sum(col("h")).cast("double").as("sh"),
          d2(sum(col("x").cast(XI) * col("h").cast(HI))).as("sxh"),
          sum(col("h") * col("h")).cast("double").as("shh"))
      val num = col("sxh") - col("sx") * col("sh") / col("n")
      val vh = col("shh") - col("sh") * col("sh") / col("n")
      agg
        .withColumn("slope",
          when(vh <= 0.0, lit(0.0)).otherwise(num / vh))
        .select(col("event_type"), col("n").cast("long").as("n"),
          col("slope"),
          (col("sx") / col("n") - col("slope") * (col("sh") / col("n")))
            .as("intercept"))
    }),

    // Approximate quantiles as EXACT-ON-A-DETERMINISTIC-SAMPLE: the
    // md5-bucket sample (layout/retry/engine-invariant, unlike
    // df.sample's per-partition RNG) bounds the selection's cost at any
    // corpus size, and the quartiles OF THE SAMPLE are then computed
    // exactly — so the estimator itself is reproducible bit-for-bit,
    // which no RNG-seeded or sketch-state estimator can claim. 64/256
    // ≈ 25% here; at 100 TB the fraction is the accuracy/cost dial.
    "q115_sampled_quartiles" -> ((s, dir) =>
      TimeSeriesOps.exactQuantiles(
        graft.operators.Sampling.hashSample(
          ticks(s, dir), col("event_id"), 64),
        "symbol", "price", "event_id",
        Seq(0.25, 0.5, 0.75), materializeInput = false)),

    // Time-weighted average price over irregular ticks: each price
    // weighted by how long it held (gap to the next tick, integer
    // seconds), per symbol — the TWAP every execution/analytics stack
    // computes, and the canonical irregular-series resample. Weights are
    // integer seconds and the weighted sum runs in decimal (split
    // decimal→double cast, the q114 discipline), so the mark
    // reproduces bit-for-bit. One sort-shuffle on symbol for the lead();
    // the aggregation is map-side combined.
    "q122_twap" -> ((s, dir) =>
      TimeSeriesOps.twapBySymbol(
        ticks(s, dir).select(col("symbol"), col("price").as("x"),
          unix_micros(col("ts")).as("t_us"), col("event_id")))),

    // Hourly OHLC bars: the classic tick→bar resample. Open/close are
    // deterministic arg-min/arg-max via struct ordering on the unique
    // (t_us, event_id) key — no ranking window, one shuffle keyed by
    // (symbol, hour); high/low/count ride the same aggregate. Copied
    // values, never computed — trivially engine-exact.
    "q123_ohlc_bars" -> ((s, dir) =>
      TimeSeriesOps.ohlcBars(
        ticks(s, dir).select(col("symbol"), col("price").as("x"),
          unix_micros(col("ts")).as("t_us"), col("event_id")),
        bucketUs = 3600000000L)),

    // Tukey-fence winsorization: per-symbol exact quartiles (the
    // distributed selection — dyadic ranks, engine-exact) → IQR fences
    // p25 − 1.5·IQR / p75 + 1.5·IQR → every tick clipped into the fences
    // with a flag. The robust-scaling step of a feature pipeline:
    // outliers bounded, not dropped. Two scans + a broadcast fence join;
    // the fence arithmetic and greatest/least clip are single IEEE ops,
    // so clipped values hash-match.
    "q121_winsorize" -> ((s, dir) => {
      val t = ticks(s, dir)
      val fences = TimeSeriesOps.exactQuantiles(t, "symbol", "price",
          "event_id", Seq(0.25, 0.75), materializeInput = false)
        .groupBy(col("symbol"))
        .agg(min(when(col("q") === 0.25, col("value"))).as("p25"),
          min(when(col("q") === 0.75, col("value"))).as("p75"))
        .withColumn("lo", col("p25") - (col("p75") - col("p25")) * 1.5)
        .withColumn("hi", col("p75") + (col("p75") - col("p25")) * 1.5)
        .select(col("symbol"), col("lo"), col("hi"))
      t.join(broadcast(fences), Seq("symbol"))
        .select(col("symbol"), col("event_id"), col("price"),
          greatest(col("lo"), least(col("hi"), col("price"))).as("winsorized"),
          (col("price") < col("lo") || col("price") > col("hi")).as("clipped"))
    }),

    // Lag-1 autocorrelation per symbol: Pearson r between consecutive
    // ticks (x_t, x_{t+1}) in (ts, event_id) order — the signal that
    // separates a mean-reverting stream from a trending one, and the
    // q114 exact-sum discipline on a SELF-lagged operand pair: both
    // operands go through the same decimal casts, the five sums are
    // order-invariant, and one fixed IEEE op tree derives r. The lead()
    // sort-shuffle on symbol is the ONLY shuffle — the aggregation keys
    // on the same column, so Catalyst reuses the partitioning (no second
    // exchange); at 100 TB this is one sort per symbol partition, never
    // a global sort. Streams with < 2 ticks simply emit nothing (no
    // pair rows), the same absence semantics both engines share.
    "q126_autocorr" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      val SQ = org.apache.spark.sql.types.DecimalType(38, 12)
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("ts"), col("event_id"))
      val pairs = ticks(s, dir)
        .withColumn("nxt", lead(col("price"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("symbol"),
          col("price").cast(XI).as("a"), col("nxt").cast(XI).as("b"))
      val agg = pairs.groupBy(col("symbol"))
        .agg(count(lit(1)).cast("double").as("n"),
          d2(sum(col("a"))).as("sa"),
          d2(sum(col("b"))).as("sb"),
          d2(sum((col("a") * col("b")).cast(SQ))).as("sab"),
          d2(sum((col("a") * col("a")).cast(SQ))).as("saa"),
          d2(sum((col("b") * col("b")).cast(SQ))).as("sbb"))
      val num = col("sab") - col("sa") * col("sb") / col("n")
      val va = col("saa") - col("sa") * col("sa") / col("n")
      val vb = col("sbb") - col("sb") * col("sb") / col("n")
      agg.select(col("symbol"), col("n").cast("long").as("n_pairs"),
        when(va <= 0.0 || vb <= 0.0, lit(0.0))
          .otherwise(num / (sqrt(va) * sqrt(vb))).as("acf1"))
    }),

    // Inter-arrival gap profile per stream: the tail of the gap
    // distribution (p50 / p75 / p87.5 — dyadic, so rank = ⌈q·n⌉ is an
    // exact IEEE product) over lead()-derived integer-microsecond gaps,
    // resolved by the distributed range-count selection — feed-health /
    // SLA monitoring for an ingest pipeline, and the selection operator
    // over a DERIVED (windowed) input rather than a bare scan. Gaps are
    // integer micros in a double (exact well past any real clock span);
    // the lead() sort-shuffle is again the only data-shaped shuffle.
    "q127_gap_quantiles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("t_us"), col("event_id"))
      val gaps = ticks(s, dir)
        .select(col("symbol"), unix_micros(col("ts")).as("t_us"), col("event_id"))
        .withColumn("gap", (lead(col("t_us"), 1).over(w) - col("t_us")).cast("double"))
        .filter(col("gap").isNotNull)
        .select(col("symbol"), col("gap"), col("event_id"))
      TimeSeriesOps.exactQuantiles(gaps, "symbol", "gap", "event_id",
        Seq(0.5, 0.75, 0.875))
    }),

    // Seasonal-naive forecast skill (MASE, Hyndman–Koehler 2006): per
    // stream, the lag-24 "seasonal" forecast's mean absolute error
    // scaled by the lag-1 naive MAE — the standard is-this-model-
    // better-than-persistence gate before any forecaster ships. Both
    // error series come off ONE sort-shuffle (two lags share the
    // window); |e| is a single IEEE op, sums run in decimal (order-
    // invariant), and MASE itself is the split decimal→double cast +
    // three IEEE divisions — a fixed op tree both engines replay
    // digit-for-digit. sae1 = 0 (a constant stream) guards to 0.0.
    "q148_mase" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("t_us"), col("event_id"))
      val t = ticks(s, dir)
        .select(col("symbol"), col("price"),
          unix_micros(col("ts")).as("t_us"), col("event_id"))
        .withColumn("e1", abs(col("price") - lag(col("price"), 1).over(w)))
        .withColumn("ek", abs(col("price") - lag(col("price"), 24).over(w)))
      t.groupBy(col("symbol"))
        .agg(count(col("e1")).as("n1"), count(col("ek")).as("nk"),
          d2(sum(col("e1").cast(XI))).as("sae1"),
          d2(sum(col("ek").cast(XI))).as("saek"))
        .select(col("symbol"), col("n1"), col("nk"),
          col("sae1"), col("saek"),
          when(col("nk") === 0 || col("sae1") === 0.0, lit(0.0))
            .otherwise((col("saek") / col("nk").cast("double")) /
              (col("sae1") / col("n1").cast("double"))).as("mase"))
    }),

    // EQUI-DEPTH histogram (the optimizer's histogram, vs q70's
    // equi-width): per-symbol octile fences from the distributed exact
    // selection (dyadic q → engine-exact ranks), every tick bucketed by
    // how many fences sit strictly below it — a ≤7-element broadcast
    // array probe, per-row codegen — then per-bucket count + decimal
    // price sums. Near-equal counts per bucket is the point: a
    // selectivity estimate from this histogram is ±⅛ regardless of
    // skew, which is why engines keep equi-depth and not equi-width
    // stats. Fence-equal ticks land in the lower bucket in both engines
    // (v < price, identical tie rule). Two scans + one broadcast join.
    "q159_equidepth_hist" -> ((s, dir) => {
      val XI = org.apache.spark.sql.types.DecimalType(18, 6)
      def d2(c: org.apache.spark.sql.Column) = {
        val f = floor(c)
        f.cast("double") + (c - f).cast("double")
      }
      val t = ticks(s, dir)
      val fences = TimeSeriesOps.exactQuantiles(t, "symbol", "price",
          "event_id", Seq(0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875),
          materializeInput = false)
        .groupBy(col("symbol"))
        .agg(sort_array(collect_list(col("value"))).as("f"))
      t.join(broadcast(fences), "symbol")
        .select(col("symbol"), col("price"),
          size(filter(col("f"), v => v < col("price"))).as("bucket"))
        .groupBy(col("symbol"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          d2(sum(col("price").cast(XI))).as("sum_price"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q94_range_frame" ->
      s"""SELECT symbol, event_id, t_us, price,
         |  COUNT(1) OVER w AS n_1h,
         |  ${ExactAgg.sqlWAvg("price", "w")} AS avg_1h,
         |  MAX(price) OVER w AS max_1h
         |FROM (SELECT event_type AS symbol, event_id,
         |        epoch_ns(ts) // 1000 AS t_us, value AS price FROM events)
         |WINDOW w AS (PARTITION BY symbol ORDER BY t_us
         |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q60_tick_derivatives" ->
      s"""SELECT event_type AS symbol, event_id,
         |       epoch_ns(ts) // 1000000 AS ts_ms, value AS price,
         |       value - lag(value) OVER w AS ret,
         |       CASE WHEN lag(value) OVER w IS NULL OR lag(value) OVER w = 0.0
         |            THEN NULL
         |            ELSE (value - lag(value) OVER w) / lag(value) OVER w END AS pct_ret,
         |       ${ExactAgg.sqlWAvg("value", "wr")} AS roll_avg,
         |       ${ExactAgg.sqlWStddev0("value", "wr")} AS roll_std,
         |       MAX(value) OVER wc AS run_max,
         |       CASE WHEN MAX(value) OVER wc = 0.0 THEN 0.0
         |            ELSE (MAX(value) OVER wc - value) / MAX(value) OVER wc END AS drawdown
         |FROM events
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
         |       wr AS (PARTITION BY event_type ORDER BY ts, event_id
         |              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
         |       wc AS (PARTITION BY event_type ORDER BY ts, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q61_mad_outliers" ->
      """WITH ranked AS (
        |  SELECT event_type AS symbol, value, event_id,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |         COUNT(1) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |med AS (
        |  SELECT symbol, MAX(n) AS n, SUM(value) / COUNT(1) AS median
        |  FROM ranked WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        |  GROUP BY symbol),
        |dev AS (
        |  SELECT e.event_type AS symbol, e.value, e.event_id, m.n, m.median,
        |         abs(e.value - m.median) AS adev
        |  FROM events e JOIN med m ON e.event_type = m.symbol),
        |dranked AS (
        |  SELECT symbol, adev, event_id,
        |         row_number() OVER (PARTITION BY symbol ORDER BY adev, event_id) AS rn,
        |         COUNT(1) OVER (PARTITION BY symbol) AS dn
        |  FROM dev),
        |mad AS (
        |  SELECT symbol, SUM(adev) / COUNT(1) AS mad
        |  FROM dranked WHERE rn = (dn + 1) // 2 OR rn = dn // 2 + 1
        |  GROUP BY symbol)
        |SELECT d.symbol, MAX(d.n) AS n, MAX(d.median) AS median,
        |       MAX(mad.mad) AS mad,
        |       COUNT(CASE WHEN abs(CASE WHEN mad.mad = 0.0 THEN 0.0
        |                     ELSE 0.6745 * (d.value - d.median) / mad.mad END) > 3.5
        |                   THEN 1 END) AS n_outliers
        |FROM dev d JOIN mad ON d.symbol = mad.symbol
        |GROUP BY d.symbol""".stripMargin,

    // list_reduce folds left with acc = first element — the identical
    // recurrence (and identical IEEE op tree: α·x + (1−α)·acc) as the
    // Spark secondary-sort fold. 0.25/0.75 are exact binary doubles.
    "q62_ewma" ->
      """SELECT event_type AS symbol, COUNT(1) AS n_ticks,
        |       list_reduce(list(value ORDER BY ts, event_id),
        |                   (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma_price
        |FROM events GROUP BY event_type""".stripMargin,

    // Type-1 order statistic at rank ⌈q·n⌉ over the (value, event_id)
    // total order — the ranking-window form the selection operator
    // replaces; dyadic q makes q·n (and so the rank) engine-exact.
    "q100_quartiles" ->
      """WITH r AS (
        |  SELECT event_type AS symbol, value AS v, event_id AS t,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(1) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |qs AS (SELECT unnest([0.25, 0.5, 0.75]::DOUBLE[]) AS q)
        |SELECT symbol, q, CAST(n AS BIGINT) AS n, v AS value
        |FROM r JOIN qs ON rn = CAST(ceil(q * n) AS BIGINT)""".stripMargin,

    // The same deterministic sparsity mask and IGNORE NULLS running
    // last-value; fill values are copied inputs, so parity is exact.
    "q104_locf" ->
      """SELECT event_type AS symbol, event_id,
        |  epoch_ns(ts) // 1000 AS t_us,
        |  CASE WHEN event_id % 5 = 0 THEN value END AS sparse,
        |  last_value(CASE WHEN event_id % 5 = 0 THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY epoch_ns(ts) // 1000, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events""".stripMargin,

    "q107_len_quartiles" ->
      """WITH r AS (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS v, doc_id AS t,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY CAST(n_chars AS DOUBLE), doc_id) AS rn,
        |         COUNT(1) OVER (PARTITION BY source) AS n
        |  FROM documents),
        |qs AS (SELECT unnest([0.25, 0.5, 0.75]::DOUBLE[]) AS q)
        |SELECT source, q, CAST(n AS BIGINT) AS n, v AS value
        |FROM r JOIN qs ON rn = CAST(ceil(q * n) AS BIGINT)""".stripMargin,

    // Hours since the stream's first event + split-cast decimal sums
    // (floor part + fraction part, one IEEE add) keep every →double
    // conversion engine-independent; the same final IEEE op sequence.
    "q114_time_corr" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val sx = "SUM(CAST(x AS DECIMAL(18,6)))"
      val sxh = "SUM(CAST(x AS DECIMAL(18,6)) * CAST(h AS DECIMAL(9,0)))"
      val sxx = "SUM(CAST(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)) AS DECIMAL(38,12)))"
      s"""WITH e0 AS (
         |  SELECT event_type, value AS x, epoch_ns(ts) // 1000000000 AS t
         |  FROM events),
         |m AS (SELECT event_type, MIN(t) AS t0 FROM e0 GROUP BY event_type),
         |e AS (
         |  SELECT e0.event_type, x, (t - t0) // 3600 AS h
         |  FROM e0 JOIN m ON e0.event_type = m.event_type),
         |a AS (
         |  SELECT event_type, CAST(COUNT(1) AS DOUBLE) AS n,
         |    ${d2(sx)} AS sx,
         |    CAST(SUM(h) AS DOUBLE) AS sh,
         |    ${d2(sxh)} AS sxh,
         |    ${d2(sxx)} AS sxx,
         |    CAST(SUM(h * h) AS DOUBLE) AS shh
         |  FROM e GROUP BY event_type)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |  (sxh - sx * sh / n) / n AS cov_per_hour,
         |  CASE WHEN sxx - sx * sx / n <= 0.0 OR shh - sh * sh / n <= 0.0
         |       THEN 0.0
         |       ELSE (sxh - sx * sh / n)
         |            / (sqrt(sxx - sx * sx / n) * sqrt(shh - sh * sh / n)) END AS corr
         |FROM a""".stripMargin
    },

    // The q114 sum discipline; slope resolved in a nested select so the
    // intercept reads the identical rounded value.
    "q116_trend_line" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val sx = "SUM(CAST(x AS DECIMAL(18,6)))"
      val sxh = "SUM(CAST(x AS DECIMAL(18,6)) * CAST(h AS DECIMAL(9,0)))"
      s"""WITH e0 AS (
         |  SELECT event_type, value AS x, epoch_ns(ts) // 1000000000 AS t
         |  FROM events),
         |m AS (SELECT event_type, MIN(t) AS t0 FROM e0 GROUP BY event_type),
         |e AS (
         |  SELECT e0.event_type, x, (t - t0) // 3600 AS h
         |  FROM e0 JOIN m ON e0.event_type = m.event_type),
         |a AS (
         |  SELECT event_type, CAST(COUNT(1) AS DOUBLE) AS n,
         |    ${d2(sx)} AS sx,
         |    CAST(SUM(h) AS DOUBLE) AS sh,
         |    ${d2(sxh)} AS sxh,
         |    CAST(SUM(h * h) AS DOUBLE) AS shh
         |  FROM e GROUP BY event_type),
         |b AS (
         |  SELECT event_type, n, sx, sh,
         |    CASE WHEN shh - sh * sh / n <= 0.0 THEN 0.0
         |         ELSE (sxh - sx * sh / n) / (shh - sh * sh / n) END AS slope
         |  FROM a)
         |SELECT event_type, CAST(n AS BIGINT) AS n, slope,
         |  sx / n - slope * (sh / n) AS intercept
         |FROM b""".stripMargin
    },

    // The identical md5-bucket keep predicate, then q100's rank oracle
    // over the surviving rows.
    // Integer-second weights, decimal weighted sum, split decimal→double
    // cast (q114 discipline), one final divide.
    "q122_twap" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val wsum = "SUM(CAST(x AS DECIMAL(18,6)) * CAST(dt_s AS DECIMAL(9,0)))"
      s"""WITH e AS (
         |  SELECT event_type AS symbol, value AS x,
         |         epoch_ns(ts) // 1000 AS t_us, event_id
         |  FROM events),
         |d AS (
         |  SELECT symbol, x,
         |    (lead(t_us) OVER (PARTITION BY symbol ORDER BY t_us, event_id)
         |      - t_us) // 1000000 AS dt_s
         |  FROM e),
         |a AS (
         |  SELECT symbol, COUNT(1) AS n_intervals, SUM(dt_s) AS weight_s,
         |    ${d2(wsum)} AS wsum
         |  FROM d WHERE dt_s IS NOT NULL GROUP BY symbol)
         |SELECT symbol, CAST(n_intervals AS BIGINT) AS n_intervals,
         |  CAST(weight_s AS BIGINT) AS weight_s,
         |  CASE WHEN weight_s = 0 THEN 0.0
         |       ELSE wsum / CAST(weight_s AS DOUBLE) END AS twap
         |FROM a""".stripMargin
    },

    // Deterministic open/close via asc/desc row_number on the unique
    // (t_us, event_id) order — the same rows Spark's struct min/max pick.
    "q123_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type AS symbol, value AS x,
        |         epoch_ns(ts) // 1000 AS t_us, event_id
        |  FROM events),
        |r AS (
        |  SELECT symbol, x, t_us // 3600000000 AS hour_bucket,
        |    row_number() OVER (PARTITION BY symbol, t_us // 3600000000
        |                       ORDER BY t_us, event_id) AS ra,
        |    row_number() OVER (PARTITION BY symbol, t_us // 3600000000
        |                       ORDER BY t_us DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT symbol, hour_bucket, COUNT(1) AS n_ticks,
        |  MIN(CASE WHEN ra = 1 THEN x END) AS open,
        |  MAX(x) AS high, MIN(x) AS low,
        |  MIN(CASE WHEN rd = 1 THEN x END) AS close
        |FROM r GROUP BY symbol, hour_bucket""".stripMargin,

    // Rank-based quartiles (type-1, dyadic — same as the q100 oracle),
    // then the identical fence arithmetic and greatest/least clip.
    "q121_winsorize" ->
      """WITH r AS (
        |  SELECT event_type AS symbol, value AS v,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(1) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |f AS (
        |  SELECT symbol,
        |    MIN(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS p25,
        |    MIN(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS p75
        |  FROM r GROUP BY symbol),
        |fe AS (
        |  SELECT symbol, p25 - (p75 - p25) * 1.5 AS lo, p75 + (p75 - p25) * 1.5 AS hi
        |  FROM f)
        |SELECT e.event_type AS symbol, e.event_id, e.value AS price,
        |  greatest(fe.lo, least(fe.hi, e.value)) AS winsorized,
        |  (e.value < fe.lo OR e.value > fe.hi) AS clipped
        |FROM events e JOIN fe ON fe.symbol = e.event_type""".stripMargin,

    "q115_sampled_quartiles" ->
      """WITH r AS (
        |  SELECT event_type AS symbol, value AS v, event_id AS t,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(1) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |  WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '40'),
        |qs AS (SELECT unnest([0.25, 0.5, 0.75]::DOUBLE[]) AS q)
        |SELECT symbol, q, CAST(n AS BIGINT) AS n, v AS value
        |FROM r JOIN qs ON rn = CAST(ceil(q * n) AS BIGINT)""".stripMargin,

    // The q114 sum discipline on the lead()-paired operands: identical
    // decimal casts on both pair members, split decimal→double sums,
    // the same final IEEE op sequence.
    "q126_autocorr" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val sa = "SUM(CAST(a AS DECIMAL(18,6)))"
      val sb = "SUM(CAST(b AS DECIMAL(18,6)))"
      val sab = "SUM(CAST(CAST(a AS DECIMAL(18,6)) * CAST(b AS DECIMAL(18,6)) AS DECIMAL(38,12)))"
      val saa = "SUM(CAST(CAST(a AS DECIMAL(18,6)) * CAST(a AS DECIMAL(18,6)) AS DECIMAL(38,12)))"
      val sbb = "SUM(CAST(CAST(b AS DECIMAL(18,6)) * CAST(b AS DECIMAL(18,6)) AS DECIMAL(38,12)))"
      s"""WITH p AS (
         |  SELECT event_type AS symbol, value AS a,
         |    lead(value) OVER (PARTITION BY event_type
         |                      ORDER BY ts, event_id) AS b
         |  FROM events),
         |ag AS (
         |  SELECT symbol, CAST(COUNT(1) AS DOUBLE) AS n,
         |    ${d2(sa)} AS sa, ${d2(sb)} AS sb,
         |    ${d2(sab)} AS sab, ${d2(saa)} AS saa, ${d2(sbb)} AS sbb
         |  FROM p WHERE b IS NOT NULL GROUP BY symbol)
         |SELECT symbol, CAST(n AS BIGINT) AS n_pairs,
         |  CASE WHEN saa - sa * sa / n <= 0.0 OR sbb - sb * sb / n <= 0.0
         |       THEN 0.0
         |       ELSE (sab - sa * sb / n)
         |            / (sqrt(saa - sa * sa / n) * sqrt(sbb - sb * sb / n)) END AS acf1
         |FROM ag""".stripMargin
    },

    // Rank-based type-1 selection over the identical lead()-derived
    // integer-micro gaps; dyadic q keeps the rank engine-exact.
    "q127_gap_quantiles" ->
      """WITH e AS (
        |  SELECT event_type AS symbol, epoch_ns(ts) // 1000 AS t_us, event_id
        |  FROM events),
        |g AS (
        |  SELECT symbol,
        |    CAST(lead(t_us) OVER (PARTITION BY symbol ORDER BY t_us, event_id)
        |         - t_us AS DOUBLE) AS v,
        |    event_id AS t
        |  FROM e),
        |r AS (
        |  SELECT symbol, v, t,
        |         row_number() OVER (PARTITION BY symbol ORDER BY v, t) AS rn,
        |         COUNT(1) OVER (PARTITION BY symbol) AS n
        |  FROM g WHERE v IS NOT NULL),
        |qs AS (SELECT unnest([0.5, 0.75, 0.875]::DOUBLE[]) AS q)
        |SELECT symbol, q, CAST(n AS BIGINT) AS n, v AS value
        |FROM r JOIN qs ON rn = CAST(ceil(q * n) AS BIGINT)""".stripMargin,

    // Identical lag pair off one window order; decimal |e| sums, the
    // shared d2 split cast, the same three-division MASE tree.
    "q148_mase" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val s1 = "SUM(CAST(e1 AS DECIMAL(18,6)))"
      val sk = "SUM(CAST(ek AS DECIMAL(18,6)))"
      s"""WITH e AS (
         |  SELECT event_type AS symbol, value AS price,
         |         epoch_ns(ts) // 1000 AS t_us, event_id
         |  FROM events),
         |l AS (
         |  SELECT symbol,
         |    abs(price - lag(price, 1) OVER (PARTITION BY symbol
         |      ORDER BY t_us, event_id)) AS e1,
         |    abs(price - lag(price, 24) OVER (PARTITION BY symbol
         |      ORDER BY t_us, event_id)) AS ek
         |  FROM e),
         |a AS (
         |  SELECT symbol, COUNT(e1) AS n1, COUNT(ek) AS nk,
         |    ${d2(s1)} AS sae1, ${d2(sk)} AS saek
         |  FROM l GROUP BY symbol)
         |SELECT symbol, CAST(n1 AS BIGINT) AS n1, CAST(nk AS BIGINT) AS nk,
         |  sae1, saek,
         |  CASE WHEN nk = 0 OR sae1 = 0.0 THEN 0.0
         |       ELSE (saek / CAST(nk AS DOUBLE)) / (sae1 / CAST(n1 AS DOUBLE))
         |  END AS mase
         |FROM a""".stripMargin
    },

    // The q127-style rank selection for the octile fences, the same
    // sorted-list probe with the identical v < price tie rule.
    "q159_equidepth_hist" -> {
      def d2(s: String): String =
        s"CAST(FLOOR($s) AS DOUBLE) + CAST($s - FLOOR($s) AS DOUBLE)"
      val sp = "SUM(CAST(price AS DECIMAL(18,6)))"
      s"""WITH e AS (
         |  SELECT event_type AS symbol, value AS price, event_id FROM events),
         |r AS (
         |  SELECT symbol, price AS v,
         |         row_number() OVER (PARTITION BY symbol
         |           ORDER BY price, event_id) AS rn,
         |         COUNT(1) OVER (PARTITION BY symbol) AS n
         |  FROM e),
         |qs AS (SELECT unnest([0.125, 0.25, 0.375, 0.5,
         |                      0.625, 0.75, 0.875]::DOUBLE[]) AS q),
         |fr AS (SELECT symbol, v FROM r
         |       JOIN qs ON rn = CAST(ceil(q * n) AS BIGINT)),
         |fl AS (SELECT symbol, list_sort(list(v)) AS f FROM fr GROUP BY symbol),
         |b AS (SELECT e.symbol, e.price,
         |        len(list_filter(fl.f, v -> v < e.price)) AS bucket
         |      FROM e JOIN fl ON e.symbol = fl.symbol)
         |SELECT symbol, CAST(bucket AS INT) AS bucket, COUNT(1) AS n,
         |  ${d2(sp)} AS sum_price
         |FROM b GROUP BY symbol, bucket""".stripMargin
    }
  )
}
