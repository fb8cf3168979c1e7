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

  /** Exact per-group median by explicit order statistics: ranks the
    * group by (value, tiebreak) and averages the one or two middle rows.
    * Unlike interpolating percentile built-ins — whose interpolation op
    * trees differ between engines in the last ulp — the sum of the two
    * selected doubles divided by their count is a fixed IEEE op sequence
    * every engine computes identically. One sort-shuffle per call;
    * output one row per group: (groupCol, n, median). */
  def exactMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String): DataFrame = {
    val wo = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    val wp = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valueCol), col(tieCol))
      .withColumn("rn", row_number().over(wo))
      .withColumn("n", count(lit(1)).over(wp))
      // floor division — Spark's `/` on longs is double division
      .filter(col("rn") === floor((col("n") + 1) / 2) ||
        col("rn") === floor(col("n") / 2) + 1)
      .groupBy(col(groupCol))
      .agg(
        max(col("n")).as("n"),
        (sum(col(valueCol)) / count(lit(1))).as("median"))
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
      zCut: Double = 3.5): DataFrame = {
    val med = exactMedian(ticks, "symbol", "price", tieCol)
      .select(col("symbol"), col("n"), col("median"))
    val dev = ticks.join(broadcast(med), Seq("symbol"))
      .withColumn("adev", abs(col("price") - col("median")))
    val mad = exactMedian(dev, "symbol", "adev", tieCol)
      .select(col("symbol"), col("median").as("mad"))
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
}
