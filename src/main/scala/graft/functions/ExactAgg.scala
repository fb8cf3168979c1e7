package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine **reproducible** floating-point aggregates.
  *
  * Plain `sum`/`avg`/`stddev` over doubles are order-dependent: a Spark
  * partial-aggregate tree and a single-threaded engine (the DuckDB oracle,
  * or a re-run with different partitioning) can disagree in the last ulp.
  * For an engine whose results must be *verifiable* — and reproducible
  * across cluster sizes, which matters when the same query runs on 32 cores
  * locally and 1000 executors in production — we aggregate through exact
  * decimal arithmetic and only drop to IEEE double for the final derived
  * value. Every double-producing step after the exact sums is a fixed
  * sequence of IEEE-defined ops (`* / - sqrt`), which all engines compute
  * identically. (Notably `pow` is NOT in that set — correctly-rounded
  * `pow` is not guaranteed, and empirically differs between JVM and C —
  * so variance uses `s*s`, never `pow(s, 2)`.)
  *
  * The decimal sums are still ordinary partial-aggregatable `sum`s:
  * map-side combine, codegen, and AQE all apply; the cost over a double
  * sum is a constant factor in the agg operator, not a change in shuffle
  * shape, so the plan scales exactly like the plain version.
  *
  * `sql*` mirrors each Column builder as ANSI SQL (DuckDB-compatible) with
  * the *identical* operation tree, so Spark results hash-match the oracle
  * bit-for-bit. Keep both halves in lockstep when editing.
  *
  * Magnitude bounds: inputs cast to DECIMAL(18,6) (|x| < 10^12), squares
  * to DECIMAL(38,12); sums stay exact up to 10^26 — far beyond the 100 TB
  * scale point for the value/price/money columns this is used on.
  */
object ExactAgg {

  private val In = DecimalType(18, 6)
  private val Sq = DecimalType(38, 12)

  /** Exact sum, returned as double (deterministic nearest-double of the
    * exact rational). */
  def dsum(c: Column): Column = sum(c.cast(In)).cast(DoubleType)

  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact sum of squares as double. */
  def dsumsq(c: Column): Column =
    sum((c.cast(In) * c.cast(In)).cast(Sq)).cast(DoubleType)

  /** Sample standard deviation (n-1), deterministic; null when n == 1,
    * mirroring `stddev_samp`. */
  def dstddev(c: Column): Column = {
    val n = count(c)
    val s = dsum(c)
    val ssq = dsumsq(c)
    when(n === 1, lit(null).cast(DoubleType))
      .otherwise(sqrt(greatest((ssq - s * s / n) / (n - lit(1)), lit(0.0))))
  }

  /** Reference semantics: null/NaN stddev coerced to 0.0
    * (reference moving_statistic.py:86-87). */
  def dstddev0(c: Column): Column = {
    val sd = dstddev(c)
    when(sd.isNull || isnan(sd), lit(0.0)).otherwise(sd)
  }

  // ---- mergeable partials (two-phase rollups) ----
  // Decimal addition is exact and associative, so partial decimal sums
  // re-summed across a second aggregation level produce the IDENTICAL
  // exact rational as the one-level sum — and therefore the identical
  // nearest-double once cast. This is what lets a bucket-partial rollup
  // (e.g. sliding windows merged from tumbling-bucket partials) stay
  // bit-for-bit equal to the flat aggregation the oracle replays, while
  // doing its wide fan-out over ~rate×bucket fewer rows.

  /** Phase-1 partial: exact decimal sum, KEPT as decimal (no double cast
    * — casting per partial would re-round and break mergeability). */
  def dsumPartial(c: Column): Column = sum(c.cast(In))

  /** Phase-1 partial of squares, kept as decimal. */
  def dsumsqPartial(c: Column): Column = sum((c.cast(In) * c.cast(In)).cast(Sq))

  /** Finish an avg from merged partials: same final op tree as [[davg]]. */
  def davgFromPartials(s: Column, n: Column): Column = s.cast(DoubleType) / n

  /** Finish the null/NaN→0.0 sample stddev from merged partials — the
    * identical final expression tree as [[dstddev0]]. */
  def dstddev0FromPartials(s: Column, q: Column, n: Column): Column = {
    val sd0 = s.cast(DoubleType)
    val sq0 = q.cast(DoubleType)
    val sd = when(n === 1, lit(null).cast(DoubleType))
      .otherwise(sqrt(greatest((sq0 - sd0 * sd0 / n) / (n - lit(1)), lit(0.0))))
    when(sd.isNull || isnan(sd), lit(0.0)).otherwise(sd)
  }

  // ---- windowed variants (same decimal op tree over a window frame) ----
  // Decimal addition is associative, so DuckDB's segment-tree window
  // aggregation and Spark's incremental frame evaluation produce the
  // identical exact sum — which is what makes windowed double stats
  // oracle-checkable when a plain double SUM OVER would drift.

  import org.apache.spark.sql.expressions.WindowSpec

  def wsum(c: Column, w: WindowSpec): Column =
    sum(c.cast(In)).over(w).cast(DoubleType)

  def wavg(c: Column, w: WindowSpec): Column = wsum(c, w) / count(c).over(w)

  def wsumsq(c: Column, w: WindowSpec): Column =
    sum((c.cast(In) * c.cast(In)).cast(Sq)).over(w).cast(DoubleType)

  /** Windowed sample stddev with the reference's null/NaN→0.0 coercion;
    * frame of one row → 0.0 (n−1 = 0 would divide by zero). */
  def wstddev0(c: Column, w: WindowSpec): Column = {
    val n = count(c).over(w)
    val s = wsum(c, w)
    val ssq = wsumsq(c, w)
    when(n === 1, lit(0.0))
      .otherwise(sqrt(greatest((ssq - s * s / n) / (n - lit(1)), lit(0.0))))
  }

  // ---- SQL mirrors (same op tree; DuckDB + ANSI) ----

  def sqlSum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"

  def sqlAvg(e: String): String = s"${sqlSum(e)} / COUNT($e)"

  def sqlSumSq(e: String): String =
    s"CAST(SUM(CAST(CAST($e AS DECIMAL(18,6)) * CAST($e AS DECIMAL(18,6)) AS DECIMAL(38,12))) AS DOUBLE)"

  def sqlStddev(e: String): String =
    s"CASE WHEN COUNT($e) = 1 THEN NULL ELSE " +
      s"sqrt(greatest((${sqlSumSq(e)} - ${sqlSum(e)} * ${sqlSum(e)} / COUNT($e)) / (COUNT($e) - 1), 0.0)) END"

  def sqlStddev0(e: String): String = {
    val sd = sqlStddev(e)
    s"CASE WHEN ($sd) IS NULL OR isnan($sd) THEN 0.0 ELSE ($sd) END"
  }

  // windowed SQL mirrors; `w` is a named window (SQL `WINDOW w AS (...)`)

  def sqlWSum(e: String, w: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,6))) OVER $w AS DOUBLE)"

  def sqlWAvg(e: String, w: String): String =
    s"${sqlWSum(e, w)} / COUNT($e) OVER $w"

  def sqlWSumSq(e: String, w: String): String =
    s"CAST(SUM(CAST(CAST($e AS DECIMAL(18,6)) * CAST($e AS DECIMAL(18,6)) AS DECIMAL(38,12))) OVER $w AS DOUBLE)"

  def sqlWStddev0(e: String, w: String): String =
    s"CASE WHEN COUNT($e) OVER $w = 1 THEN 0.0 ELSE " +
      s"sqrt(greatest((${sqlWSumSq(e, w)} - ${sqlWSum(e, w)} * ${sqlWSum(e, w)} / COUNT($e) OVER $w)" +
      s" / (COUNT($e) OVER $w - 1), 0.0)) END"
}
