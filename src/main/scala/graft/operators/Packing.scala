package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-safe per-group running sums for sequence packing.
  *
  * The naive packer is `sum(tokens) over (partition by lang order by id)`
  * — correct, but the window partition key is the LANGUAGE: a 100 TB
  * corpus with 5 languages runs 5 tasks, each sorting most of the corpus
  * through one reducer. The per-language running sum is inherently
  * sequential only in its FINAL addition — so split it:
  *
  *   1. salt each row into a bucket derived from the leading order
  *      column (range-scaled, so bucket order == row order);
  *   2. running-sum WITHIN (group, bucket) — parallelism is now
  *      groups × buckets, each task sorts ~1/buckets of a language;
  *   3. aggregate one total per (group, bucket) — a tiny map-side
  *      combined shuffle;
  *   4. turn totals into running offsets per group WITHOUT the driver
  *      ever seeing them: collect_list the ≤ `buckets` (bucket, total)
  *      pairs of each group into one array (bounded executor-side state,
  *      ~16 KB) and fold it into exclusive prefix sums with a single
  *      `aggregate()` higher-order function — no window (a window here
  *      would be partitioned by the group alone, the exact funnel shape
  *      this operator exists to avoid, even if harmless on ≤1024 rows),
  *      and no `.collect()` (a per-user or per-doc group domain at
  *      100 TB would OOM the driver);
  *   5. join the offsets back on (group, bucket) — AQE broadcasts the
  *      offset table when small and shuffle-joins it at high group
  *      cardinality — and cum = bucket offset + local running sum.
  *
  * Every step is a pure function of row content, so retries and AQE
  * re-plans reproduce identical sums. This is the same two-phase
  * partition-offset pattern as [[Sampling.shuffleRank]], generalized to
  * grouped running sums with an arbitrary sort order.
  */
object Packing {

  /** Adds `cumName`: the per-`group` running sum of `tokCol` in
    * `orderCols` order — bit-identical to
    * `sum(tokCol) over (partition by group order by orderCols)` but with
    * no single-task-per-group window in the plan.
    *
    * `orderCols.head` must be numeric (castable to long) and its order
    * must be the leading sort key; remaining `orderCols` break ties
    * within a bucket (rows sharing a leading value never split across
    * buckets — bucketing is by value, so ties co-locate).
    */
  /** Both two-phase operators bucket by CASTing the leading order column
    * through LONG/DECIMAL(38,0); under non-ANSI semantics a non-numeric
    * type (e.g. a string) casts to NULL, buckets to NULL, and the offset
    * equi-join would silently DROP every such row. Fail loudly at plan
    * time instead (timestamps cast numerically, so they stay legal). */
  private def requireNumericOrder(df: DataFrame, ord: String, op: String): Unit = {
    val dt = df.schema(ord).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
      dt.isInstanceOf[org.apache.spark.sql.types.TimestampType],
      s"$op: leading order column '$ord' must be numeric or timestamp, got " +
        s"$dt — a non-castable type buckets to NULL and silently drops rows")
  }

  def groupedCumSum(
      df: DataFrame,
      group: String,
      orderCols: Seq[String],
      tokCol: String,
      cumName: String,
      buckets: Int = 1024,
      storage: Option[StorageLevel] = None): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    requireNumericOrder(df, orderCols.head, "groupedCumSum")
    val spark = df.sparkSession
    val ord = orderCols.head
    // Three passes read `df` (bounds, per-bucket totals, the final
    // plan). If it's the tail of an expensive pipeline (q55: the whole
    // filter→chunk job), recomputing it per pass triples the query —
    // materialize once and let every pass read the cached blocks.
    // Determinism does not depend on the cache (every step is content-
    // pure); only cost does.
    // `storage`: the default (None → Spark's MEMORY_AND_DISK local
    // checkpoint) pins blocks in executor memory first — right up to the
    // point the multi-pass input no longer fits the cluster's RAM. Pass
    // Some(StorageLevel.DISK_ONLY) for inputs at that scale: same
    // bit-identical result (spec-pinned), blocks stream from local disk
    // instead of competing with the shuffle for memory.
    val in = storage match {
      case Some(level) => df.localCheckpoint(true, level)
      case None => df.localCheckpoint(true)
    }
    val bounds = in.agg(
      min(col(ord).cast("long")), max(col(ord).cast("long"))).head()
    val (mn, width) =
      if (bounds.isNullAt(0)) (0L, 1L)
      else {
        // span/width in BigInt: a full-range order column (epoch nanos,
        // hashes) overflows (max-min+1) and (ord-mn)*buckets in Long
        val span = BigInt(bounds.getLong(1)) - BigInt(bounds.getLong(0)) + 1
        (bounds.getLong(0), ((span + buckets - 1) / buckets).max(1).toLong)
      }
    // integer bucket index, monotone in the leading order column; the
    // subtraction runs in DECIMAL(38,0) so extreme ranges can't wrap,
    // and a null order value buckets to -1 — sorted before everything,
    // the same nulls-first order the window form would use
    val bucketed = in.withColumn("__pb",
      expr(s"CASE WHEN `$ord` IS NULL THEN -1 ELSE CAST(" +
        s"(CAST(`$ord` AS DECIMAL(38,0)) - CAST('$mn' AS DECIMAL(38,0))) DIV ${width}L" +
        s" AS INT) END"))
    val w = Window.partitionBy(col(group), col("__pb"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__lc", sum(col(tokCol)).over(w))
    // one total per (group, bucket): content-pure, deterministic
    val totals = bucketed
      .groupBy(col(group), col("__pb"))
      .agg(sum(col(tokCol)).cast("long").as("__t"))
    // exclusive per-group prefix sums over the ≤ `buckets` totals of each
    // group, folded inside ONE aggregate call: sort_array orders the
    // (bucket, total) structs by bucket index, aggregate() walks them with
    // a (running sum, emitted offsets) accumulator. Distributed end to
    // end — the driver never materializes a row of this table.
    val offDf = totals
      .groupBy(col(group))
      .agg(sort_array(collect_list(struct(col("__pb"), col("__t")))).as("__bt"))
      .select(col(group).as("__og"), explode(expr(
        """aggregate(
             __bt,
             struct(cast(0 as bigint) as acc,
                    cast(array() as array<struct<b:int, off:bigint>>) as out),
             (s, x) -> named_struct(
               'acc', s.acc + x.__t,
               'out', array_append(s.out, named_struct('b', x.__pb, 'off', s.acc))),
             s -> s.out)""")).as("__o"))
      .select(col("__og"), col("__o.b").as("__opb"), col("__o.off").as("__off"))
    // <=> on the group: a null group is a legal window partition in the
    // form this replaces — plain equality would silently drop its rows.
    // The offset side's keys are renamed (__og/__opb) so the self-join
    // can never resolve both sides to one attribute.
    local.join(offDf,
        local(group) <=> offDf("__og") && local("__pb") === offDf("__opb"))
      .drop("__og", "__opb")
      .withColumn(cumName, col("__off") + col("__lc"))
      .select(df.columns.map(col) :+ col(cumName): _*)
  }

  /** Per-group EXCLUSIVE running max of `valCol` in `orderCols` order —
    * `max(val) over (partition by group order by ... rows unbounded
    * preceding to 1 preceding)` without the per-group window funnel, by
    * the same two-phase plan as [[groupedCumSum]]: a local exclusive
    * running max within (group, range-bucket of the leading order
    * column), one max per (group, bucket), and per-group exclusive
    * prefix maxes folded from the sorted bucket array. Null for each
    * group's first row, like the window form. Exact for any
    * (`orderCols`, ties) because the bucket index is a monotone function
    * of the leading order column alone — rows that compare equal on it
    * share a bucket, so cross-bucket order never depends on the
    * tie-breakers. `valCol` must be long-typed (the callers' integer
    * discipline; a max never mixes scales the way a sum would). */
  def groupedRunningMax(
      df: DataFrame,
      group: String,
      orderCols: Seq[String],
      valCol: String,
      outName: String,
      buckets: Int = 1024): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    requireNumericOrder(df, orderCols.head, "groupedRunningMax")
    val ord = orderCols.head
    val in = df.localCheckpoint(true)
    val bounds = in.agg(
      min(col(ord).cast("long")), max(col(ord).cast("long"))).head()
    val (mn, width) =
      if (bounds.isNullAt(0)) (0L, 1L)
      else {
        val span = BigInt(bounds.getLong(1)) - BigInt(bounds.getLong(0)) + 1
        (bounds.getLong(0), ((span + buckets - 1) / buckets).max(1).toLong)
      }
    val bucketed = in.withColumn("__pb",
      expr(s"CASE WHEN `$ord` IS NULL THEN -1 ELSE CAST(" +
        s"(CAST(`$ord` AS DECIMAL(38,0)) - CAST('$mn' AS DECIMAL(38,0))) DIV ${width}L" +
        s" AS INT) END"))
    val w = Window.partitionBy(col(group), col("__pb"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__lm", max(col(valCol)).over(w))
    val totals = bucketed
      .groupBy(col(group), col("__pb"))
      .agg(max(col(valCol)).cast("long").as("__t"))
    // exclusive prefix MAX over each group's sorted bucket maxes; the
    // accumulator carries (seen-any, running max) so the first bucket's
    // offset is null exactly like the window form's first frame
    val offDf = totals
      .groupBy(col(group))
      .agg(sort_array(collect_list(struct(col("__pb"), col("__t")))).as("__bt"))
      .select(col(group).as("__og"), explode(expr(
        """aggregate(
             __bt,
             struct(cast(null as bigint) as acc,
                    cast(array() as array<struct<b:int, off:bigint>>) as out),
             (s, x) -> named_struct(
               'acc', greatest(s.acc, x.__t),
               'out', array_append(s.out, named_struct('b', x.__pb, 'off', s.acc))),
             s -> s.out)""")).as("__o"))
      .select(col("__og"), col("__o.b").as("__opb"), col("__o.off").as("__off"))
    local.join(offDf,
        local(group) <=> offDf("__og") && local("__pb") === offDf("__opb"))
      .drop("__og", "__opb")
      .withColumn(outName, greatest(col("__off"), col("__lm")))
      .select(df.columns.map(col) :+ col(outName): _*)
  }

  /** Data-mixture curation: per `group`, keep the best rows (by
    * `qualityCol` descending, `tieCol` breaking ties) until the group's
    * token budget is spent — "give me the top-quality 10 M tokens per
    * language", the selection step of every mixture recipe. A row is
    * kept while the running token sum BEFORE it is under the budget, so
    * the output slightly overshoots by at most one document — the
    * greedy-prefix convention, deterministic and SQL-mirrorable.
    *
    * The quality-ordered running sum routes through [[groupedCumSum]]
    * (quality scaled to an integer leading sort key, descending via
    * negation) — no per-group window, so the selection scales past the
    * group-count ceiling like the packer does. */
  def budgetTake(
      df: DataFrame,
      group: String,
      qualityCol: String,
      tieCol: String,
      tokCol: String,
      budget: Long,
      storage: Option[StorageLevel] = None): DataFrame = {
    // -round(q * 1e6): integer, ascending == quality descending; 1e-6
    // quality granularity is far below any meaningful score difference,
    // and remaining ties are broken by tieCol inside the bucket
    val ordered = df.withColumn("__negq",
      -floor(col(qualityCol) * 1e6).cast("long"))
    groupedCumSum(ordered, group, Seq("__negq", tieCol), tokCol, "__cum",
        storage = storage)
      .filter(col("__cum") - col(tokCol) < budget)
      .drop("__negq", "__cum")
  }
}
