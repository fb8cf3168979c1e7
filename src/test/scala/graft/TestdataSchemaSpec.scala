package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Tripwire for driver-side testdata regeneration.
  *
  * The testdata generator has already changed `events.ts`'s physical
  * parquet type once (TIMESTAMP(NANOS) → TIMESTAMP_MICROS), which broke
  * 33 queries at once in round 7 because the breakage only surfaced deep
  * inside query analysis. This suite fails fast, with a pointed message,
  * the next time any table's load-bearing schema drifts — one cheap red
  * test instead of a third of the registry.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val tables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  test("all expected tables load at sf0.001") {
    tables.foreach { t =>
      val n = graft.util.SparkUtil.table(spark, sf(), t).limit(1).count()
      assert(n == 1, s"table $t is empty or unreadable at ${sf()}")
    }
  }

  test("events.ts physical type is one SparkUtil.events understands") {
    val dt = graft.util.SparkUtil.table(spark, sf(), "events").schema("ts").dataType
    assert(
      dt == LongType || dt == TimestampType || dt == TimestampNTZType,
      s"events.ts arrived as $dt — the testdata generator changed the " +
        "parquet physical type again. Teach SparkUtil.events " +
        "(util/SparkUtil.scala) the new shape before anything else; every " +
        "events-backed query funnels through it.")
  }

  test("SparkUtil.events normalizes to the documented contract") {
    val ev = graft.util.SparkUtil.events(spark, sf())
    assert(ev.schema("ts").dataType == TimestampType, "ts must be TimestampType")
    assert(ev.schema("ts_ns").dataType == LongType, "ts_ns must be epoch-nano Long")
    // ts and ts_ns agree (micros precision; ts_ns is defined as ts in nanos)
    val off = ev.selectExpr("max(abs(ts_ns - unix_micros(ts) * 1000))").head().getLong(0)
    assert(off == 0L, s"ts vs ts_ns disagree by up to $off ns")
    // column order is stable across physical-type generations
    assert(ev.columns.toSeq == Seq("event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts"),
      s"events column order drifted: ${ev.columns.mkString(",")}")
  }

  test("key columns of the other load-bearing tables kept their types") {
    def dt(t: String, c: String) =
      graft.util.SparkUtil.table(spark, sf(), t).schema(c).dataType.simpleString
    assert(dt("lineitem", "l_orderkey") == "bigint", "lineitem.l_orderkey")
    assert(dt("lineitem", "l_quantity") == "double" || dt("lineitem", "l_quantity").startsWith("decimal"),
      s"lineitem.l_quantity is ${dt("lineitem", "l_quantity")}")
    assert(dt("orders", "o_orderdate") == "date" || dt("orders", "o_orderdate").startsWith("timestamp"),
      s"orders.o_orderdate is ${dt("orders", "o_orderdate")}")
    assert(dt("documents", "text") == "string", "documents.text")
    assert(dt("embeddings", "embedding") == "array<float>" || dt("embeddings", "embedding") == "array<double>",
      s"embeddings.embedding is ${dt("embeddings", "embedding")}")
  }

  test("embedding dimension is the 64 the ANN oracle replays assume") {
    import org.apache.spark.sql.functions.{max, min, size, col}
    val r = graft.util.SparkUtil.table(spark, sf(), "embeddings")
      .agg(min(size(col("embedding"))), max(size(col("embedding")))).head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 64,
      s"embedding dim drifted to [${r.getInt(0)}, ${r.getInt(1)}] — the " +
        "q31/q32/q53/q57/q58/q59/q81/q108 oracles embed 64-lane literals " +
        "(planes, subspace slices); regenerate them for the new dim.")
  }
}
