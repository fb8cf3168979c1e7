package graft

import org.apache.spark.sql.functions._

import graft.util.SparkUtil.table

/** Approximate-sketch accuracy: HLL distinct counts and approximate
  * percentiles must land within their configured error of the exact
  * answers. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val o = table(spark, sf("sf0.01"), "orders")
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("e"))
    val approx = o.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"))
    exact.join(approx, "o_orderpriority").collect().foreach { r =>
      val (e, a) = (r.getAs[Long]("e"), r.getAs[Long]("a"))
      assert(math.abs(a - e).toDouble / e < 0.05, s"$e vs $a")
    }
  }

  test("approx_percentile close to exact percentile") {
    val li = table(spark, sf("sf0.01"), "lineitem")
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("e"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a"))
      .collect().head
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) / r.getDouble(0) < 0.05)
  }

  test("Misra-Gries: every item above n/(k+1) survives; estimates undercount by ≤ n/(k+1)") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    // skewed synthetic stream: item i repeated (50-i)² times, i in 0..49,
    // plus 10k distinct singletons as noise — scrambled and repartitioned
    // so map-side partials exercise the merge rule
    val heavy = (0 until 50).flatMap(i => Seq.fill((50 - i) * (50 - i))(s"w$i"))
    val noise = (0 until 10000).map(i => s"noise$i")
    val n = heavy.size + noise.size
    val k = 30
    val df = scala.util.Random.shuffle(heavy ++ noise).toDF("item").repartition(8)
    val got = df.agg(GraftFunctions.heavy_hitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k)
    val exact = (heavy ++ noise).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val threshold = n.toDouble / (k + 1)
    exact.filter(_._2 > threshold).keys.foreach { item =>
      assert(got.contains(item), s"heavy item $item (count ${exact(item)}) missing")
    }
    got.foreach { case (item, est) =>
      assert(est <= exact(item), s"$item overcounted: $est > ${exact(item)}")
      assert(est >= exact(item) - threshold.toLong - 1,
        s"$item undercounted beyond bound: $est vs ${exact(item)}")
    }
  }

  test("Count-Min: est ≥ true always; exact when a row's bucket is collision-free") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    val depth = 4
    val width = 256
    // deterministic skewed stream across 8 partitions (merge exercised)
    val items = (0 until 40).flatMap(i => Seq.fill((40 - i) * 3)(s"tok$i"))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // the same md5-prefix bucket family the q96 pairing uses
    def bucketCol(term: org.apache.spark.sql.Column, i: Int) =
      conv(substring(md5(concat(term, lit("#" + i))), 1, 8), 16, 10)
        .cast("long") % width
    val df = items.toDF("term").repartition(8)
    val sk = df
      .select(array((0 until depth).map(i => bucketCol(col("term"), i)): _*).as("bux"))
      .agg(GraftFunctions.count_min_build(col("bux"), depth, width).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sk.length == depth * width)
    // total mass per sketch row = stream length (no item ever dropped)
    (0 until depth).foreach { i =>
      assert(sk.slice(i * width, (i + 1) * width).sum == items.size.toLong)
    }
    // replay the bucket math on the driver (java md5 = Spark md5)
    def bucket(term: String, i: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$term#$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % width).toInt
    }
    val distinct = exact.keys.toSeq
    distinct.foreach { t =>
      val est = (0 until depth).map(i => sk(i * width + bucket(t, i))).min
      assert(est >= exact(t), s"$t underestimated: $est < ${exact(t)}")
      // a row where no OTHER distinct item shares the bucket gives the
      // exact count; est = min over rows, so exactness follows
      val collisionFree = (0 until depth).exists(i =>
        !distinct.exists(u => u != t && bucket(u, i) == bucket(t, i)))
      if (collisionFree)
        assert(est == exact(t), s"$t inexact despite clean row: $est vs ${exact(t)}")
    }
  }

  test("q97 HLL registers estimate within the m=256 error envelope per group") {
    // The query ships the RAW estimate (range corrections need libm ln,
    // which can't cross-engine hash-match); the spec applies the standard
    // small-range linear-counting switch DRIVER-side from the shipped
    // register stats — the full HLL algorithm's accuracy contract.
    val m = 256.0
    val out = graft.queries.RelationalQueries
      .queries("q97_hll_distinct")(spark, sf("sf0.01")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val raw = r.getAs[Double]("hll_est")
      val empty = m - r.getAs[Long]("n_regs")
      val est =
        if (raw < 2.5 * m && empty > 0) m * math.log(m / empty) // linear counting
        else raw
      val exact = r.getAs[Long]("n_exact").toDouble
      // theoretical σ ≈ 1.04/√m ≈ 6.5% raw, tighter for linear counting
      assert(math.abs(est - exact) / exact < 0.20,
        s"${r.get(0)}: corrected $est (raw $raw) vs exact $exact")
    }
  }

  test("sketch aggregates maintain streaming state: windowed Count-Min equals its batch sketch") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val depth = 2
    val width = 64
    def bucketCol(term: org.apache.spark.sql.Column, i: Int) =
      conv(substring(md5(concat(term, lit("#" + i))), 1, 8), 16, 10)
        .cast("long") % width
    // time-ordered so the two triggers never feed data behind the
    // watermark (which would be legitimately dropped, not merged)
    val rows = (0 until 200).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i % 50}%02d"), s"tok${i % 13}"))
      .sortBy(_._1.getTime)
    // streaming: per-10s-window sketches under a watermark — the
    // TypedImperativeAggregate buffer IS the state-store value, so the
    // sketch accumulates incrementally across triggers; append mode
    // emits each window exactly once, when the watermark closes it
    val in = MemoryStream[(java.sql.Timestamp, String)](spark)
    val agg = in.toDF().toDF("ts", "term")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(GraftFunctions.count_min_build(
        array((0 until depth).map(i => bucketCol(col("term"), i)): _*),
        depth, width).as("sk"))
    val q = agg.writeStream.format("memory").queryName("cm_stream")
      .outputMode("append").start()
    try {
      // two in-order triggers: state must carry bucket counts across
      // them; a far-future sentinel then closes every data window
      in.addData(rows.take(120))
      q.processAllAvailable()
      in.addData(rows.drop(120))
      q.processAllAvailable()
      in.addData(Seq((java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "late")))
      q.processAllAvailable()
      val streamed = spark.table("cm_stream")
        .collect().map(r => r.get(0).toString -> r.getSeq[Long](1)).toMap
      val batch = rows.toDF("ts", "term")
        .groupBy(window(col("ts"), "10 seconds"))
        .agg(GraftFunctions.count_min_build(
          array((0 until depth).map(i => bucketCol(col("term"), i)): _*),
          depth, width).as("sk"))
        .collect().map(r => r.get(0).toString -> r.getSeq[Long](1)).toMap
      assert(streamed.keySet == batch.keySet) // sentinel's window stays open
      batch.foreach { case (w, sk) =>
        assert(streamed(w) == sk, s"window $w: streamed sketch != batch sketch")
      }
    } finally q.stop()
  }
}
