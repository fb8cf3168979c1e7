package graft

import org.apache.spark.sql.SparkSession

/** Spot-timer for individual registry queries in the SAME forked-JVM
  * configuration the full [[Bench]] uses (48g heap, local[cpus]) —
  * `sbt console` timings are useless for this (they run inside sbt's
  * 4g JVM and spill). Usage:
  *   sbt "runMain graft.MicroBench <sfDir> <substr[,substr...]> [reps]"
  * Prints one `MICRO <name> repN <sec>` line per rep.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val filters = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // match Bench's session (spot timings must measure the benched
      // config): same cleaner cadence and codegen-cache size — without
      // these, spot reps show Bench-invisible GC storms and codegen
      // cache churn (see Bench's comments for the A/B history)
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_CLEANER_GC", "30s"))
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // spot-experiment override hook: any "k=v;k=v" list lands in the
      // session conf (A/B-ing a conf candidate without a rebuild)
      .config(sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
        .flatMap(_.split(';').toSeq).map(_.split('=')).collect {
          case Array(k, v) => (k, v)
        }.foldLeft(new org.apache.spark.SparkConf()) { case (c, (k, v)) =>
          c.set(k, v)
        })
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // job/stage accounting per rep: at small SF the fixed per-job and
    // per-shuffle overheads dominate, so "how many jobs / stages / tasks
    // did this query launch" is the first diagnostic, not task time
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filters.exists(n.contains))
    // one untimed warmup pass per query at sf0.001 (the Bench
    // discipline): without it rep1 pays codegen compile + JIT ramp and
    // reads 3-30× the steady state, poisoning spot comparisons
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    // bracket with the fixed-work host-speed sentinel (Bench's): this
    // box shows guest-invisible multi-minute contention windows, and a
    // spot timing without the sentinel is uninterpretable during one
    println(f"SENT pre ${Bench.sentinelMedian(spark, 3)}%.3f")
    for (name <- names; rep <- 1 to reps) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(150)
      println(f"MICRO $name rep$rep $sec%.2f jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println(f"SENT post ${Bench.sentinelMedian(spark, 3)}%.3f")
    spark.stop()
  }
}
