package graft.tools

import graft.operators.TickOps
import graft.util.SparkUtil

/** Ad-hoc timing/plan probe: runMain graft.tools.Probe <what> [sfDir].
  * what = query name from SparkEntry.queries, "multi_exact",
  * "multi_fast", "union_exact", or "explain:<query>". */
object Probe {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkUtil.newLocalSession("probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def ticks = SparkUtil.events(spark, dir)
      .selectExpr("event_type AS symbol", "value AS price", "ts AS event_time")
    def time(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $what rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    what match {
      case "multi_exact" =>
        time(TickOps.slidingStatsMulti(ticks, TickOps.defaultWindows, exact = true).count())
      case "multi_fast" =>
        time(TickOps.slidingStatsMulti(ticks, TickOps.defaultWindows, exact = false).count())
      case "union_exact" =>
        time(TickOps.movingStatsUnion(ticks, TickOps.defaultWindows, exact = true).count())
      case "sqlfns" =>
        graft.GraftExtensions.register(spark)
        SparkUtil.table(spark, dir, "documents").createOrReplaceTempView("docs")
        val r = spark.sql(
          """SELECT count(DISTINCT rolling_fingerprint(text)) AS fps,
            |       count(DISTINCT simhash64(split(text, '\\s+'))) AS shs,
            |       min(sig_overlap(minhash_from_tokens(split(text, '\\s+'), 3, 16),
            |                       minhash_from_tokens(split(text, '\\s+'), 3, 16))) AS self_overlap
            |FROM docs""".stripMargin).collect().head
        println(s"PROBE sqlfns fingerprints=${r.getLong(0)} simhashes=${r.getLong(1)} self_overlap=${r.getDouble(2)}")
      case "mh_stages" =>
        import org.apache.spark.sql.functions._
        val docs = SparkUtil.table(spark, dir, "documents")
        val t0 = System.nanoTime()
        val withSig = docs
          .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("toks"))
          .select(col("doc_id"), graft.operators.Dedup.shingles("toks", 2).as("sh"))
          .filter(size(col("sh")) > 0)
          .withColumn("sig", graft.operators.Dedup.minhashSignature("sh", 32))
        println(s"PROBE sig_rows=${withSig.count()} t=${(System.nanoTime() - t0) / 1e9}")
        val t1 = System.nanoTime()
        val banded = withSig.select(col("doc_id"), col("sig"),
          posexplode(expr(
            "transform(sequence(0, 15), b -> xxhash64(array_join(slice(sig, b * 2 + 1, 2), ',')))"))
            .as(Seq("band", "band_hash")))
        val aa = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
        val bb = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
        val raw = aa.join(bb, Seq("band", "band_hash")).filter(col("id_a") < col("id_b"))
        println(s"PROBE raw_pairs=${raw.count()} t=${(System.nanoTime() - t1) / 1e9}")
        val t2 = System.nanoTime()
        val cand = raw.filter(graft.functions.GraftFunctions.sig_overlap(col("sig_a"), col("sig_b")) >= 0.1)
          .select(col("id_a"), col("id_b")).distinct()
        println(s"PROBE candidates=${cand.count()} t=${(System.nanoTime() - t2) / 1e9}")
        val t3 = System.nanoTime()
        val n = graft.operators.Dedup.ngramJaccard(cand, docs, "doc_id", "text", 2)
          .filter(col("jaccard") >= 0.2).count()
        println(s"PROBE final=$n t=${(System.nanoTime() - t3) / 1e9}")
      case "recall" =>
        // measured recall of the three LSH queries vs exact ground truth,
        // with the exact driver-query parameters (q27/q31/q32)
        import org.apache.spark.sql.functions._
        import graft.functions.GraftFunctions
        val docs = SparkUtil.table(spark, dir, "documents")
        val emb = SparkUtil.table(spark, dir, "embeddings")

        val sh = docs.select(col("doc_id"),
          GraftFunctions.shingle_hashes(graft.operators.TextOps.tokens(col("text")), 2).as("sh"))
        val truth27 = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
          .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            GraftFunctions.jaccard_sorted(col("sh_a"), col("sh_b")).as("j"))
          .filter(col("j") >= 0.2)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got27 = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text",
          k = 2, numHashes = 32, bands = 16, threshold = 0.2)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"PROBE q27 truth=${truth27.size} got=${got27.size} " +
          s"outside_truth=${(got27 diff truth27).size} " +
          s"recall=${(got27 intersect truth27).size.toDouble / truth27.size}")

        val q = emb.filter(col("vec_id") < 5)
        val brute = graft.operators.Similarity.bruteForceTopK(
          emb, "vec_id", "embedding", q, "vec_id", "embedding", 10)
          .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val lsh = graft.operators.Similarity.lshTopK(
          emb, "vec_id", "embedding", q, "vec_id", "embedding", 10, planes = 6)
          .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"PROBE q31 truth=${brute.size} got=${lsh.size} " +
          s"recall=${(brute intersect lsh).size.toDouble / brute.size}")

        val ivf = graft.operators.Similarity.ivfTopK(
          emb, "vec_id", "embedding", q, "vec_id", "embedding", 10,
          nlist = 16, nprobe = 4)
          .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"PROBE q40 truth=${brute.size} got=${ivf.size} " +
          s"recall=${(brute intersect ivf).size.toDouble / brute.size}")

        val truth32 = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
          .crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b")))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            GraftFunctions.cosine_similarity(col("v_a"), col("v_b")).as("c"))
          .filter(col("c") >= 0.4)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got32 = graft.operators.Dedup.embeddingNearDups(
          emb, "vec_id", "embedding", planes = 4, threshold = 0.4, tables = 3)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"PROBE q32 truth=${truth32.size} got=${got32.size} " +
          s"outside_truth=${(got32 diff truth32).size} " +
          s"recall=${(got32 intersect truth32).size.toDouble / truth32.size}")
      case "all" =>
        // run every query with a stderr name marker so codegen-fallback
        // ERROR lines (log4j → stderr) attribute to the query that made them
        graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
          System.err.println(s"### PROBE-QUERY $name")
          System.err.flush()
          try graft.SparkEntry.queries(name)(spark, dir).count()
          catch { case e: Throwable =>
            System.err.println(s"### PROBE-FAIL $name ${e.getClass.getName}")
          }
        }
      case w if w.startsWith("x3:") =>
        // three timed runs in one JVM — shows warm-cache / post-codegen cost
        val name = w.stripPrefix("x3:")
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = graft.SparkEntry.queries(name)(spark, dir).count()
          println(f"PROBE $name rep$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case w if w.startsWith("explain:") =>
        val q = graft.SparkEntry.queries(w.stripPrefix("explain:"))(spark, dir)
        println(q.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case q =>
        time(graft.SparkEntry.queries(q)(spark, dir).count())
    }
    spark.stop()
  }
}
