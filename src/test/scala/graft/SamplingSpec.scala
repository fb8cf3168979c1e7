package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def keys = (1L to 10000L).toDF("k")

  test("hashSample: fraction lands near target, 0 keeps none, 256 keeps all") {
    val n = Sampling.hashSample(keys, col("k"), 64).count()
    // 64/256 = 25% ± binomial noise on 10k draws
    assert(n > 2200 && n < 2800, s"25% sample of 10k gave $n")
    assert(Sampling.hashSample(keys, col("k"), 0).count() == 0)
    assert(Sampling.hashSample(keys, col("k"), 256).count() == 10000)
  }

  test("sampling decisions are per-row: invariant under repartitioning") {
    val a = Sampling.hashSample(keys, col("k"), 32).as[Long].collect().sorted
    val b = Sampling.hashSample(keys.repartition(13), col("k"), 32)
      .as[Long].collect().sorted
    assert(a.sameElements(b), "sample membership changed with partition layout")
  }

  test("stratifiedHashSample: per-stratum fractions and default") {
    val df = (1L to 6000L).map(k => (k, Seq("x", "y", "z")((k % 3).toInt)))
      .toDF("k", "s")
    val out = Sampling.stratifiedHashSample(df, col("k"), col("s"),
      Map("x" -> 256, "y" -> 0), default = 64)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("x") == 2000)          // keep-all stratum: every row kept
    assert(!out.contains("y"))        // zero stratum: dropped entirely
    assert(out("z") > 380 && out("z") < 620, s"25% of 2000 gave ${out.get("z")}")
  }

  test("stratified threshold for 256 sorts above every hex bucket") {
    // threshold(256) must not render "100", which would sort BELOW "ff"
    // in the 2-char comparison and silently keep nothing
    assert(Sampling.threshold(256) > "ff")
    assert(Sampling.threshold(255) == "ff" && Sampling.threshold(0) == "00")
  }

  test("splitAssign: complete, disjoint, deterministic split with ~requested rates") {
    import spark.implicits._
    val df = (0L until 4096L).map(Tuple1(_)).toDF("k")
    val out = Sampling.splitAssign(df, col("k"), val256 = 16, test256 = 16)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 4096L) // total preserved, splits disjoint
    // 16/256 = 6.25% each; allow generous slack on 4096 keys
    assert(out("val") > 150 && out("val") < 400, s"val=${out.get("val")}")
    assert(out("test") > 150 && out("test") < 400, s"test=${out.get("test")}")
    // repartitioned rerun deals identical splits
    val again = Sampling.splitAssign(df.repartition(13), col("k"), 16, 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = Sampling.splitAssign(df, col("k"), 16, 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
  }

  test("shuffleRank: offsets derive from the data plan, never a driver-built table") {
    // pre-round-6 the bucket counts collected to the driver and the
    // offsets parallelized back as a second RDD leaf; the distributed
    // fold leaves nothing driver-sided in the plan
    val df = (1L to 5000L).map(i => (s"d$i", i)).toDF("k", "v")
    val leaves = Sampling.shuffleRank(df, col("k"))
      .queryExecution.analyzed.collectLeaves()
    val rddIds = leaves.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(rddIds.isEmpty,
      s"driver-built side table leaked into the plan: RDD ids $rddIds")
  }

  test("shuffleRank: contiguous 1..n global rank in md5 order, layout-invariant") {
    import spark.implicits._
    val df = (0L until 3000L).map(Tuple1(_)).toDF("k")
    val ranked = Sampling.shuffleRank(df, col("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ranked.map(_._2).sorted.toSeq == (1L to 3000L)) // contiguous, no gaps
    // matches a reference sort by the same key
    val expected = (0L until 3000L)
      .sortBy(k => org.apache.commons.codec.digest.DigestUtils.md5Hex(k.toString) + k.toString)
      .zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(ranked.toMap == expected)
    // different input layout → identical ranks
    val scrambled = Sampling.shuffleRank(df.repartition(17), col("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scrambled == expected)
  }

  test("weightedHashSample: rate tracks weight, keep-sets nest, extremes behave") {
    import spark.implicits._
    val df = (1L to 4000L).toDF("k")
    def kept(w: Double): Set[Long] =
      Sampling.weightedHashSample(df, col("k"), lit(w))
        .collect().map(_.getLong(0)).toSet
    assert(kept(0.0).isEmpty)
    assert(kept(-1.0).isEmpty, "negative weight clamps to keep-none")
    val full = kept(2.0) // clamps to 65535/65536 — keep-(almost)-all
    assert(full.size >= 3990)
    val lo = kept(0.3); val hi = kept(0.7)
    assert(math.abs(lo.size / 4000.0 - 0.3) < 0.03)
    assert(math.abs(hi.size / 4000.0 - 0.7) < 0.03)
    // a doc kept at weight w stays kept at any w' > w (threshold grows)
    assert(lo.subsetOf(hi) && hi.subsetOf(full))
    // per-row weights: each row judged against its own threshold
    val perRow = Sampling.weightedHashSample(
      df.withColumn("w", when(col("k") <= 2000, 0.0).otherwise(1.0)),
      col("k"), col("w")).collect().map(_.getLong(0)).toSet
    assert(perRow.forall(_ > 2000) && perRow.size >= 1990)
  }

  test("groupedShuffleRank: per-group 1..n md5 rank, window-equivalent, null-group safe") {
    import spark.implicits._
    // uneven strata, including a null group value
    val rows = (1L to 800L).map(i => (if (i % 5 == 0) null else s"s${i % 3}", i))
    val df = rows.toDF("g", "k")
    val got = Sampling.groupedShuffleRank(df, Seq("g"), col("k"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getAs[Long]("shuffle_rank"))
      .toMap
    // reference: sort each group by md5(k)+k, rank = position
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(_._2)
        .sortBy(k => org.apache.commons.codec.digest.DigestUtils.md5Hex(k.toString) + k.toString)
        .zipWithIndex.map { case (k, i) => (Option(g), k) -> (i + 1L) }
    }.toMap
    assert(got == expected)
    // contiguous per group (null group included, not dropped)
    val perGroup = got.groupBy(_._1._1).view.mapValues(_.values.toSeq.sorted).toMap
    perGroup.foreach { case (g, ranks) =>
      assert(ranks == (1L to ranks.size).toSeq, s"gaps in group $g")
    }
    // layout-invariant
    val scrambled = Sampling.groupedShuffleRank(df.repartition(13), Seq("g"), col("k"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getAs[Long]("shuffle_rank"))
      .toMap
    assert(scrambled == expected)
  }
}
