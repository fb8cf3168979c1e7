package graft

import graft.operators.Graphs

/** [[Graphs.integerPageRank]] against a driver-side replay of the exact
  * integer recurrence — the operator's join-aggregate rounds must equal
  * the naive per-node loop digit for digit, on shapes that stress hubs,
  * chains, and asymmetric degrees. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: the same scaled-integer recurrence, sequentially.
    * `prAll` stays total over source nodes — one with no in-edges holds
    * the 150000 damping floor from round 1 on, never 0 (the divergence
    * ADVICE r5 flagged as untested). Returns the in-edge-node view the
    * operator returns. */
  private def naive(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = edges.groupBy(_._2)
    var prAll: Map[String, Long] = outdeg.keys.map(_ -> 1000000L).toMap
    var out: Map[String, Long] = prAll
    (1 to iters).foreach { _ =>
      out = inEdges.view.mapValues { es =>
        val mass = es.map { case (u, _) =>
          prAll(u) / outdeg(u)
        }.sum
        150000L + (85L * mass) / 100L
      }.toMap
      prAll = outdeg.keys.map(u => u -> out.getOrElse(u, 150000L)).toMap
    }
    out
  }

  test("integerPageRank equals the sequential recurrence on a hub-and-chain graph") {
    // star hub (everything cites h), a chain, and a bidirected pair —
    // distinct in/out degree mixes; all nodes have out-edges so the
    // driver replay's pr lookups stay total
    val edges = Seq(
      "a" -> "h", "b" -> "h", "c" -> "h", "h" -> "a",
      "a" -> "b", "b" -> "c", "c" -> "a",
      "x" -> "y", "y" -> "x")
    (1 to 4).foreach { iters =>
      val got = Graphs.integerPageRank(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === naive(edges, iters), s"iters=$iters")
    }
  }

  test("integerPageRank: a source-only node contributes the damping floor every round") {
    // "s" has out-edges but no in-edges: after round 1 its pr is the
    // 150000 floor, and rounds 2+ must keep feeding s's floor mass into
    // "a" — not drop s from the pr table and feed 0 (ADVICE r5)
    val edges = Seq("s" -> "a", "a" -> "b", "b" -> "a")
    (1 to 3).foreach { iters =>
      val got = Graphs.integerPageRank(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === naive(edges, iters), s"iters=$iters")
    }
    // round 2, node a: mass = pr₁(s)/1 + pr₁(b)/1 where pr₁(s) = 150000
    // (the floor), pr₁(b) = 150000 + 85·1000000/100 = 1000000
    // → pr₂(a) = 150000 + 85·1150000/100 = 1127500
    val two = Graphs.integerPageRank(edges.toDF("src", "dst"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two("a") == 1127500L,
      "source-only node s must contribute its 150000 floor in round 2")
  }

  test("integerPageRank: mass stays bounded and hub ranks highest") {
    val edges = (1 to 50).flatMap(i => Seq(s"n$i" -> "hub", "hub" -> s"n$i"))
    val pr = Graphs.integerPageRank(edges.toDF("src", "dst"), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("hub") == pr.values.max)
    // no node exceeds total initial mass (damping only dissipates)
    assert(pr.values.forall(_ <= 51L * 1000000L))
    assert(pr.values.forall(_ >= 150000L))
  }

  test("integerPageRank rejects a non-positive iteration count") {
    intercept[IllegalArgumentException] {
      Graphs.integerPageRank(Seq("a" -> "b").toDF("src", "dst"), 0)
    }
  }

  test("integerWeightedPageRank: uniform weights reproduce the unweighted form exactly") {
    val edges = Seq(
      ("s", "a"), ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"))
    (1 to 3).foreach { iters =>
      val unweighted = Graphs.integerPageRank(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val uniform = Graphs.integerWeightedPageRank(
        edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        "w", iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(uniform === unweighted, s"iters=$iters")
      // and uniform weight K != 1 too: (pr·K) div (outdeg·K) can differ
      // from pr div outdeg only by flooring — here both divide exactly
      // the same ratio, so the results must still agree
      val uniformK = Graphs.integerWeightedPageRank(
        edges.map { case (s, d) => (s, d, 7L) }.toDF("src", "dst", "w"),
        "w", iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(uniformK === unweighted, s"iters=$iters, w=7")
    }
  }

  test("integerWeightedPageRank: mass follows the heavier edge") {
    // hub splits 9:1 between a and b; both a and b return all mass to
    // hub, so after round 1 a holds 9x b's hub share
    val edges = Seq(
      ("hub", "a", 9L), ("hub", "b", 1L),
      ("a", "hub", 1L), ("b", "hub", 1L))
    val pr = Graphs.integerWeightedPageRank(
      edges.toDF("src", "dst", "w"), "w", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pr1(a) = 150000 + 85·(10⁶·9 div 10) div 100 = 150000 + 765000
    assert(pr("a") == 915000L, s"got $pr")
    // pr1(b) = 150000 + 85·(10⁶·1 div 10) div 100 = 150000 + 85000
    assert(pr("b") == 235000L, s"got $pr")
    // hub gets both return edges' full mass: 150000 + 85·(10⁶+10⁶)/100
    assert(pr("hub") == 1850000L, s"got $pr")
  }

  test("integerWeightedPageRank: per-edge product precedes the division") {
    // w=15 and w=2 over wsum=17 (10⁶ mod 17 = 9, so the remainder times
    // the weight crosses wsum): product-first gives (10⁶·15) div 17 =
    // 882352; dividing first ((10⁶ div 17)·15 = 882345) floors each
    // share before scaling — pin the product-first spelling by value
    val pr = Graphs.integerWeightedPageRank(
      Seq(("s", "a", 15L), ("s", "b", 2L)).toDF("src", "dst", "w"), "w", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("a") == 150000L + (85L * (15000000L / 17)) / 100, s"got $pr")
    assert(pr("b") == 150000L + (85L * (2000000L / 17)) / 100, s"got $pr")
    assert((85L * (15000000L / 17)) / 100 !=
      (85L * ((1000000L / 17) * 15)) / 100,
      "fixture must actually distinguish product-first from divide-first")
  }
}
