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
}
