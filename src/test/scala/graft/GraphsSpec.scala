package graft

import graft.operators.Graphs

/** [[Graphs.integerPageRank]] against a driver-side replay of the exact
  * integer recurrence — the operator's join-aggregate rounds must equal
  * the naive per-node loop digit for digit, on shapes that stress hubs,
  * chains, and asymmetric degrees. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: the same scaled-integer recurrence, sequentially. */
  private def naive(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = edges.groupBy(_._2)
    var pr: Map[String, Long] = outdeg.keys.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      pr = inEdges.view.mapValues { es =>
        val mass = es.map { case (u, _) =>
          pr.getOrElse(u, 0L) / outdeg(u)
        }.sum
        150000L + (85L * mass) / 100L
      }.toMap
    }
    pr
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
