package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond the dedup clustering family
  * ([[Dedup.duplicateClusters]] / `duplicateClustersStars`): ranking
  * iterations expressed as join + aggregate rounds.
  *
  * Everything here is INTEGER arithmetic by design — a float PageRank sums
  * contributions in shuffle order and can never reproduce bit-for-bit
  * across partitionings or engines, while scaled-integer mass passing is
  * exact: the same rounds produce the same digits on 32 threads, 1000
  * executors, or unrolled as SQL CTEs (the q99 oracle).
  */
object Graphs {

  /** Fixed-iteration PageRank with damping d = 0.85 in scaled integer
    * arithmetic over a directed edge list (`src`, `dst` string columns).
    *
    * Recurrence (all int64): pr₀ = 10⁶ per node;
    * prᵢ₊₁(v) = 150000 + (85 · Σ_{(u,v)∈E} (prᵢ(u) div outdeg(u))) div 100.
    * The recurrence holds for EVERY source node, including one with no
    * in-edges: its pr is the 150000 damping floor from round 1 on (the
    * per-round left join below pins that — without it a source-only node
    * would silently contribute 0 from round 2, ADVICE r5). Nodes are the
    * edge sources (callers wanting sink nodes ranked must add reverse or
    * self edges — the q99 interaction graph adds both directions, which
    * also removes dangling-mass loss).
    *
    * Scale shape: out-degrees join once and the joined edge table is
    * localCheckpointed — each round is then ONE hash join on `src` + ONE
    * aggregate on `dst` (plus a node-table left join, |V| rows) shuffling
    * |E| rows; driver holds nothing.
    * Headroom: total mass N·10⁶ times 85 stays in int64 past 10¹¹ nodes.
    * Output: (node, pr) for every node with an incoming edge. */
  def integerPageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // deg is checkpointed too (|V| rows — tiny): without it, `wd` and
    // `srcNodes` each re-evaluate the CALLER'S edge plan, which for the
    // real link-graph queries (q193/q198) is the whole markup
    // extraction chain — measured 3× the extraction cost per ranking
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val wd = edges.join(deg, "src").localCheckpoint(true)
    val srcNodes = deg.select(col("src").as("node"))
    // prFull covers every SOURCE node each round, so round i+1 always
    // sees a contribution from every node with out-edges; `out` is the
    // in-edge-node view the operator returns
    var prFull = srcNodes.withColumn("pr", lit(1000000L))
    var out = prFull
    (1 to iters).foreach { _ =>
      out = wd.join(prFull, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr div outdeg")).as("mass"))
        .select(col("dst").as("node"),
          expr("150000L + (85 * mass) div 100").as("pr"))
      prFull = srcNodes.join(out, Seq("node"), "left")
        .select(col("node"), coalesce(col("pr"), lit(150000L)).as("pr"))
    }
    out
  }

  /** [[integerPageRank]] with WEIGHTED edges (VERDICT r16 item 3): a
    * node's mass splits across its out-edges proportionally to
    * `weightCol` instead of uniformly — on a domain link graph whose
    * edges carry `n_links`, a site that links to a partner 100 times
    * and a footer target once should not rank them equally; crawl
    * prioritization weights by link mass.
    *
    * Recurrence (all int64, same div discipline as the unweighted
    * form): prᵢ₊₁(v) = 150000 + (85 · Σ_{(u,v,w)∈E} ((prᵢ(u) · w) div
    * Σw(u))) div 100 — the per-edge product BEFORE the floor division,
    * so a weight-10 edge carries exactly 10× a weight-1 edge's
    * pre-division mass (dividing first would floor each share
    * separately and lose the ratio on small pr). Uniform weights
    * reproduce [[integerPageRank]] exactly: (pr·1) div outdeg ≡
    * pr div outdeg (pinned in GraphsSpec).
    *
    * Same scale shape: weights join once (one aggregate + one join,
    * localCheckpointed), then each round is one hash join + one
    * aggregate shuffling |E| rows. Int64 headroom: the per-edge
    * product pr·w needs total-mass × max-weight < 2⁶³ — with node
    * mass ~10⁶·N that is N·max_w < ~9·10¹², comfortable for domain
    * graphs (10⁹ domains × 10³ max link mass) though tighter than the
    * unweighted form's 10¹¹-node bound; callers with pathological
    * weights should pre-cap them (a 10⁶-link edge IS spam). Weights
    * must be positive integers — a zero-weight edge would still
    * create the node but pass no mass (drop such edges upstream). */
  def integerWeightedPageRank(
      edges: DataFrame,
      weightCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // checkpointed for the same reason as integerPageRank's deg
    val wsum = edges.groupBy(col("src"))
      .agg(sum(col(weightCol)).as("wsum"))
      .localCheckpoint(true)
    val wd = edges.join(wsum, "src").localCheckpoint(true)
    val srcNodes = wsum.select(col("src").as("node"))
    var prFull = srcNodes.withColumn("pr", lit(1000000L))
    var out = prFull
    (1 to iters).foreach { _ =>
      out = wd.join(prFull, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr(s"(pr * $weightCol) div wsum")).as("mass"))
        .select(col("dst").as("node"),
          expr("150000L + (85 * mass) div 100").as("pr"))
      prFull = srcNodes.join(out, Seq("node"), "left")
        .select(col("node"), coalesce(col("pr"), lit(150000L)).as("pr"))
    }
    out
  }
}
