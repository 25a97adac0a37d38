package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for web-crawl corpora — the link-based quality
 * signals (PageRank-family centrality) a training-data pipeline computes
 * over the host/URL graph before sampling. The reference geocodes pages
 * fetched by URL (every provider in /root/reference/src builds requests
 * from URLs) but has no corpus-level view; this is the corpus-level
 * operator family.
 *
 * All arithmetic is FIXED-POINT (scaled longs with explicit integral
 * division) rather than floating point: a distributed sum of doubles is
 * summation-order-dependent, so two runs (or two engines) of the same
 * float PageRank disagree in the low bits, while the scaled-integer plan
 * is bit-reproducible anywhere — the property that lets the DuckDB oracle
 * replay every iteration exactly, and lets a 1000-executor run be
 * verified against a single-node one.
 */
object LinkGraph {

  /** Fixed-point scale: ranks are stored as rank * 1e12. */
  val Scale = 1000000000000L

  /**
   * PageRank over an edge list, `iters` synchronous iterations.
   *
   * Scale shape: each iteration is (a) one equi-join of the edge list with
   * the current rank vector on `src` — co-partitioned after the first
   * iteration, so AQE reuses the exchange — and (b) one combinable LONG-sum
   * aggregation on `dst`. Per-iteration shuffle carries only (dst, long):
   * narrow rows, map-side partial sums absorb hot dst keys (the skew story
   * for nodes with millions of in-links). No driver-side state: the node
   * count joins in as a broadcast 1-row aggregate, never a collect.
   *
   * Dangling nodes (no out-edges) leak their mass — the standard simplified
   * formulation; deterministic either way because the arithmetic is exact.
   *
   * @param edges      (src: long, dst: long) — duplicates are collapsed
   * @param iters      number of synchronous iterations (plan depth grows
   *                   linearly; checkpoint between iterations at crawl scale
   *                   like Dedup's label propagation)
   * @param dampingPct damping factor in percent (85 = the classic 0.85)
   * @return (node: long, rank_scaled: long) — rank * [[Scale]]
   */
  def pageRank(edges: DataFrame, iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // cache hygiene mirrors Dedup.connectedComponents: the base tables are
    // referenced by every unrolled iteration (Catalyst shares no subtrees),
    // so persist them and each round's rank vector, materialize the new
    // round fully before releasing its predecessor, and return a persisted
    // output with every intermediate unpersisted.
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct().persist()
    val nDf = broadcast(nodes.agg(count(lit(1)).as("__n")))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    val base = expr(s"CAST(${100 - dampingPct} AS BIGINT) * $Scale div (100 * __n)")
    var ranks = nodes.crossJoin(nDf)
      .select(col("v"), expr(s"CAST($Scale AS BIGINT) div __n").as("r"))
      .persist()
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("v"))
        .join(outdeg, "src")
        .select(col("dst").as("v"),
          expr(s"(r * $dampingPct) div (outdeg * 100)").as("c"))
        .groupBy("v").agg(sum(col("c")).as("s"))
      val next = nodes.crossJoin(nDf)
        .join(contrib, Seq("v"), "left")
        .select(col("v"), (base + coalesce(col("s"), lit(0L))).as("r"))
        .persist()
      next.count() // materialize every partition before releasing the parent
      ranks.unpersist()
      ranks = next
    }
    val out = ranks.select(col("v").as("node"), col("r").as("rank_scaled"))
      .persist()
    out.count()
    ranks.unpersist(); e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    out
  }
}
