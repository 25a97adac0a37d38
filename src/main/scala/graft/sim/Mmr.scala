package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998) —
 * diversified top-k selection over a per-query candidate shortlist: pick
 * greedily, each round scoring every unpicked candidate by
 * `lambda * relevance - (1 - lambda) * max-similarity-to-picked` so near
 * duplicates of an already-selected item lose to fresh material. The
 * training-data verb behind "diverse exemplars per cluster" and redundancy-
 * free retrieval augmentation; the greedy loop is the standard 2-approx.
 *
 * Determinism across engines: relevance and pairwise similarity enter as
 * ppm-scaled BIGINTs (one round() away from the validated cosine chain),
 * lambda as the rational lambdaNum/lambdaDen, so every score is EXACT
 * integer math (`lambdaNum*rel - (lambdaDen-lambdaNum)*pen` — the common
 * denominator cancels in argmax) and every tie breaks to the smallest
 * item_id. No float comparison decides a pick.
 *
 * Scale shape: MMR is inherently sequential in k, so the k-round loop lives
 * in the PLAN, not the driver — per round one anti-join of the (tiny,
 * queries x shortlist) candidate table, one equi-join of the pairwise-sim
 * table against the picked set, and two combinable aggs; per-query work
 * never leaves its hash partition and the corpus is NEVER touched (the
 * caller's shortlist generator — brute/IVF/LSH kNN — did that once).
 * Candidate/pair inputs should be persisted by the caller (they are read
 * k times). Typical k is single-digit; for large k the plan-cut discipline
 * of [[graft.engine.Iterate]] applies.
 *
 * @param candidates (query_id, item_id, rel_ppm) — the per-query shortlist
 * @param pairSims   (query_id, a_id, b_id, sim_ppm) — pairwise candidate
 *                   sims, BOTH directions present for every unordered pair
 * @return (query_id, mmr_rank 1..k, item_id, score_scaled =
 *         lambdaNum*rel_ppm - (lambdaDen-lambdaNum)*max_pen_ppm)
 */
object Mmr {

  def mmrSelect(candidates: DataFrame, pairSims: DataFrame, k: Int,
                lambdaNum: Int = 7, lambdaDen: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda must be a rational in [0,1]: $lambdaNum/$lambdaDen")
    val penW = lambdaDen - lambdaNum
    val ps = pairSims.select(col("query_id"), col("a_id"), col("b_id"),
      col("sim_ppm"))
    // Each round references the running selection THREE times (anti-join,
    // penalty join, union) and Catalyst shares no subtrees, so carrying the
    // raw plan forward re-evaluates every earlier round 2^k-ish times
    // (measured: 27 jobs / 776 tasks for k=4). A lazy localCheckpoint per
    // round re-enters the (queries x rank)-sized selection as a LogicalRDD
    // computed once — plan and work are O(k), fault-tolerance cost is the
    // standard localCheckpoint caveat, acceptable for a driver-bounded
    // selection table.
    def bound(df: DataFrame): DataFrame = df.localCheckpoint(false)
    // round 1: empty picked set, penalty is zero everywhere
    var sel = bound(pick(candidates.withColumn("score_scaled",
      col("rel_ppm") * lambdaNum.toLong), rank = 1))
    var r = 2
    while (r <= k) {
      val remaining = candidates.join(sel.select("query_id", "item_id"),
        Seq("query_id", "item_id"), "left_anti")
      val penalty = ps
        .join(sel.select(col("query_id"), col("item_id").as("b_id")),
          Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id").as("item_id"))
        .agg(max("sim_ppm").as("pen_ppm"))
      val scored = remaining
        .join(penalty, Seq("query_id", "item_id"), "left")
        .withColumn("score_scaled",
          col("rel_ppm") * lambdaNum.toLong -
            coalesce(col("pen_ppm"), lit(0L)) * penW.toLong)
      sel = bound(sel.unionByName(pick(scored, rank = r)))
      r += 1
    }
    sel
  }

  /** Per-query argmax of score_scaled, ties to the SMALLEST item_id (the
    * deterministic min(struct) idiom — no window, no sort). */
  private def pick(scored: DataFrame, rank: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(min(struct((-col("score_scaled")).as("ns"),
        col("item_id").as("id"))).as("m"))
      .select(col("query_id"), lit(rank).as("mmr_rank"),
        col("m.id").as("item_id"), (-col("m.ns")).as("score_scaled"))
}
