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
  /** Fixed-point scale for HITS: hub/authority mass is stored as
    * score * 1e6. Smaller than [[Scale]] on purpose: HITS re-normalizes
    * every half-step with `raw * HitsScale div total`, and the headroom
    * bound is max_degree * HitsScale^2 < 2^63 — 1e6 supports degrees to
    * ~9e6 (a crawl-graph supernode); shrink it, don't grow it. */
  val HitsScale = 1000000L

  /** Cut the SQL lineage of an already-persisted iteration vector: each
    * iterative step references its input more than once (HITS: L1 total +
    * join; PageRank: contrib join), so carrying the logical plan forward
    * grows it GEOMETRICALLY — persist() materializes data but does NOT
    * truncate the plan, and past a few iterations per-job plan
    * serialization (SparkPlanInfo on every job event) dominates
    * wall-clock. Re-entering the vector as a LogicalRDD leaf keeps the
    * plan O(1) per iteration; the RDD underneath keeps its own lineage,
    * so fault tolerance is unchanged (the same role GraphX/GraphFrames
    * assign to periodic checkpoints). */
  private def cut(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /**
   * HITS hubs & authorities over an edge list, `iters` synchronous
   * iterations, in the same fixed-point arithmetic as [[pageRank]] so every
   * iteration is bit-reproducible at any cluster size and an external
   * engine can replay the whole chain.
   *
   * Each iteration is two half-steps, each ONE equi-join of the edge list
   * with the current vector plus one combinable long-sum on the opposite
   * endpoint — narrow (node, long) shuffle rows, map-side partials
   * absorbing hot endpoints — followed by L1 normalization against a
   * broadcast 1-row total (never a collect). L1 (not the classic L2) keeps
   * the arithmetic integral: same fixed points up to scaling, and exact.
   *
   * @param edges (src: long, dst: long) — duplicates collapsed
   * @return (node: long, auth_scaled: long, hub_scaled: long); nodes with
   *         no in-links carry auth 0, no out-links hub 0
   */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct().persist()
    // un-normalized classic init: hub_0 = 1 (scaled) everywhere
    var hubsCached = nodes.select(col("v"), lit(HitsScale).as("h")).persist()
    hubsCached.count()
    var hubs = cut(hubsCached)
    var authsCached: DataFrame = null
    var auths: DataFrame = null
    // NOTE (r6 optimization pass): zero-omitted intermediates + a lazily
    // persisted contribution table + one materialization per iteration were
    // all tried here and MEASURED SLOWER on the contract graph (2.07 s ->
    // 2.39-2.41 s warm) despite halving summed task time — the per-step
    // broadcast/cache machinery outweighs the saved node-rebase joins at
    // this vector size. hitsResumable keeps the slimmed shape, where it
    // measures faster (6.5 s -> ~4.4-5.1 s). Kept as the original.
    def l1Normalize(raw: DataFrame, c: String): DataFrame = {
      val tot = broadcast(raw.agg(sum(col(c)).as("__t")))
      nodes.join(raw, Seq("v"), "left").crossJoin(tot)
        .select(col("v"),
          expr(s"coalesce($c, CAST(0 AS BIGINT)) * $HitsScale div __t").as(c))
    }
    for (_ <- 1 to iters) {
      val authNext = l1Normalize(
        e.join(hubs, e("src") === hubs("v"))
          .groupBy(col("dst").as("v")).agg(sum(col("h")).as("a")), "a")
        .persist()
      authNext.count()
      if (authsCached != null) authsCached.unpersist()
      authsCached = authNext
      auths = cut(authNext)
      val hubNext = l1Normalize(
        e.join(auths, e("dst") === auths("v"))
          .groupBy(col("src").as("v")).agg(sum(col("a")).as("h")), "h")
        .persist()
      hubNext.count()
      hubsCached.unpersist()
      hubsCached = hubNext
      hubs = cut(hubNext)
    }
    val out = auths.join(hubs, Seq("v"))
      .select(col("v").as("node"), col("a").as("auth_scaled"),
        col("h").as("hub_scaled")).persist()
    out.count()
    authsCached.unpersist(); hubsCached.unpersist()
    e.unpersist(); nodes.unpersist()
    out
  }

  /**
   * Anchor-text consolidation — the classic link-based relevance signal:
   * for every link TARGET, aggregate what the web calls it. Training-data
   * pipelines use the result both as a quality feature (inlink count,
   * source-host diversity) and as retrieval text for the target page.
   *
   * Scale shape: one hash aggregation on (dst, anchor) — map-side partials
   * absorb the hot (supernode target, boilerplate anchor) pairs — then a
   * combinable per-dst rollup: the top anchor travels as min(struct(-n,
   * anchor)) (largest count, ties to the lexicographically smallest
   * anchor — deterministic, unlike max_by under ties), and the distinct
   * anchor list is collected from the ALREADY-aggregated per-anchor rows,
   * bounded by the per-target anchor vocabulary (cap it upstream for
   * adversarial targets). Source-host diversity is its own distinct
   * aggregation, joined back.
   *
   * @return (dst, n_inlinks, n_src_hosts, n_anchors, top_anchor,
   *          top_anchor_n, anchors: sorted distinct array)
   */
  def anchorStats(links: DataFrame, dstCol: Column, anchorCol: Column,
                  srcHostCol: Column): DataFrame = {
    val base = links.select(dstCol.as("dst"), anchorCol.as("anchor"),
      srcHostCol.as("src_host"))
    val perAnchor = base.groupBy("dst", "anchor").agg(count(lit(1)).as("n"))
    val rolled = perAnchor.groupBy("dst").agg(
      sum(col("n")).as("n_inlinks"),
      count(lit(1)).as("n_anchors"),
      min(struct((-col("n")).as("negn"), col("anchor").as("a"))).as("t"),
      sort_array(collect_list(col("anchor"))).as("anchors"))
    val hosts = base.select(col("dst"), col("src_host")).distinct()
      .groupBy("dst").agg(count(lit(1)).as("n_src_hosts"))
    rolled.join(hosts, Seq("dst"))
      .select(col("dst"), col("n_inlinks"), col("n_src_hosts"),
        col("n_anchors"), col("t.a").as("top_anchor"),
        (-col("t.negn")).as("top_anchor_n"), col("anchors"))
  }

  /**
   * Checkpoint-integrated PageRank: identical fixed-point arithmetic to
   * [[pageRank]] (bit-equal output), but the rank vector flows through
   * [[graft.engine.Iterate.resumable]] — materialized to
   * `<ckptDir>/pagerank_i<k>` parquet every `every` iterations with
   * per-partition lineage, so a killed crawl-scale run resumes from the
   * last completed block instead of iteration 0 (lineage rows carry
   * `resumed=true` for every block served from disk). The parquet leaf at
   * each block boundary also cuts the plan, subsuming [[cut]].
   *
   * @param inputFingerprint identifies the edge input (e.g. its source
   *                         path + snapshot); a checkpoint written for a
   *                         different input or damping recomputes instead
   *                         of silently resuming stale ranks
   */
  def pageRankResumable(spark: org.apache.spark.sql.SparkSession,
                        edges: DataFrame, iters: Int, ckptDir: String,
                        inputFingerprint: String, dampingPct: Int = 85,
                        every: Int = 1): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct().persist()
    val nDf = broadcast(nodes.agg(count(lit(1)).as("__n")))
    // same slimmed per-iteration shape as [[pageRank]]: out-degree folded
    // onto the edge list once, per-node base row unioned into the single
    // combinable aggregation (bit-equal arithmetic, one join + one exchange
    // per round)
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val base = expr(s"CAST(${100 - dampingPct} AS BIGINT) * $Scale div (100 * __n)")
    val baseRows = nodes.crossJoin(nDf)
      .select(col("v"), lit(0L).as("c"), col("__n")).persist()
    val fp = s"pagerank|d$dampingPct|$inputFingerprint"
    val out = graft.engine.Iterate.resumable(
        spark, ckptDir, "pagerank", fp, iters, every) {
      nodes.crossJoin(nDf)
        .select(col("v"), expr(s"CAST($Scale AS BIGINT) div __n").as("r"))
    } { (ranks, _) =>
      val contrib = ew.join(ranks, ew("src") === ranks("v"))
        .select(col("dst").as("v"),
          expr(s"(r * $dampingPct) div (outdeg * 100)").as("c"),
          lit(null).cast("long").as("__n"))
      contrib.unionByName(baseRows)
        .groupBy("v").agg(sum(col("c")).as("s"), max(col("__n")).as("__n"))
        .select(col("v"), (base + col("s")).as("r"))
    }
    e.unpersist(); nodes.unpersist(); ew.unpersist(); baseRows.unpersist()
    out.select(col("v").as("node"), col("r").as("rank_scaled"))
  }

  /**
   * Checkpoint-integrated HITS: identical fixed-point arithmetic to
   * [[hits]] (bit-equal output), with the (auth, hub) state vector flowing
   * through [[graft.engine.Iterate.resumable]] — materialized to
   * `<ckptDir>/hits_i<k>` parquet every `every` iterations with
   * per-partition lineage, so a killed crawl-scale run resumes from the
   * last completed iteration block instead of iteration 0. The parquet
   * leaf at each block boundary also cuts the plan (subsuming [[cut]]).
   *
   * State after iteration i is ONE narrow DataFrame (v, a, h) — both
   * half-step vectors together, so a block boundary is always a FULL
   * iteration (auth and hub consistent); the i=0 state is the classic
   * un-normalized init (a=0, h=[[HitsScale]]).
   */
  def hitsResumable(spark: org.apache.spark.sql.SparkSession,
                    edges: DataFrame, iters: Int, ckptDir: String,
                    inputFingerprint: String, every: Int = 1): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct().persist()
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // zero-omitted intermediate normalization (see [[hits]]): a 0-valued
    // node is equivalent to an absent one in both the next edge join and
    // the L1 total, so the per-half-step node rebase is deferred to the
    // block-state projection below
    def l1Normalize(raw0: DataFrame, c: String): DataFrame = {
      // persist the twice-read contribution table (see [[hits]])
      val raw = raw0.persist()
      scratch += raw
      val tot = broadcast(raw.agg(sum(col(c)).as("__t")))
      raw.crossJoin(tot)
        .select(col("v"), expr(s"$c * $HitsScale div __t").as(c))
    }
    val fp = s"hits|$inputFingerprint"
    val out = graft.engine.Iterate.resumable(
        spark, ckptDir, "hits", fp, iters, every) {
      nodes.select(col("v"), lit(0L).as("a"), lit(HitsScale).as("h"))
    } { (state, _) =>
      val hubs = state.select(col("v"), col("h"))
      val auths = l1Normalize(
        e.join(hubs, e("src") === hubs("v"))
          .groupBy(col("dst").as("v")).agg(sum(col("h")).as("a")), "a")
      val hubsNext = l1Normalize(
        e.join(auths, e("dst") === auths("v"))
          .groupBy(col("src").as("v")).agg(sum(col("a")).as("h")), "h")
      // block state stays the FULL (v, a, h) vector — absent means exactly 0
      nodes.join(auths, Seq("v"), "left").join(hubsNext, Seq("v"), "left")
        .select(col("v"), coalesce(col("a"), lit(0L)).as("a"),
          coalesce(col("h"), lit(0L)).as("h"))
    }
    scratch.foreach(_.unpersist())
    e.unpersist(); nodes.unpersist()
    out.select(col("v").as("node"), col("a").as("auth_scaled"),
      col("h").as("hub_scaled"))
  }

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
    // out-degree folded onto the edge list ONCE: each iteration then needs a
    // single equi-join (edges x ranks) instead of re-joining the degree
    // table every round — one exchange/broadcast-build fewer per iteration
    // at any scale, same rows, bit-identical arithmetic.
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val base = expr(s"CAST(${100 - dampingPct} AS BIGINT) * $Scale div (100 * __n)")
    // per-node base row carried as a 0-contribution into the SAME
    // aggregation (union, not a per-round left join): every node emits
    // base + sum of its in-contributions from ONE combinable long-sum —
    // integer addition is order-insensitive, so the result is bit-equal to
    // the join/coalesce formulation it replaces.
    val baseRows = nodes.crossJoin(nDf)
      .select(col("v"), lit(0L).as("c"), col("__n")).persist()
    var ranksCached = nodes.crossJoin(nDf)
      .select(col("v"), expr(s"CAST($Scale AS BIGINT) div __n").as("r"))
      .persist()
    ranksCached.count()
    var ranks = cut(ranksCached)
    for (_ <- 1 to iters) {
      val contrib = ew.join(ranks, ew("src") === ranks("v"))
        .select(col("dst").as("v"),
          expr(s"(r * $dampingPct) div (outdeg * 100)").as("c"),
          lit(null).cast("long").as("__n"))
      val next = contrib.unionByName(baseRows)
        .groupBy("v").agg(sum(col("c")).as("s"), max(col("__n")).as("__n"))
        .select(col("v"), (base + col("s")).as("r"))
        .persist()
      next.count() // materialize every partition before releasing the parent
      ranksCached.unpersist()
      ranksCached = next
      ranks = cut(next)
    }
    val out = ranks.select(col("v").as("node"), col("r").as("rank_scaled"))
      .persist()
    out.count()
    ranksCached.unpersist(); e.unpersist(); nodes.unpersist(); ew.unpersist()
    baseRows.unpersist()
    out
  }

  /**
   * TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank with
   * teleportation restricted to a TRUSTED seed set — the classic web-spam
   * demotion signal a training-data pipeline computes before sampling a
   * crawl. Pages reachable from the trusted core in few hops keep mass;
   * spam farms (well-interlinked but unreferenced by trusted hosts) get
   * none, however high their plain PageRank.
   *
   * Identical fixed-point arithmetic and scale shape to [[pageRank]]
   * (narrow (node, long) per-iteration shuffles, map-side partials on hot
   * dst keys, O(1) plan via [[cut]], no driver-side state), with the
   * teleport term landing ONLY on seed nodes:
   *
   *   r_0(v)     = [v in S] * Scale div |S|
   *   r_{i+1}(v) = [v in S] * (100-d) * Scale div (100 * |S|)
   *                + sum_{u->v} (r_i(u) * d) div (outdeg(u) * 100)
   *
   * Seeds outside the edge list's node set are ignored (they could receive
   * no links and pass no mass). All quantities stay non-negative longs, so
   * the integral `div` chain is bit-reproducible across engines and
   * cluster sizes — the same property that lets DuckDB replay [[pageRank]].
   *
   * @param edges (src: long, dst: long) — duplicates collapsed
   * @param seeds one `node: long` column — the trusted set
   * @return (node: long, trust_scaled: long) — trust * [[Scale]]
   */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
    // seed flag pinned onto the node vector once; |S| as a broadcast 1-row
    // aggregate, never a collect
    val flagged = nodes.join(
        seeds.select(col("node").as("v")).distinct()
          .withColumn("is_seed", lit(1)),
        Seq("v"), "left")
      .select(col("v"), coalesce(col("is_seed"), lit(0)).as("is_seed"))
      .persist()
    flagged.count()
    val nsDf = broadcast(flagged.agg(
      sum(col("is_seed")).cast("long").as("__ns")))
    // out-degree folded onto the edge list once + per-node teleport row
    // carried into the SAME per-round aggregation — one equi-join and one
    // combinable long-sum per iteration (see pageRank for the equivalence
    // argument; the teleport term here is the seed-gated base).
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val base = expr(
      s"CAST(is_seed AS BIGINT) * ${100 - dampingPct} * $Scale div (100 * __ns)")
    val baseRows = flagged.crossJoin(nsDf)
      .select(col("v"), lit(0L).as("c"), base.as("__b")).persist()
    var ranksCached = flagged.crossJoin(nsDf)
      .select(col("v"),
        expr(s"CAST(is_seed AS BIGINT) * $Scale div __ns").as("r"))
      .persist()
    ranksCached.count()
    var ranks = cut(ranksCached)
    for (_ <- 1 to iters) {
      val contrib = ew.join(ranks, ew("src") === ranks("v"))
        .select(col("dst").as("v"),
          expr(s"(r * $dampingPct) div (outdeg * 100)").as("c"),
          lit(null).cast("long").as("__b"))
      val next = contrib.unionByName(baseRows)
        .groupBy("v").agg(sum(col("c")).as("s"), max(col("__b")).as("__b"))
        .select(col("v"), (col("__b") + col("s")).as("r"))
        .persist()
      next.count()
      ranksCached.unpersist()
      ranksCached = next
      ranks = cut(next)
    }
    val out = ranks.select(col("v").as("node"), col("r").as("trust_scaled"))
      .persist()
    out.count()
    ranksCached.unpersist(); e.unpersist(); flagged.unpersist()
    ew.unpersist(); baseRows.unpersist()
    out
  }

  /**
   * Relative spam mass (the TrustRank paper's detection metric): the
   * fraction of a node's PageRank NOT accounted for by trust,
   * `(pr - trust) / pr`, in parts-per-million fixed point, clamped at 0
   * (trusted seeds can carry more teleport mass than plain PageRank gives
   * them). High spam mass + high PageRank = the classic link-farm
   * signature a corpus curation pass down-weights.
   *
   * One equi-join of the two rank vectors (both keyed and already
   * partitioned on `node`); the deficit is clamped BEFORE the division so
   * every operand stays non-negative — the domain where Spark's `div`
   * (truncate toward zero) and an external engine's floor division agree —
   * and the oracle replays it exactly.
   */
  def spamMass(pageRanks: DataFrame, trustRanks: DataFrame): DataFrame =
    pageRanks.join(trustRanks, Seq("node"))
      .select(col("node"), col("rank_scaled"), col("trust_scaled"),
        expr("(greatest(CAST(0 AS BIGINT), rank_scaled - trust_scaled)" +
          " * 1000000) div rank_scaled")
          .as("spam_mass_ppm"))

  /**
   * Synchronous label-propagation community detection (Raghavan et al.
   * 2007, made deterministic): over the UNDIRECTED link graph, every node
   * starts labelled with itself and each round adopts the most frequent
   * label among its neighbours, ties to the SMALLEST label — the
   * deterministic tie-break that makes the fixed round count
   * bit-reproducible on any cluster (classic LPA's random tie-break and
   * vertex order are not). Communities = same-label groups after `iters`
   * rounds; the host-cluster / mirror-farm grouping signal of a crawl
   * corpus, distinct from connected components (which merge everything
   * touching) and from PageRank (value propagation).
   *
   * Scale shape per round: ONE equi-join of the undirected edge list with
   * the current label vector on the neighbour key, one combinable
   * (node, label) count, and one combinable per-node argmax — the
   * min(struct(-n, label)) trick, no window, no sort. Narrow (node, long)
   * shuffles throughout; per-round persist + [[cut]] keeps the plan O(1).
   *
   * @param edges (src: long, dst: long) — direction ignored, self-loops
   *              dropped, duplicates collapsed
   * @return (node: long, label: long) — label is some member node id
   */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().persist()
    // Round 1 in closed form — BIT-IDENTICAL to propagating the identity
    // labelling: with labels(v) = v and `und` DISTINCT, every neighbour
    // contributes its own id exactly once, so all (node, label) counts are
    // 1 and the min-tie-break argmax degenerates to min(neighbour). One
    // combinable agg replaces the identity-label build (distinct + persist
    // + count) AND round 1's join + two-level aggregation.
    var labelsCached = und.groupBy(col("src").as("v"))
      .agg(min(col("dst")).as("label")).persist()
    labelsCached.count()
    var labels = cut(labelsCached)
    for (_ <- 2 to iters) {
      val next = und.join(labels, und("dst") === labels("v"))
        .groupBy(und("src"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("src"))
        .agg(min(struct((-col("n")).as("negn"), col("label").as("l"))).as("t"))
        .select(col("src").as("v"), col("t.l").as("label"))
        .persist()
      next.count()
      labelsCached.unpersist()
      labelsCached = next
      labels = cut(next)
    }
    val out = labels.select(col("v").as("node"), col("label")).persist()
    out.count()
    labelsCached.unpersist(); und.unpersist()
    out
  }

  /**
   * Co-citation similarity (Small 1973, the link-graph analogue of
   * "documents cited together are related"): for every pair of link
   * TARGETS, how many distinct pages link to both. `coCitation(reverse
   * (edges))` is bibliographic coupling (shared out-links — the mirror /
   * template-farm signal). Ordered canonically `a < b`.
   *
   * Scale shape: the pair fan-out of a source with out-degree d is d², so
   * sources above `maxOutdeg` are EXCLUDED up front (the standard
   * supernode containment — a directory page linking to 10^5 targets
   * asserts almost nothing about any pair) and the drop is loggable from
   * the returned plan's other side; the self-join is an equi-join on the
   * source key over the capped edge list, then one combinable count on
   * (a, b).
   *
   * @param edges (src: long, dst: long) — duplicates collapsed
   * @return (a: long, b: long, cocite: long), a < b
   */
  def coCitation(edges: DataFrame, maxOutdeg: Int = 64): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val od = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val kept = e.join(od.filter(col("outdeg") <= maxOutdeg), "src")
      .select(col("src"), col("dst")).persist()
    val out = kept.as("x").join(kept.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .groupBy(col("x.dst").as("a"), col("y.dst").as("b"))
      .agg(count(lit(1)).as("cocite"))
    out.persist().count()
    kept.unpersist()
    out
  }

  /**
   * Crawl-frontier expansion: layered BFS over the link graph from a seed
   * set, labelling every reachable node with its MINIMUM hop distance
   * (≤ `maxHops`). This is the frontier-scheduling primitive of a crawler —
   * "what is newly discoverable k fetch rounds out from the seed list" —
   * and the third distinct iterative-graph shape next to PageRank
   * (value propagation) and connected components (label convergence).
   *
   * Scale shape: each round is ONE equi-join of the edge list with the
   * CURRENT frontier only (not the whole visited set) on `src`, one
   * distinct on the narrow (node) column, and one left_anti join against
   * visited — all hash-partitioned on the node key, so AQE reuses the
   * exchange across rounds. Frontier rows carry a single long: at crawl
   * scale the per-round shuffle is proportional to the NEW layer, not the
   * graph. Early-exits when a layer comes back empty (the fixpoint), so
   * `maxHops` is a budget, not a forced cost. Per-round persist + plan cut
   * ([[cut]]) keeps the logical plan O(1) in rounds, same as the other
   * iterative operators.
   *
   * @param edges   (src: long, dst: long) — duplicates collapsed
   * @param seeds   one `node: long` column; hop 0
   * @param maxHops BFS depth budget (>= 0)
   * @return (node: long, hop: int) — min hop from any seed, seeds at 0
   */
  def crawlFrontier(edges: DataFrame, seeds: DataFrame,
                    maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val seedLayer = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0).as("hop")).persist()
    seedLayer.count()
    // visited = lazy union of the per-hop PERSISTED layers: each hop's only
    // job is the new layer's materialization (was two — the visited union
    // was re-materialized per round, a full copy of the whole visited set
    // per hop at crawl scale); the anti-join reads the cached layers.
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame](seedLayer)
    var visited = cut(seedLayer)
    var frontier = visited
    var hop = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val layer = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("hop"))
        .persist()
      if (layer.count() == 0L) {
        exhausted = true
        layer.unpersist()
      } else {
        layers += layer
        val l = cut(layer)
        visited = visited.unionByName(l)
        frontier = l
      }
    }
    val out = visited.persist()
    out.count()
    layers.foreach(_.unpersist())
    e.unpersist()
    out
  }

  /**
   * Cost-weighted link distance from a seed set — synchronous Bellman-Ford
   * relaxation over `edges` (src, dst, w): after `maxRounds` rounds the
   * result is EXACTLY min-cost over walks of at most `maxRounds` edges from
   * any seed (the Bellman-Ford invariant), so when `maxRounds` >= the
   * weighted-shortest-path hop diameter it is the true SSSP. The weighted
   * sibling of [[crawlFrontier]] (hop counts) — crawl scheduling weights
   * link hops by politeness/priority cost rather than counting them.
   *
   * Scale shape: parallel edges collapse to their cheapest ONCE up front;
   * each round is ONE equi-join of the edge table against the distance
   * vector plus ONE combinable min-agg over narrow (node, long) rows —
   * map-side partials absorb supernode fan-in — and the vector re-enters
   * the plan as a LogicalRDD leaf (O(1) plan per round, the iterative-op
   * discipline). The self-union keeps distances monotone, so rounds past
   * convergence are no-ops, never oscillation.
   */
  def linkDistance(edges: DataFrame, seeds: DataFrame,
                   maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0, got $maxRounds")
    val e = edges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(min("w").as("w")).persist()
    var distCached = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist")).persist()
    distCached.count()
    var dist = cut(distCached)
    var r = 0
    while (r < maxRounds) {
      r += 1
      val relaxed = e.join(dist, e("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("cand"))
      val nextCached = dist.select(col("node"), col("dist").as("cand"))
        .unionByName(relaxed)
        .groupBy("node").agg(min("cand").as("dist")).persist()
      nextCached.count()
      distCached.unpersist()
      distCached = nextCached
      dist = cut(nextCached)
    }
    val out = dist.persist()
    out.count()
    distCached.unpersist(); e.unpersist()
    out
  }

  /**
   * Triangle count + local clustering coefficient per node, over the
   * UNDIRECTED simple graph induced by `edges` (self-loops dropped,
   * direction and duplicates collapsed).
   *
   * Scale shape — the skew story is the whole point of this operator. A
   * naive wedge enumeration (`adj ⋈ adj` on the shared endpoint) explodes
   * quadratically at supernodes: a host with 10^6 in-links generates 10^12
   * wedge rows. Instead every edge is ORIENTED from its lower endpoint to
   * its higher endpoint in the (degree, id) total order, and wedges are
   * enumerated only at the LOW end (the "compact-forward" / degree-ordered
   * algorithm): each node's oriented out-degree is O(sqrt(m)), so the wedge
   * join emits O(m^{3/2}) rows TOTAL regardless of skew — the supernode
   * never pairs its neighbors, its low-degree neighbors each pair it with
   * their few other higher-order neighbors. Three shuffles end to end
   * (degree agg, wedge self-join on the apex, closing equi-join on the
   * wedge pair), all on narrow (long, long) rows; per-node counts come back
   * as one combinable sum. Everything downstream of the joins is exact
   * integer arithmetic, so the result is bit-reproducible at any
   * parallelism.
   *
   * @param edges (src: long, dst: long) — any direction, dups/self-loops ok
   * @return (node, degree, triangles, clustering_ppm) where clustering_ppm
   *         = floor(2 * triangles * 1e6 / (degree * (degree - 1))), 0 for
   *         degree <= 1 — the local clustering coefficient in parts per
   *         million (exact integral division; no IEEE in the contract)
   */
  def triangles(edges: DataFrame): DataFrame = {
    // canonical undirected simple edges: u < v
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .persist()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient each edge from the (degree, id)-smaller endpoint to the larger;
    // both degree lookups are equi-joins on the edge endpoints (narrow rows)
    val du = deg.select(col("node").as("u"), col("degree").as("du"))
    val dv = deg.select(col("node").as("v"), col("degree").as("dv"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("lo"), col("v").as("hi")))
          .otherwise(struct(col("v").as("lo"), col("u").as("hi")))
          .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
      .persist()
    // wedges at the low apex: every unordered pair of oriented out-neighbors,
    // emitted once with (b, c) in the same (degree, id) orientation order so
    // the closing join probes the oriented edge set directly
    val w1 = oriented.select(col("lo").as("apex"), col("hi").as("b"))
    val w2 = oriented.select(col("lo").as("apex"), col("hi").as("c"))
    val wedges = w1.join(w2, "apex").filter(col("b") < col("c"))
    // a wedge (apex; b, c) closes iff the oriented edge b->c or c->b exists;
    // membership via an inner join on the canonical (min, max) key
    val closing = oriented.select(
      least(col("lo"), col("hi")).as("b"),
      greatest(col("lo"), col("hi")).as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
      .select(col("apex"), col("b"), col("c"))
    val corners = tris.select(col("apex").as("node"))
      .unionAll(tris.select(col("b").as("node")))
      .unionAll(tris.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val out = deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering_ppm",
        when(col("degree") > 1,
          expr("(2 * triangles * 1000000) div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
    out.persist().count()
    oriented.unpersist(); und.unpersist()
    out
  }

  /**
   * Degree-distribution histogram over the undirected simple graph: one row
   * per occupied log2 bucket (bucket k holds degrees in [2^k, 2^{k+1})),
   * with exact node counts and integral ppm shares — the standard first
   * look at whether a crawl graph is power-law and where its supernode
   * tail sits, and the input to choosing broadcast/salting thresholds.
   *
   * Scale shape: one degree aggregation (same as [[triangles]]) plus one
   * 64-bucket aggregation — the second shuffle carries at most 64 rows per
   * map partition. The log2 bucket is computed as bit-length minus one
   * (`length(bin(degree)) - 1`), pure integer, replayable anywhere.
   */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val total = deg.select(count(lit(1)).as("n_total"))
    deg.select((length(bin(col("degree"))) - 1).cast("long").as("bucket"),
        col("degree"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_nodes"),
        min(col("degree")).as("min_degree"),
        max(col("degree")).as("max_degree"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(n_nodes * 1000000) div n_total"))
      .select(col("bucket"), col("n_nodes"), col("min_degree"),
        col("max_degree"), col("share_ppm"))
  }

  /**
   * Page-level link graph → HOST-level graph, the rollup behind host-level
   * PageRank/TrustRank and crawl-budget allocation: every (src_page,
   * dst_page) edge maps through the page→host table and aggregates to
   * (src_host, dst_host) with a link count and the distinct linking-page
   * count; `intra_host` flags self-host edges (usually dropped before
   * centrality, kept here so the caller decides).
   *
   * Scale shape: two hash joins keyed on page id (the natural partitioning
   * of both inputs) followed by ONE aggregation keyed on the host pair —
   * map-side partials absorb the head (most links are intra-host or point
   * at a few hub hosts). The distinct-src count rides the same shuffle via
   * Spark's Expand, not a second job.
   */
  def hostGraph(edges: DataFrame, pages: DataFrame): DataFrame = {
    val sh = pages.select(col("page_id").as("src"), col("host").as("src_host"))
    val dh = pages.select(col("page_id").as("dst"), col("host").as("dst_host"))
    edges.join(sh, "src").join(dh, "dst")
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("src")).as("n_src_pages"))
      .withColumn("intra_host", col("src_host") === col("dst_host"))
  }

  /**
   * Redirect-chain resolution by POINTER DOUBLING: each round composes the
   * partial walk with itself (`f ← f∘f`), so a chain of length L resolves in
   * ⌈log₂ L⌉ rounds instead of L — the difference between 4 and 10^4 passes
   * over a crawl-scale redirect table with deep chains. A source whose walk
   * never reaches a terminal (a node that is not itself a redirect source)
   * within `doublings` rounds — a cycle, or a chain deeper than
   * 2^doublings — surfaces as status `unresolved` with NULL target/hops
   * rather than a silently wrong answer.
   *
   * Scale shape: per round ONE self equi-join of the state table on the
   * current-target key plus a plan cut (LogicalRDD re-entry, the same O(1)
   * plan idiom as [[pageRank]]); the final terminal check is a left join
   * against the distinct source set.
   *
   * @param redirects (src, dst) — at most one dst per src (a function)
   * @return (src, final_dst, hops, status) — hops = exact chain length for
   *         resolved rows
   */
  def resolveRedirects(redirects: DataFrame, doublings: Int = 4): DataFrame = {
    require(doublings >= 1 && doublings <= 20,
      s"doublings must be in [1,20], got $doublings")
    var st = cut(redirects.select(col("src"), col("dst").as("cur"),
      lit(1L).as("hops"))).persist()
    st.count()
    for (_ <- 1 to doublings) {
      val g = st.select(col("src").as("g_src"), col("cur").as("g_cur"),
        col("hops").as("g_hops"))
      val next = cut(st.join(g, st("cur") === g("g_src"), "left")
        .select(col("src"),
          coalesce(col("g_cur"), col("cur")).as("cur"),
          (col("hops") + coalesce(col("g_hops"), lit(0L))).as("hops")))
        .persist()
      next.count(); st.unpersist(); st = next
    }
    val srcs = redirects.select(col("src").as("cur")).distinct()
      .withColumn("is_src", lit(true))
    st.join(srcs, Seq("cur"), "left")
      .select(col("src"),
        when(col("is_src").isNull, col("cur")).as("final_dst"),
        when(col("is_src").isNull, col("hops")).as("hops"),
        when(col("is_src").isNotNull, lit("unresolved"))
          .otherwise(lit("resolved")).as("status"))
  }

  /**
   * k-core of the undirected simple graph induced by `edges`: the maximal
   * subgraph in which every node has degree >= k, computed by synchronous
   * iterative peeling (delete all nodes with degree < k, recompute, repeat
   * to a fixed point). The k-core is the standard "remove the crawl fringe"
   * signal — link farms and boilerplate nav pages live in the low-core
   * shells, the genuinely interlinked content survives.
   *
   * Scale shape: each peel round is ONE job — a degree aggregation over the
   * live edge list (combinable long count, narrow (node, long) shuffle rows
   * — map-side partials absorb supernodes) feeding two anti-joins that
   * remove the dropped endpoints, with the fixed-point test riding the
   * next-edge-list count (see the in-body proof). The dropped set shrinks
   * geometrically after the first round, so AQE broadcasts it; round one
   * (where most of a web graph dies) stays a shuffle anti-join on narrow
   * keys. The live edge list is re-entered as a LogicalRDD each round
   * ([[cut]]) so the plan stays O(1) in round count — the same discipline
   * as [[pageRank]]. One driver-side scalar per round (the live-edge count,
   * which doubles as the convergence test) — never a collect of node sets.
   *
   * Termination is PROVEN, not assumed: the loop requires a fixed point
   * within `maxRounds` and fails loudly otherwise, so an under-budgeted
   * run can never emit a half-peeled subgraph as if it were the core.
   *
   * @param edges (src: long, dst: long) — any direction, dups/self-loops ok
   * @return (node, core_degree) — the surviving nodes with their degree
   *         INSIDE the k-core (all >= k); empty result if no k-core exists
   */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
    var live = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .persist()
    var liveCount = live.count()
    var round = 0
    var converged = false
    // ONE job per peel round (was two): the dropped-node set is only
    // materialized as a side effect of building the next edge list, and the
    // fixed-point test rides the same count — the edge count is unchanged
    // iff NO node was dropped (every node counted by `degrees` has degree
    // >= 1, so dropping any node removes at least one live edge; and if the
    // drop set is empty both anti-joins pass everything through).
    while (!converged && round < maxRounds) {
      val drop = degrees(live).filter(col("degree") < k)
        .select("node").persist()
      // both anti-joins probe the IDENTICAL broadcast subplan (same
      // canonical form), so ReuseExchange builds the dropped-node broadcast
      // once per round instead of twice
      val next = cut(
        live.join(drop, live("u") === drop("node"), "left_anti")
          .join(drop, live("v") === drop("node"), "left_anti")
          .select("u", "v")).persist()
      val nextCount = next.count()
      drop.unpersist()
      if (nextCount == liveCount) {
        converged = true
        next.unpersist() // identical content; keep the already-warm `live`
      } else {
        live.unpersist()
        live = next
        liveCount = nextCount
        round += 1
      }
    }
    require(converged,
      s"k-core peeling did not reach a fixed point in $maxRounds rounds " +
        s"(k=$k) — raise maxRounds; emitting a half-peeled shell would be " +
        "silently wrong")
    degrees(live).select(col("node"), col("degree").as("core_degree"))
  }
}
