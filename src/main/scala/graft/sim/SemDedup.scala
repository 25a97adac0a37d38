package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Semantic-dedup representative selection (the SemDeDup shape: cluster the
 * embedding space, keep one representative per cluster, count how many
 * members sit within a closeness threshold of the consensus direction).
 *
 * Bit-determinism at any cluster size is the design constraint: float
 * vector means are order-sensitive, so every cross-row sum here runs over
 * SCALED INTEGERS — elements are fixed-pointed to round(x·10^6) longs, the
 * per-dimension centroid is an exact floored integer mean (the division is
 * exact by construction: `(ss − pmod(ss, n)) div n`), and dots/norms are
 * exact long sums (headroom: |element| ≤ ~2·10^6 scaled × dim 4096 still
 * clears 2^63). The ONLY float step is the final fixed-order
 * `dot / (sqrt(na)·sqrt(nc))` chain from exact longs, rounded to 6
 * decimals — an external engine replays it bit-for-bit.
 *
 * Scale shape: posexplode fans each vector into (id, pos, elem) rows —
 * narrow, combinable, and the standard crawl-scale layout for elementwise
 * math. Centroids are ONE (label, pos) aggregation (map-side partials
 * absorb big clusters); member scores are one equi-join on (label, pos)
 * plus ONE (label, id) aggregation; no collect_list, no per-group state
 * proportional to cluster size, cosine is scale-invariant so the mean
 * (not the overflow-prone raw sum) carries the consensus direction.
 */
object SemDedup {

  /** Fixed-point scale for embedding elements (1e6 ≈ float32's ~7
    * significant digits; raise only with the overflow bound above). */
  val Scale = 1000000L

  /**
   * One row per cluster label: member count, the representative (highest
   * cosine to the cluster centroid, ties to the smallest id — the member
   * SemDeDup keeps), its cosine, and how many members are within
   * `closeThreshold` of the centroid (the prune candidates).
   *
   * @return (label, n_members, rep_id, rep_cos6, n_close)
   */
  def representatives(emb: DataFrame, idCol: Column, labelCol: Column,
                      vecCol: Column, closeThreshold: Double = 0.8): DataFrame = {
    val ex = emb
      .select(idCol.as("id"), labelCol.as("lab"),
        posexplode(vecCol).as(Seq("pos", "e")))
      .select(col("id"), col("lab"), col("pos"),
        expr(s"CAST(round(CAST(e AS DOUBLE) * $Scale) AS BIGINT)").as("s"))
    val cent = ex.groupBy("lab", "pos")
      .agg(sum(col("s")).as("ss"), count(lit(1)).as("n"))
      // exact floored integer mean: subtract the positive remainder first,
      // so the division has no remainder and floor-vs-trunc can't diverge
      .select(col("lab"), col("pos"),
        expr("(ss - pmod(ss, n)) div n").as("cs"))
    val per = ex.join(cent, Seq("lab", "pos"))
      .groupBy("lab", "id")
      .agg(sum(expr("s * cs")).as("dot"), sum(expr("s * s")).as("na"),
        sum(expr("cs * cs")).as("nc"))
    val cos = per.select(col("lab"), col("id"),
      when(col("na") === 0 || col("nc") === 0, lit(-2.0))
        .otherwise(round(col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nc").cast("double"))),
          6)).as("cos6"))
    cos.groupBy("lab").agg(
        count(lit(1)).as("n_members"),
        min(struct((-col("cos6")).as("negcos"), col("id").as("i"))).as("t"),
        sum(when(col("cos6") >= closeThreshold, 1L).otherwise(0L))
          .as("n_close"))
      .select(col("lab").as("label"), col("n_members"),
        col("t.i").as("rep_id"), (-col("t.negcos")).as("rep_cos6"),
        col("n_close"))
  }
}
