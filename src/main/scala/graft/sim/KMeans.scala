package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Distributed Lloyd k-means over embedding vectors — the trainer behind
 * IVF coarse quantizers and cluster-balanced corpus sampling. Every
 * arithmetic step is exact scaled-integer math (the SemDeDup fixed-point
 * representation), so the full iteration history — assignments, centroid
 * means, distances — is deterministic and an external engine replays it
 * bit-for-bit (emb_kmeans).
 *
 * Scale shape: one fixed-point conversion pass, persisted; each Lloyd
 * round is a MAP-ONLY assignment (the k centroids ride the plan as array
 * literals scored by a codegen longSqDist shim — no join, no shuffle on
 * the corpus side) followed by ONE combinable (cluster, pos)-keyed
 * aggregation producing k x dim rows. Driver state is the k x dim
 * centroid matrix — the same bounded-collect role as the IVF trainer's
 * centroid means. At 1000 executors each round is one pass over the
 * corpus with map-side partials; nothing scales with n except the scan.
 *
 * Determinism: init = the k smallest-id vectors; centroid update is the
 * exact floored integer mean (`(ss - pmod(ss, n)) div n`); assignment
 * breaks distance ties toward the smaller cluster id; empty clusters
 * carry their previous centroid.
 */
object KMeans {

  /** Fixed-point scale, shared with [[SemDedup.Scale]]. */
  val Scale: Long = SemDedup.Scale

  /**
   * @return the final assignment under the post-`rounds` centroids:
   *         (vec_id: long, cluster: int, dist_scaled: long — exact squared
   *         L2 in fixed-point units)
   */
  def kmeans(emb: DataFrame, idCol: Column, vecCol: Column,
             k: Int = 8, rounds: Int = 3): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sv = emb.select(idCol.cast("long").as("id"),
        TextFunctions.scaleLongs(vecCol, lit(Scale.toDouble)).as("sv"))
      .persist()
    var cents: Vector[Array[Long]] = sv.orderBy("id").limit(k).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Long](1).toArray).toVector
    require(cents.size == k, s"need at least $k vectors, got ${cents.size}")
    for (_ <- 1 to rounds) {
      val upd = assign(sv, cents)
        .select(col("cluster"), posexplode(col("sv")).as(Seq("pos", "s")))
        .groupBy("cluster", "pos")
        .agg(sum("s").as("ss"), count(lit(1)).as("n"))
        // exact floored integer mean (remainder removed first, so div is
        // exact and floor-vs-trunc can't diverge — the SemDeDup idiom)
        .select(col("cluster"), col("pos"),
          expr("(ss - pmod(ss, n)) div n").as("cs"))
        .collect()
      val next = Array.tabulate(k)(i => cents(i).clone())
      upd.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      cents = next.toVector
    }
    assign(sv, cents).select(col("id").as("vec_id"),
      col("cluster"), col("dist").as("dist_scaled"))
  }

  /** Map-only assignment: k literal-centroid distance columns (codegen
    * longSqDist), argmin via least-of-structs with id tiebreak. */
  private def assign(sv: DataFrame, cents: Vector[Array[Long]]): DataFrame = {
    val withD = cents.zipWithIndex.foldLeft(sv) { case (df, (c, i)) =>
      df.withColumn(s"__d$i",
        TextFunctions.longSqDist(col("sv"), typedLit(c.toSeq)))
    }
    val best = least(cents.indices.map(i =>
      struct(col(s"__d$i").as("d"), lit(i).as("k"))): _*)
    withD.select(col("id"), col("sv"),
      best.getField("k").as("cluster"), best.getField("d").as("dist"))
  }
}
