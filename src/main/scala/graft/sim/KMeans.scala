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
    val sv = scaled(emb, idCol, vecCol).persist()
    var cents = initCentroids(sv, k)
    for (_ <- 1 to rounds) cents = lloydStep(sv, cents, k)
    assign(sv, cents).select(col("id").as("vec_id"),
      col("cluster"), col("dist").as("dist_scaled"))
  }

  /**
   * Checkpoint-integrated k-means: identical arithmetic to [[kmeans]]
   * (bit-equal output), with the k x dim centroid state flowing through
   * [[graft.engine.Iterate.resumable]] — materialized to
   * `<ckptDir>/kmeans_i<r>` parquet per round with per-partition lineage,
   * so a killed crawl-scale training run resumes from the last completed
   * round instead of round 0. Fully-checkpointed prefixes never re-run the
   * Lloyd pass (the step closure — including its bounded driver collect —
   * is only invoked for rounds past the checkpoint).
   */
  def kmeansResumable(spark: org.apache.spark.sql.SparkSession,
                      emb: DataFrame, idCol: Column, vecCol: Column,
                      k: Int, rounds: Int, ckptDir: String,
                      inputFingerprint: String, every: Int = 1): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sv = scaled(emb, idCol, vecCol).persist()
    val fp = s"kmeans|k$k|$inputFingerprint"
    // driver-side memo of centroid matrices computed THIS run: round i's
    // step re-reads round i-1's state only when that round was served from
    // checkpoint (the resume boundary) — sequentially-computed rounds skip
    // the re-collect of the state they just produced (one fewer job per
    // round; the matrix is k x dim, the same bounded driver state as the
    // collect it replaces)
    val memo = scala.collection.mutable.Map.empty[Int, Vector[Array[Long]]]
    val state = graft.engine.Iterate.resumable(
        spark, ckptDir, "kmeans", fp, rounds, every) {
      val c0 = initCentroids(sv, k)
      memo(0) = c0
      toStateDf(spark, c0)
    } { (st, i) =>
      val next = lloydStep(sv, memo.getOrElse(i - 1, toMatrix(st, k)), k)
      memo(i) = next
      toStateDf(spark, next)
    }
    assign(sv, memo.getOrElse(rounds, toMatrix(state, k)))
      .select(col("id").as("vec_id"),
        col("cluster"), col("dist").as("dist_scaled"))
  }

  private def scaled(emb: DataFrame, idCol: Column, vecCol: Column): DataFrame =
    emb.select(idCol.cast("long").as("id"),
      TextFunctions.scaleLongs(vecCol, lit(Scale.toDouble)).as("sv"))

  /** Deterministic init: the k smallest-id vectors (bounded collect). */
  private def initCentroids(sv: DataFrame, k: Int): Vector[Array[Long]] = {
    val cents = sv.orderBy("id").limit(k).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Long](1).toArray).toVector
    require(cents.size == k, s"need at least $k vectors, got ${cents.size}")
    cents
  }

  /** One Lloyd round: map-only assignment + ONE combinable aggregation;
    * exact floored integer mean (remainder removed first, so div is exact
    * and floor-vs-trunc can't diverge — the SemDeDup idiom); empty
    * clusters carry their previous centroid. */
  private def lloydStep(sv: DataFrame, cents: Vector[Array[Long]],
                        k: Int): Vector[Array[Long]] = {
    val upd = assign(sv, cents)
      .select(col("cluster"), posexplode(col("sv")).as(Seq("pos", "s")))
      .groupBy("cluster", "pos")
      .agg(sum("s").as("ss"), count(lit(1)).as("n"))
      .select(col("cluster"), col("pos"),
        expr("(ss - pmod(ss, n)) div n").as("cs"))
      .collect()
    val next = Array.tabulate(k)(i => cents(i).clone())
    upd.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    next.toVector
  }

  /** The centroid matrix as the (cluster, pos, c) checkpoint state. */
  private def toStateDf(spark: org.apache.spark.sql.SparkSession,
                        cents: Vector[Array[Long]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.flatMap { case (c, ki) =>
      c.zipWithIndex.map { case (v, pos) => (ki, pos, v) }
    }.toDF("cluster", "pos", "c")
  }

  private def toMatrix(state: DataFrame, k: Int): Vector[Array[Long]] = {
    val rows = state.select("cluster", "pos", "c").collect()
    require(rows.nonEmpty, "empty k-means checkpoint state")
    val dim = rows.iterator.map(_.getInt(1)).max + 1
    val m = Array.fill(k)(new Array[Long](dim))
    rows.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    m.toVector
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
