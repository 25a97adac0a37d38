package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.GeoFunctions

/**
 * Grid-DBSCAN density clustering of geocoded points — hotspot detection over
 * the web-mercator tile grid (the "dense urban H3 buckets" of the north_star,
 * turned from a skew LIABILITY handled by salting into a first-class ANALYSIS:
 * which contiguous regions of the world does a crawl's geocoded output
 * concentrate in?).
 *
 * Algorithm (grid-density variant of DBSCAN, the standard published
 * formulation for massive point sets):
 *   1. snap every point to its zoom-`zoom` tile and count per tile — ONE
 *      map-side-combinable aggregation, the only pass over the raw points;
 *   2. tiles with `n_points >= minPts` are DENSE (core cells);
 *   3. dense tiles that touch (8-neighborhood, wrapping across the
 *      antimeridian in x) are connected — the edge set is built by exploding
 *      each dense tile to its 8 neighbor keys and semi-joining back against
 *      the dense set, so candidate generation is O(dense x 8), never
 *      all-pairs;
 *   4. clusters are connected components of that adjacency
 *      ([[Dedup.connectedComponents]] — min-label propagation, O(diameter)
 *      lean rounds); dense tiles with no dense neighbor are singleton
 *      clusters.
 *
 * Scale shape: the per-point work is stage 1 only; everything after runs on
 * the aggregated dense-tile table, which is bounded by the grid (4^zoom) and
 * in practice by the populated world — millions of rows at zoom 10-12, not
 * billions. Cluster ids are min tile key of the component: deterministic
 * regardless of partitioning, round count, or input order.
 *
 * Output: one row per dense tile — (tile_x, tile_y, n_points, cluster_id,
 * cluster_size = dense tiles in the cluster, cluster_points).
 */
object Hotspots {

  /** Cluster `points` (columns `lon`, `lat` in degrees) at tile zoom `zoom`
    * with density threshold `minPts`. */
  def cluster(points: DataFrame, zoom: Int, minPts: Long,
              maxIter: Int = 64): DataFrame =
    clusterImpl(points, zoom, minPts, edges =>
      // pointerJump: the dense-tile adjacency is a grid lattice whose
      // components are chains/blobs with diameter O(cluster span) — the
      // jump turns O(diameter) min-label rounds into O(log diameter)
      Dedup.connectedComponents(edges, "ka", "kb", maxIter,
        pointerJump = true))

  /** [[cluster]] with checkpoint-resumable component labelling: each
    * min-label round flows through Checkpoint.stage, so a killed
    * continent-scale clustering resumes from the last finished round
    * (see Dedup.connectedComponentsResumable for the round-budget
    * semantics and the loud under-budget failure). */
  def clusterResumable(spark: org.apache.spark.sql.SparkSession,
                       points: DataFrame, zoom: Int, minPts: Long,
                       ckptDir: String, inputFingerprint: String,
                       rounds: Int = 8): DataFrame =
    clusterImpl(points, zoom, minPts, edges =>
      Dedup.connectedComponentsResumable(spark, edges, ckptDir,
        inputFingerprint, rounds, aCol = "ka", bCol = "kb"))

  private def clusterImpl(points: DataFrame, zoom: Int, minPts: Long,
                          components: DataFrame => DataFrame): DataFrame = {
    require(zoom >= 1 && zoom <= 20, s"zoom out of range: $zoom")
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val n = 1L << zoom

    val dense = points
      .select(GeoFunctions.tileX(col("lon"), lit(zoom)).as("tile_x"),
        GeoFunctions.tileY(col("lat"), lit(zoom)).as("tile_y"))
      .groupBy("tile_x", "tile_y").agg(count(lit(1)).as("n_points"))
      .filter(col("n_points") >= minPts)
      .withColumn("key", col("tile_x") * n + col("tile_y"))
      .persist()
    dense.count() // materialize once; reused by edges (twice), labels, stats

    // 8-neighborhood adjacency among dense tiles: x wraps mod 2^zoom
    // (antimeridian), y clamps (no wrap across the poles)
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val nbrs = dense
      .select(col("key").as("src"), col("tile_x"), col("tile_y"),
        explode(array(offsets: _*)).as("o"))
      .select(col("src"),
        (pmod(col("tile_x") + col("o.dx") + n, lit(n)) * n +
          (col("tile_y") + col("o.dy"))).as("dst"),
        (col("tile_y") + col("o.dy")).as("ny"))
      .filter(col("ny") >= 0 && col("ny") < n)
    val edges = nbrs
      .join(dense.select(col("key").as("dst")), Seq("dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src").as("ka"), col("dst").as("kb"))

    val cc = components(edges).withColumnRenamed("doc_id", "key")
    // singleton dense tiles (no dense neighbor) label themselves
    val labeled = dense.join(cc, Seq("key"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("key")))
    val stats = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"), sum("n_points").as("cluster_points"))
    labeled.join(stats, "cluster_id")
      .select(col("tile_x"), col("tile_y"), col("n_points"),
        col("cluster_id"), col("cluster_size"), col("cluster_points"))
  }
}
