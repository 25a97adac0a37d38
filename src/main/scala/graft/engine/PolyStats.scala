package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Vector-side polygon analytics over the packed-ring layout
 * (`ring_offsets: int[]` start indices into flat `ring_lons`/`ring_lats`
 * arrays — the same representation the reverse-geocode PIP scans,
 * engine/Reverse.scala / geo/Geo.scala).
 *
 * Shoelace signed area and area-weighted centroid, computed as ONE ordered
 * left-to-right fold per row over a precomputed successor-pair array — no
 * groupBy, no cross-row float sums, so the result is bit-deterministic and
 * replayable by any engine that folds in the same order (the DuckDB oracle
 * does exactly that with list_reduce over the same parquet bits). Holes
 * stored with opposite winding subtract from the signed sum naturally.
 *
 * Everything is per-row array expressions inside the scan stage: map-only,
 * no shuffle, no UDF — at a 10^8-polygon gazetteer this runs at scan speed.
 * Per-row cost is O(n_vertices * n_rings) for successor lookup (rings per
 * polygon are small); the bbox min/max are order-insensitive exact.
 */
object PolyStats {

  /** successor index of vertex i under per-ring wrap-around: i+1 unless i+1
    * starts a new ring (or runs off the end), else the start of i's ring. */
  private val NextIdx =
    """(CASE WHEN i + 1 < size(ring_lons)
      |      AND NOT array_contains(ring_offsets, i + 1) THEN i + 1
      |      ELSE array_max(filter(ring_offsets, o -> o <= i)) END)""".stripMargin

  /** sequence(0, -1) DESCENDS in Spark, so the vertex-index range is built
    * non-negative and filtered — an empty polygon folds to the seed (area 0,
    * NULL centroid) instead of erroring under ANSI element_at. */
  private val PairsExpr =
    s"""transform(filter(sequence(0, greatest(cast(size(ring_lons) as int) - 1, 0)),
       |    i -> i < size(ring_lons)), i ->
       |  named_struct(
       |    'x',  element_at(ring_lons, i + 1),
       |    'y',  element_at(ring_lats, i + 1),
       |    'xn', element_at(ring_lons, $NextIdx + 1),
       |    'yn', element_at(ring_lats, $NextIdx + 1)))""".stripMargin

  /** One ordered fold: a2 = 2*signed_area, cx6/cy6 = 6*area-weighted
    * centroid numerators (the classic polygon-centroid identities). */
  private val FoldExpr =
    s"""aggregate($PairsExpr,
       |  named_struct('a2', cast(0.0 as double), 'cx6', cast(0.0 as double),
       |               'cy6', cast(0.0 as double)),
       |  (acc, p) -> named_struct(
       |    'a2',  acc.a2  + (p.x * p.yn - p.xn * p.y),
       |    'cx6', acc.cx6 + (p.x + p.xn) * (p.x * p.yn - p.xn * p.y),
       |    'cy6', acc.cy6 + (p.y + p.yn) * (p.x * p.yn - p.xn * p.y)))""".stripMargin

  /**
   * Per-polygon stats. Input must carry `polygon_id`, `ring_offsets`,
   * `ring_lons`, `ring_lats`. Degenerate polygons (< 3 vertices or zero
   * signed area) get a NULL centroid; planar degree units, documented —
   * area in degree^2 is the engine-agnostic contract quantity.
   */
  def stats(polys: DataFrame): DataFrame =
    polys
      .withColumn("__f", expr(FoldExpr))
      .select(col("polygon_id"),
        size(col("ring_offsets")).as("n_rings"),
        size(col("ring_lons")).as("n_vertices"),
        (col("__f.a2") / 2.0).as("area_deg2"),
        when(col("__f.a2") =!= 0.0, col("__f.cx6") / (lit(3.0) * col("__f.a2")))
          .as("centroid_lon"),
        when(col("__f.a2") =!= 0.0, col("__f.cy6") / (lit(3.0) * col("__f.a2")))
          .as("centroid_lat"),
        array_min(col("ring_lons")).as("min_lon"),
        array_max(col("ring_lons")).as("max_lon"),
        array_min(col("ring_lats")).as("min_lat"),
        array_max(col("ring_lats")).as("max_lat"))

  /** Geodesic total ring length (outer rings + holes) in METERS: one
    * ordered left-to-right haversine fold over the same successor-pair
    * array as the shoelace fold — map-only, bit-deterministic (the fold
    * seed 0.0 + h1 is exactly h1, so an engine folding without the seed
    * replays the identical chain). Complements `stats`' planar degree
    * quantities with the one measure that must be geodesic. */
  def perimeter(polys: DataFrame): DataFrame =
    polys.withColumn("__pairs", expr(PairsExpr))
      .select(col("polygon_id"),
        size(col("ring_lons")).cast("int").as("n_vertices"),
        aggregate(col("__pairs"), lit(0.0), (acc, p) =>
          acc + graft.functions.GeoFunctions.haversineM(
            p.getField("x"), p.getField("y"),
            p.getField("xn"), p.getField("yn"))).as("perimeter_m"))

  /**
   * Ramer-Douglas-Peucker simplification over the packed-ring layout
   * (geo.Simplify per ring) — the vector op the tiler runs before drawing
   * admin polygons at coarse zooms. Map-only: the kept-index computation is
   * one codegen call per polygon, the ring arrays are rewritten by array
   * expressions, and ring structure survives because ring-start vertices
   * are always DP anchors (new offsets = positions of old offsets within
   * the kept list). Rewrites ring_offsets/ring_lons/ring_lats in place and
   * adds n_vertices_in / n_vertices_out.
   */
  def simplify(polys: DataFrame, epsDeg: Double): DataFrame =
    polys
      .withColumn("__keep", graft.functions.GeoFunctions.simplifyPackedIdx(
        col("ring_offsets"), col("ring_lons"), col("ring_lats"), lit(epsDeg)))
      .withColumn("n_vertices_in", size(col("ring_lons")))
      .withColumn("n_vertices_out", size(col("__keep")))
      // fence-post offsets: positions of old ring STARTS within the kept
      // list, plus the closing sentinel size(__keep) — same [s0,...,len]
      // convention Geo.rayCast scans
      .withColumn("__offsets_s", expr(
        """concat(filter(transform(
          |  sequence(0, greatest(cast(size(__keep) as int) - 1, 0)),
          |  k -> CASE WHEN k < size(__keep)
          |            AND array_contains(slice(ring_offsets, 1, size(ring_offsets) - 1),
          |                               element_at(__keep, k + 1))
          |       THEN k ELSE -1 END), k -> k >= 0),
          |  array(cast(size(__keep) as int)))""".stripMargin))
      .withColumn("__lons_s",
        expr("transform(__keep, i -> element_at(ring_lons, i + 1))"))
      .withColumn("__lats_s",
        expr("transform(__keep, i -> element_at(ring_lats, i + 1))"))
      .drop("ring_offsets", "ring_lons", "ring_lats")
      .withColumnRenamed("__offsets_s", "ring_offsets")
      .withColumnRenamed("__lons_s", "ring_lons")
      .withColumnRenamed("__lats_s", "ring_lats")
      .drop("__keep")
}
