package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/**
 * E6 — kNN nearest place via k-ring cell expansion + haversine top-k.
 *
 * Candidate generation: each query point explodes its level-13 k-ring (all
 * cells within Chebyshev radius `maxRing`) and equi-joins the broadcast
 * gazetteer on cell13 — a pure hash join, no cross product, no theta join.
 * Refinement: exact haversine, per-query row_number <= k.
 *
 * Scale note: a fixed maxRing bounds the candidate fan-out at (2r+1)^2 cells
 * per query. For sparse regions where the ring yields < k candidates, the
 * correct scale path is iterative doubling (re-run the residual queries at
 * 2r — a driver loop over a shrinking Dataset). At gazetteer densities where
 * kNN is meaningful (urban), ring 2 = 25 cells ~ 30 km^2 suffices; residual
 * re-query is provided via `knnComplete`.
 */
object Knn {

  /** queries: (query_id, lon, lat). Output: up to k nearest gazetteer places
    * per query within maxRing rings, ordered by knn_rank. */
  def knn(queries: DataFrame, gazetteer: DataFrame, k: Int, maxRing: Int = 2): DataFrame = {
    val pts = queries
      .withColumn("cell", cellId(col("lon"), col("lat"),
        lit(graft.geo.CellIndex.FineLevel)))
      .withColumn("cand_cell", explode(kRing(col("cell"), lit(maxRing))))

    val gaz = broadcast(gazetteer.select(
      col("cell13"), col("place_id"), col("name"), col("feature_class"),
      col("country_code"), col("lon").as("g_lon"), col("lat").as("g_lat")))

    val cand = pts.join(gaz, pts("cand_cell") === gaz("cell13"), "inner")
      .withColumn("dist_m", haversineM(col("lon"), col("lat"), col("g_lon"), col("g_lat")))
      // k-ring cells can be reached via multiple exploded rows after face
      // re-encoding; dedup (query, place) before ranking
      .dropDuplicates("query_id", "place_id")

    val w = Window.partitionBy(col("query_id")).orderBy(col("dist_m"), col("place_id"))
    cand.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select(col("query_id"), col("knn_rank"), col("place_id"), col("name"),
        col("g_lon").as("place_lon"), col("g_lat").as("place_lat"), col("dist_m"))
  }

  /** Iterative-expansion variant: queries re-run at doubled ring radius until
    * their k-th nearest candidate is PROVABLY the true k-th nearest, or
    * maxRingCap is reached. Driver loop over a shrinking residual — each pass
    * is a full Spark job, no collect of data rows.
    *
    * Correctness: having >= k candidates inside ring r is NOT sufficient — a
    * strictly nearer place can sit one ring further out when the query is
    * near a cell boundary. A query is only satisfied when its k-th candidate
    * distance <= r * CellIndex.minEdgeMeters(level), the guaranteed coverage
    * radius of ring r (every unexplored point is farther than that bound), so
    * no point outside the ring can displace the returned top-k. At the cap,
    * results are returned as-is (documented approximation beyond
    * maxRingCap * minEdge meters). */
  def knnComplete(queries: DataFrame, gazetteer: DataFrame, k: Int,
                  startRing: Int = 0, maxRingCap: Int = 8): DataFrame = {
    // startRing <= 0: derive the initial radius from gazetteer density (one
    // cheap aggregation) so dense worlds skip the tiny-ring rounds and sparse
    // worlds skip several doublings — each saved round is a full Spark job.
    var ring =
      if (startRing > 0) startRing
      else {
        val st = gazetteer.agg(count(lit(1)).as("n"), min("lon").as("lo1"),
          max("lon").as("lo2"), min("lat").as("la1"), max("lat").as("la2")).head()
        val n = st.getLong(0)
        val edgeM = graft.geo.CellIndex.minEdgeMeters(graft.geo.CellIndex.FineLevel)
        val degM = graft.geo.Geo.EarthRadiusM * math.Pi / 180.0
        val r0 =
          if (n == 0) maxRingCap
          else {
            val midLat = (st.getDouble(3) + st.getDouble(4)) / 2.0
            val wM = math.max(edgeM, (st.getDouble(2) - st.getDouble(1)) * degM *
              math.max(0.1, math.cos(midLat * math.Pi / 180.0)))
            val hM = math.max(edgeM, (st.getDouble(4) - st.getDouble(3)) * degM)
            val density = n / math.max(1.0, (wM / edgeM) * (hM / edgeM))
            // the binding constraint is the COVERAGE rule, not candidate
            // count: a query is satisfied only when its k-th distance <=
            // r * minEdge, and the expected k-th neighbour distance in a
            // Poisson field is ~ minEdge * sqrt(k / (pi * density)). Start at
            // 2x that radius so round one satisfies nearly every query —
            // each extra round is a full sequential Spark job, while extra
            // ring cells are just a wider (tiny) broadcast-probe fan-out.
            math.ceil(2.0 * math.sqrt(k / (math.Pi * math.max(density, 1e-12)))).toInt
          }
        math.max(1, math.min(maxRingCap, r0))
      }
    // local alias so the CALLER's frame is never persisted/unpersisted by us
    var residual = queries.select(queries.columns.map(col): _*).cache()
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame](residual)
    var residualCount = -1L // unknown until the first round's summary
    var acc: DataFrame = null
    while (ring <= maxRingCap && residualCount != 0) {
      val coverageM = ring * graft.geo.CellIndex.minEdgeMeters(graft.geo.CellIndex.FineLevel)
      val got = knn(residual, gazetteer, k, ring).cache()
      val stats = got.groupBy("query_id")
        .agg(count(lit(1)).as("__n"), max(col("dist_m")).as("__kdist"))
      val satOk = col("__n") >= k && col("__kdist") <= coverageM
      val satisfied = stats.filter(satOk).select("query_id")
      cached += got
      // the ONE action per round: residual total + satisfied count in a
      // single aggregation (materializes got; no isEmpty, no second scan)
      val row = residual.join(stats, Seq("query_id"), "left")
        .agg(count(lit(1)).as("__t"),
          sum(when(satOk, 1L).otherwise(0L)).as("__s")).head()
      val total = row.getLong(0)
      val sat = if (row.isNullAt(1)) 0L else row.getLong(1)
      val done = got.join(satisfied, Seq("query_id"), "left_semi")
      acc = if (acc == null) done else acc.unionByName(done)
      val next = residual.join(satisfied, Seq("query_id"), "left_anti").cache()
      cached += next
      residual = next
      residualCount = total - sat
      ring *= 2
    }
    // whatever the residual found at the final radius (may be < k results,
    // and beyond the coverage guarantee — best effort at the cap)
    val result =
      if (residualCount == 0 && acc != null) acc
      else {
        val last = knn(residual, gazetteer, k, maxRingCap)
        if (acc == null) last else acc.unionByName(last)
      }
    // materialize the (small) result, then release every intermediate cache —
    // repeated calls must not accumulate blocks until LRU eviction. The
    // returned frame stays cached (callers consume it immediately).
    val out = result.cache()
    out.count()
    cached.foreach(_.unpersist())
    out
  }
}
