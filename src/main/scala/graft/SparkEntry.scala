package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.engine._
import graft.fixtures.Synth
import graft.functions.GeoFunctions
import graft.model.ReverseParams
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.text.TextAnalysis

/**
 * Driver contract (see repo README + SURVEY.md §7): `queries` maps operator
 * names to DataFrame builders over a testdata sf directory; `oracleSql` gives
 * DuckDB-equivalent SQL for every SQL-expressible query (same column names,
 * deterministic values). Engine-native spatial/sketch ops register without an
 * oracle (rows-only check) but are still fully deterministic.
 */
object SparkEntry {

  // ---- shared fixture world (tiny, driver-side) ---------------------------
  private def world(spark: SparkSession) = {
    val gaz = Gazetteer.gazetteerDF(spark)
    val idx = Gazetteer.nameIndex(gaz)
    val polys = Gazetteer.polygonsDF(spark)
    val cells = Gazetteer.polygonCellIndex(polys)
    (gaz, idx, polys, cells, Gazetteer.scanner())
  }

  /** Flagship: full geocode pipeline (extract -> forward + reverse -> tiles)
    * on synthesized pages at sf0.001 scale. */
  def entry(spark: SparkSession): DataFrame = {
    val (_, idx, polys, cells, scanner) = world(spark)
    val pages = Synth.pagesDF(spark, "/root/testdata/sf0.001")
    Pipeline.geocode(spark, pages, idx, polys, cells, scanner)
  }

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Documents with planted near-duplicates (deterministic) so pair-producing
    * dedup ops have non-trivial output at every sf. */
  private def docsWithNearDups(s: SparkSession, dir: String) = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    base.unionByName(base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core over TPC-H-ish tables (oracle-backed) ----------
    // Revenue sums go through DECIMAL(30,6): the per-row double product is
    // bit-identical in Spark and DuckDB, and the decimal SUM is exact and
    // order-insensitive — immune to partial-agg summation-order drift that
    // can exceed the 4dp rounding grain on ~1e10 sums.
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(org.apache.spark.sql.types.DecimalType(30, 6))), 4)
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
    }),
    "q2_join_topk" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet").filter(col("c_mktsegment") === "BUILDING")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val l = s.read.parquet(s"$dir/lineitem.parquet")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("l_orderkey")
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(30, 6))), 4)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }),
    "q3_window" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),
    "q4_semijoin" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val l = s.read.parquet(s"$dir/lineitem.parquet").filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
    }),
    "q5_antijoin" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_totalprice") > 450000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
    }),
    "q6_setop" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet").select(col("p_partkey").as("k"))
      val l = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_quantity") > 45).select(col("l_partkey").as("k"))
      p.except(l)
    }),
    "q7_events_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
    }),
    "q8_scalar_fns" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        upper(substring(col("text"), 1, 10)).as("head10"),
        length(col("text")).as("len"),
        (col("n_chars") % 7).as("mod7"),
        concat_ws("-", col("lang"), col("source")).as("tag"))
    }),

    // ---- spatial math with pure-SQL oracles ------------------------------
    "geo_tile_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/orders.parquet")
        .select(((col("o_orderkey") * 7919 % 360000) / lit(1000.0) - 180.0).as("lon"),
          ((col("o_orderkey") * 104729 % 170000) / lit(1000.0) - 85.0).as("lat"))
        .select(GeoFunctions.tileX(col("lon"), lit(8)).as("tile_x"),
          GeoFunctions.tileY(col("lat"), lit(8)).as("tile_y"))
        .groupBy("tile_x", "tile_y").agg(count(lit(1)).as("n"))
    }),
    "geo_lv03" -> ((s, dir) => {
      s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"),
          (lit(7.0) + col("n_nationkey") * 0.05).as("lon"),
          (lit(46.2) + col("n_nationkey") * 0.04).as("lat"))
        .select(col("n_nationkey"),
          GeoFunctions.lv03E(col("lon"), col("lat")).as("lv03_e"),
          GeoFunctions.lv03N(col("lon"), col("lat")).as("lv03_n"))
    }),
    "geo_mercator" -> ((s, dir) => {
      s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"),
          ((col("n_nationkey") * 13 % 360) - 180 + 0.25).as("lon"))
        .select(col("n_nationkey"), GeoFunctions.mercatorX(col("lon")).as("merc_x"))
    }),

    // ---- geocoding engine (deterministic synth pages; rows-only) ---------
    "geo_forward_pages" -> ((s, dir) => {
      val (_, idx, _, _, scanner) = world(s)
      Forward.geocodePages(s, Synth.pagesDF(s, dir), idx, scanner)
        .select("url", "surface", "name", "place_id", "lon", "lat", "result_rank")
    }),
    "geo_reverse_points" -> ((s, dir) => {
      val (_, _, polys, cells, scanner) = world(s)
      val mentions = graft.etl.Extract.mentions(s, Synth.pagesDF(s, dir), scanner)
      val coords = mentions.filter(col("kind") === "coord")
        .select(concat_ws("|", col("url"), col("surface")).as("query_id"),
          col("lon"), col("lat"))
      Reverse.reverse(coords, polys, cells, ReverseParams())
        .select("query_id", "name", "formatted", "geocode_status")
    }),
    "geo_reverse_geoadmin" -> ((s, dir) => {
      val (gaz, _, _, _, _) = world(s)
      val pts = s.range(0, 50).select(col("id").as("query_id"),
        (lit(7.4513) + col("id") / lit(100000.0)).as("lon"),
        (lit(46.9279) + col("id") / lit(200000.0)).as("lat"))
      Reverse.reverseGeoAdmin(pts, gaz)
        .select("query_id", "formatted", "geocode_status", "dist_m")
    }),
    "geo_knn" -> ((s, dir) => {
      val (gaz, _, _, _, _) = world(s)
      val pts = s.range(0, 100).select(col("id").as("query_id"),
        (lit(2.10) + col("id") / lit(1000.0)).as("lon"),
        (lit(41.38) + col("id") / lit(2000.0)).as("lat"))
      Knn.knn(pts, gaz, k = 3)
    }),
    "geo_pipeline_tiles" -> ((s, dir) => {
      val (_, idx, polys, cells, scanner) = world(s)
      val hits = Pipeline.geocode(s, Synth.pagesDF(s, dir), idx, polys, cells, scanner)
      Pipeline.tiles(hits)
    }),

    // ---- training-data ops: dedup / similarity / text / multimodal -------
    "doc_dedup_exact" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val withDups = base.unionByName(base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      Dedup.exact(withDups).select("keep_id", "dup_count")
    }),
    "doc_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(docsWithNearDups(s, dir), threshold = 0.5)
        .withColumn("jaccard_est", round(col("jaccard_est"), 6))),
    "doc_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docsWithNearDups(s, dir), threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))),
    "doc_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docsWithNearDups(s, dir), maxDist = 3)),
    "doc_fingerprints" -> ((s, dir) =>
      TextAnalysis.withFingerprints(docs(s, dir))
        .select("doc_id", "xxh64", "winnow_fp", "simhash")),
    "doc_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),
    "doc_quality" -> ((s, dir) =>
      TextAnalysis.withQuality(docs(s, dir))
        .select(col("doc_id"), col("n_tokens"),
          round(col("mean_token_len"), 6).as("mean_token_len"),
          round(col("quality_score"), 6).as("quality_score"))),
    "doc_token_stats" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        length(col("text")).as("len"),
        (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1)
          .as("n_tokens_ws"))),
    "doc_token_bpe" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCountBpe(col("text")).as("n_tokens_bpe"))),
    "q9_running_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    }),
    "emb_neardup_cosine" -> ((s, dir) => {
      val base = embs(s, dir).select(col("vec_id"), col("embedding"))
      val withDups = base.unionByName(base.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
      Dedup.embeddingNearDupPairs(withDups, threshold = 0.999)
        .withColumn("cos", round(col("cos"), 6))
    }),
    "emb_knn_brute" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.bruteForceKnn(e.filter(col("vec_id") < 8), e, k = 5)
        .withColumn("cos", round(col("cos"), 6))
    }),
    "emb_knn_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.lshKnn(e.filter(col("vec_id") < 8), e, k = 5, bits = 12, tables = 6)
        .withColumn("cos", round(col("cos"), 6))
    }),
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.withBinaryMeta(Synth.pagesDF(s, dir))
        .select("url", "bin_len", "mime", "content_hash")),
    "mm_features" -> ((s, dir) =>
      Multimodal.withFeatures(Synth.pagesDF(s, dir).limit(1000), dim = 16)
        .select(col("url"), round(graft.functions.TextFunctions.vnorm(col("features")), 6)
          .as("feat_norm")))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |CAST(round(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
        |  AS DECIMAL(30,6))), 4) AS DOUBLE) AS sum_disc_price,
        |count(*) AS n_rows FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q2_join_topk" ->
      """SELECT l_orderkey, CAST(round(sum(CAST(l_extendedprice
        |  * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(30,6))), 4) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q3_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY 1""".stripMargin,
    "q5_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > CAST(450000.0 AS DOUBLE))
        |GROUP BY 1""".stripMargin,
    "q6_setop" ->
      """SELECT p_partkey AS k FROM part
        |EXCEPT SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 45""".stripMargin,
    "q7_events_agg" ->
      """SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events,
        |count(DISTINCT user_id) AS n_users FROM events GROUP BY 1, 2""".stripMargin,
    "q8_scalar_fns" ->
      """SELECT doc_id, upper(substr(text, 1, 10)) AS head10, length(text) AS len,
        |n_chars % 7 AS mod7, concat_ws('-', lang, source) AS tag FROM documents""".stripMargin,
    // NOTE: all float literals are CAST to DOUBLE — DuckDB otherwise parses
    // them as DECIMAL, which changes (or overflows) the arithmetic vs Spark's
    // IEEE-double evaluation.
    "geo_tile_agg" ->
      """WITH pts AS (SELECT
        |  (o_orderkey * 7919 % 360000) / CAST(1000.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon,
        |  (o_orderkey * 104729 % 170000) / CAST(1000.0 AS DOUBLE) - CAST(85.0 AS DOUBLE) AS lat
        |  FROM orders)
        |SELECT CAST(floor((lon + CAST(180.0 AS DOUBLE)) / CAST(360.0 AS DOUBLE) * 256) AS BIGINT) AS tile_x,
        |  CAST(floor((CAST(1.0 AS DOUBLE) - ln(tan(radians(lat)) + CAST(1.0 AS DOUBLE) / cos(radians(lat))) / pi())
        |    / CAST(2.0 AS DOUBLE) * 256) AS BIGINT) AS tile_y,
        |  count(*) AS n
        |FROM pts GROUP BY 1, 2""".stripMargin,
    "geo_lv03" ->
      """WITH pts AS (SELECT n_nationkey,
        |  CAST(7.0 AS DOUBLE) + n_nationkey * CAST(0.05 AS DOUBLE) AS lon,
        |  CAST(46.2 AS DOUBLE) + n_nationkey * CAST(0.04 AS DOUBLE) AS lat FROM nation),
        |lp AS (SELECT n_nationkey,
        |  (lon * CAST(3600.0 AS DOUBLE) - CAST(26782.5 AS DOUBLE)) / CAST(10000.0 AS DOUBLE) AS lambda,
        |  (lat * CAST(3600.0 AS DOUBLE) - CAST(169028.66 AS DOUBLE)) / CAST(10000.0 AS DOUBLE) AS phi FROM pts)
        |SELECT n_nationkey,
        |  CAST(2600072.37 AS DOUBLE) + CAST(211455.93 AS DOUBLE) * lambda
        |    - CAST(10938.51 AS DOUBLE) * lambda * phi
        |    - CAST(0.36 AS DOUBLE) * lambda * phi * phi
        |    - CAST(44.54 AS DOUBLE) * lambda * lambda * lambda
        |    - CAST(2000000.0 AS DOUBLE) AS lv03_e,
        |  CAST(1200147.07 AS DOUBLE) + CAST(308807.95 AS DOUBLE) * phi
        |    + CAST(3745.25 AS DOUBLE) * lambda * lambda
        |    + CAST(76.63 AS DOUBLE) * phi * phi
        |    - CAST(194.56 AS DOUBLE) * lambda * lambda * phi
        |    + CAST(119.79 AS DOUBLE) * phi * phi * phi
        |    - CAST(1000000.0 AS DOUBLE) AS lv03_n
        |FROM lp""".stripMargin,
    "geo_mercator" ->
      """SELECT n_nationkey, ((n_nationkey * 13 % 360) - 180 + CAST(0.25 AS DOUBLE))
        |  * CAST(20037508.342789244 AS DOUBLE) / CAST(180.0 AS DOUBLE) AS merc_x
        |FROM nation""".stripMargin,
    "doc_dedup_exact" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0)
        |SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM all_docs GROUP BY text""".stripMargin,
    "doc_token_stats" ->
      """SELECT doc_id, length(text) AS len,
        |length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens_ws
        |FROM documents""".stripMargin,
    "q9_running_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |sum(l_quantity) OVER (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem""".stripMargin
  )
  // The sketch/ANN/geocoding queries (minhash, simhash, LSH, cell ids,
  // BPE-ish token count, pipeline) are intentionally oracle-less: their
  // values come from engine-native functions with no ANSI-SQL equivalent.
  // They remain fully deterministic for the driver's rows-only check.
}
