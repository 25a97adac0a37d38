package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine._
import graft.functions.GeoFunctions
import graft.model.{Bounds, ForwardParams, ReverseParams}

/**
 * Golden-fixture results (north_star: "the reference's own forward/reverse
 * fixtures re-expressed as golden Parquet: identical coordinates, matched
 * place names, and tile assignments, byte-identical extracted text per
 * url"). `build` runs every reference test case (FIXTURES.md §3) through the
 * engine and emits one stable-ordered row per fixture; `graft.GoldenMain`
 * writes it to golden/ (committed), and GoldenParquetSpec asserts each
 * regeneration equals the committed Parquet row-for-row.
 *
 * Schema: (fixture_id, verb, x, y, name, formatted, label, tile_z, tile_x,
 * tile_y, text_sha256) — x/y in the fixture's CRS (lon-lat for 4326,
 * easting-first for LV95 per geoadmin.rs:245-255); tiles at z=12 from the
 * WGS84 coordinates; text_sha256 over the fixture's page text for the
 * byte-identity invariant.
 */
object Golden {

  private case class Fx(id: String, verb: String, q: String = null,
                        lon: Double = 0, lat: Double = 0,
                        params: ForwardParams = ForwardParams(),
                        rparams: ReverseParams = ReverseParams(),
                        geoAdminRev: Boolean = false,
                        pageText: String = null)

  private val uclBox = Bounds(-0.13806939125061035, 51.51989264641164,
    -0.13427138328552246, 51.52319711775629)

  private val fixtures = Seq(
    Fx("osm_forward", "forward", q = "Schwabing, München",
      pageText = Synth.fixtureTexts(0)),
    Fx("osm_forward_full", "forward", q = "UCL Centre for Advanced Spatial Analysis",
      params = ForwardParams(addressDetails = true, viewbox = Some(uclBox)),
      pageText = Synth.fixtureTexts(1)),
    Fx("osm_reverse", "reverse", lon = 2.12870, lat = 41.40139,
      pageText = Synth.fixtureTexts(2)),
    Fx("oc_forward", "forward", q = "Schwabing, München",
      pageText = Synth.fixtureTexts(0)),
    Fx("oc_reverse", "reverse", lon = 2.12870, lat = 41.40139,
      pageText = Synth.fixtureTexts(2)),
    Fx("oc_reverse_fr", "reverse", lon = 2.12870, lat = 41.40139,
      rparams = ReverseParams(language = Some("fr")),
      pageText = Synth.fixtureTexts(2)),
    Fx("oc_forward_full_bbox", "forward", q = "UCL Centre for Advanced Spatial Analysis",
      params = ForwardParams(viewbox = Some(uclBox), annotations = true),
      pageText = Synth.fixtureTexts(1)),
    Fx("oc_forward_full_nobox", "forward", q = "Moabit, Berlin, Germany",
      pageText = Synth.fixtureTexts(4)),
    Fx("ga_forward", "forward", q = "Seftigenstrasse 264, 3084 Wabern",
      params = ForwardParams(limit = Some(1), origins = Some(Seq("address"))),
      pageText = Synth.fixtureTexts(3)),
    Fx("ga_forward_lv95", "forward", q = "Seftigenstrasse 264, 3084 Wabern",
      params = ForwardParams(limit = Some(1), sr = "2056"),
      pageText = Synth.fixtureTexts(3)),
    Fx("ga_forward_full", "forward", q = "Seftigenstrasse Bern",
      params = ForwardParams(origins = Some(Seq("address")),
        viewbox = Some(Bounds(7.4513398, 46.92792859, 7.4513662, 46.9279467))),
      pageText = Synth.fixtureTexts(10)),
    Fx("ga_reverse", "reverse", lon = 7.451352119445801, lat = 46.92793655395508,
      geoAdminRev = true, pageText = Synth.fixtureTexts(5)))

  def build(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val gaz = Gazetteer.gazetteerDF(spark).cache()
    val idx = Gazetteer.nameIndex(gaz)
    val polys = Gazetteer.polygonsDF(spark)
    val cells = Gazetteer.polygonCellIndex(polys)

    val parts = fixtures.map { f =>
      val sha = graft.geo.Geo.sha256Hex(f.pageText)
      val one = f.verb match {
        case "forward" =>
          Forward.forward(Seq((1L, f.q)).toDF("query_id", "query"), idx, f.params)
            .filter(col("result_rank") === 1)
            .select(lit(f.id).as("fixture_id"), lit("forward").as("verb"),
              col("x"), col("y"), col("name"),
              col("formatted"), col("label"),
              col("lon").as("__lon"), col("lat").as("__lat"))
        case _ if f.geoAdminRev =>
          Reverse.reverseGeoAdmin(
            Seq((1L, f.lon, f.lat)).toDF("query_id", "lon", "lat"), gaz, f.rparams)
            .select(lit(f.id).as("fixture_id"), lit("reverse").as("verb"),
              col("lon").as("x"), col("lat").as("y"),
              col("formatted").as("name"), col("formatted"),
              lit(null).cast("string").as("label"),
              col("lon").as("__lon"), col("lat").as("__lat"))
        case _ =>
          Reverse.reverse(
            Seq((1L, f.lon, f.lat)).toDF("query_id", "lon", "lat"),
            polys, cells, f.rparams)
            .select(lit(f.id).as("fixture_id"), lit("reverse").as("verb"),
              col("lon").as("x"), col("lat").as("y"), col("name"),
              col("formatted"), col("display_name").as("label"),
              col("lon").as("__lon"), col("lat").as("__lat"))
      }
      one
        .withColumn("tile_z", lit(12))
        .withColumn("tile_x", GeoFunctions.tileX(col("__lon"), lit(12)))
        .withColumn("tile_y", GeoFunctions.tileY(col("__lat"), lit(12)))
        .withColumn("text_sha256", lit(sha))
        .drop("__lon", "__lat")
    }
    parts.reduce(_.unionByName(_)).orderBy("fixture_id")
  }
}

/** Writes golden/ (one parquet file, stable order). Run once; output is
  * committed so parity regressions are diffable. */
object GoldenMain {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "golden"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Golden.build(spark).coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
