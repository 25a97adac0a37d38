package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Forward, Gazetteer, Reverse}
import graft.model.{ForwardParams, ReverseParams}

/**
 * User-facing API surface mirroring the reference's trait pair
 * (`Forward`/`Reverse`, /root/reference/src/lib.rs:92-134): "Each provider
 * may implement one or both". A Geocoder is constructed over the engine's
 * index tables once and then applies as DataFrame transforms.
 *
 *  - forward: query strings -> 0..n ranked points, lon-lat order
 *    (x, y columns; lib.rs:130-133)
 *  - reverse: points -> Option[String] formatted address (lib.rs:92-100)
 *  - *_full variants return the full structured result schema
 *
 * Provider classes replicate each provider's defaults and quirks (result
 * cardinality, axis swap, formatting) — see class docs.
 */
trait Geocoder {
  /** (query_id, query) -> (query_id, result_rank, x, y); 0..n rows per
    * query in provider rank order. */
  def forward(queries: DataFrame): DataFrame

  /** (query_id, lon, lat) -> (query_id, formatted); formatted null == None. */
  def reverse(points: DataFrame): DataFrame
}

/** Shared wiring over the engine tables. */
abstract class EngineGeocoder(spark: SparkSession) extends Geocoder {
  protected lazy val gazRows = graft.fixtures.World.gazetteer()
  protected lazy val nameIndex = Gazetteer.nameIndex(Gazetteer.gazetteerDF(spark, gazRows))
  protected lazy val polygons = Gazetteer.polygonsDF(spark)
  protected lazy val cellIndex = Gazetteer.polygonCellIndex(polygons)
  protected lazy val gazetteer = Gazetteer.gazetteerDF(spark, gazRows)
  /** Per-cell timezone index derived from THIS geocoder's own gazetteer rows
    * (GeoNames-style per-place zones) — never from engine-global state. */
  protected lazy val tzByCell: Map[Long, String] =
    graft.fixtures.World.timezoneByCell7(gazRows)

  protected def fwd(queries: DataFrame, params: ForwardParams): DataFrame =
    Forward.forward(queries, nameIndex, params, tzByCell)

  protected def rev(points: DataFrame, params: ReverseParams): DataFrame =
    Reverse.reverse(points, polygons, cellIndex, params, tzByCell = tzByCell)
}

/**
 * Nominatim-style provider (/root/reference/src/openstreetmap.rs).
 * reverse returns display_name (openstreetmap.rs:208-232); unlike the
 * reference, an empty result is a null row, not a panic (SURVEY.md §7.4).
 */
class Openstreetmap(spark: SparkSession) extends EngineGeocoder(spark) {
  def forward(queries: DataFrame): DataFrame =
    fwd(queries, ForwardParams())
      .select(col("query_id"), col("result_rank"), col("x"), col("y"))

  /** OpenstreetmapParams surface: addressdetails + viewbox
    * (openstreetmap.rs:36-93). */
  def forwardFull(queries: DataFrame, params: ForwardParams): DataFrame =
    fwd(queries, params.copy(addressDetails = true))

  def reverse(points: DataFrame): DataFrame =
    rev(points, ReverseParams())
      .select(col("query_id"), col("display_name").as("formatted"))
}

/**
 * OpenCage-style provider (/root/reference/src/opencage.rs).
 * reverse returns results[0].formatted, exactly one row per point
 * (opencage.rs:192, 370-372); language/countrycode/limit params
 * (opencage.rs:56-71); full variants toggle annotations
 * (opencage.rs:293 vs :349).
 */
class Opencage(spark: SparkSession, language: Option[String] = None,
               countrycode: Option[String] = None, limit: Option[Int] = None)
    extends EngineGeocoder(spark) {
  private val base = ForwardParams(language = language,
    countrycode = countrycode, limit = limit)

  def forward(queries: DataFrame): DataFrame =
    fwd(queries, base)
      .select(col("query_id"), col("result_rank"), col("x"), col("y"))

  def forwardFull(queries: DataFrame, bounds: Option[graft.model.Bounds]): DataFrame =
    fwd(queries, base.copy(viewbox = bounds, annotations = true))

  def reverse(points: DataFrame): DataFrame =
    rev(points, ReverseParams(language = language))
      .select(col("query_id"), col("formatted"))

  def reverseFull(points: DataFrame): DataFrame =
    rev(points, ReverseParams(language = language, annotations = true))
}

/**
 * GeoAdmin-style provider (/root/reference/src/geoadmin.rs).
 * sr-aware output CRS with easting-first axis swap for 2056/21781
 * (geoadmin.rs:245-255); forward pins limit=1 (geoadmin.rs:237),
 * forward_full defaults to origins list + limit 50 (geoadmin.rs:66-73);
 * reverse = nearest register entry within 50 m, None when empty
 * (geoadmin.rs:260-306).
 */
class GeoAdmin(spark: SparkSession, sr: String = "4326")
    extends EngineGeocoder(spark) {
  /** The reference pins BOTH limit=1 and origins=address in GeoAdmin::forward
    * (geoadmin.rs:236-237) — without the origins pin, gazetteer/zipcode
    * features would leak through where the reference returns no result. */
  def forward(queries: DataFrame): DataFrame =
    fwd(queries, ForwardParams(limit = Some(1), sr = sr,
      origins = Some(Seq("address"))))
      .select(col("query_id"), col("result_rank"), col("x"), col("y"))

  def forwardFull(queries: DataFrame, params: ForwardParams): DataFrame =
    fwd(queries, params.copy(sr = sr,
      origins = params.origins.orElse(Some(ForwardParams.GeoAdminOrigins)),
      limit = params.limit.orElse(Some(50))))

  def reverse(points: DataFrame): DataFrame =
    Reverse.reverseGeoAdmin(points, gazetteer, ReverseParams(sr = sr))
      .select(col("query_id"), col("formatted"))
}
