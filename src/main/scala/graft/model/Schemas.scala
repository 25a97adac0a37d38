package graft.model

import java.sql.Timestamp

/**
 * Typed row models (Dataset[T] at module boundaries; DataFrame + Column
 * expressions inside transforms). Schema derivations documented in SURVEY.md
 * §1; reference citations inline.
 */

/** Input table per BASELINE.json input_hint:
  * (url, warc_ts, html, text, lang) — Common-Crawl-style pages. */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                text: String, lang: String)

/** One extracted candidate from a page's text (E2).
  * kind: "name" (gazetteer mention) | "coord" (lat-lon literal).
  * For kind=coord, (lon, lat) parsed from the literal — lon-lat order per
  * /root/reference/src/lib.rs:12-16. For kind=name, norm = normalized
  * dictionary key; lon/lat null. */
case class Mention(kind: String, surface: String, norm: String,
                   lon: java.lang.Double, lat: java.lang.Double)

/** GeoNames-style gazetteer row (broadcast side of the forward join, E4).
  * Field provenance: AddressDetails /root/reference/src/openstreetmap.rs:321-337,
  * ranking :313-316 + /root/reference/src/geoadmin.rs:379-380, origins
  * feature classes /root/reference/src/geoadmin.rs:69. */
case class GazetteerRow(
    place_id: Long,
    name: String,
    norm_keys: Seq[String],             // normalized join keys (name variants)
    altnames: Map[String, String],      // lang -> localized display name
    lon: Double, lat: Double,
    feature_class: String,              // zipcode|gg25|district|kantone|gazetteer|address|parcel
    country_code: String,               // ISO-3166 alpha2 lower
    admin1: String, admin2: String, city: String, suburb: String,
    road: String, house_number: String, postcode: String,
    place_rank: Int, importance: Double, weight: Int,
    timezone: String = null)                // IANA zone (GeoNames-style); the
                                            // cell->tz annotation source

/** Admin polygon with packed rings (reverse side, E5). Ring r = point indices
  * [ring_offsets(r), ring_offsets(r+1)); even-odd rule => holes supported.
  * `cells` = level-13 covering cells (the join key once exploded).
  * fmt_ / loc_ fields feed the provider-style formatted strings (S3);
  * dplz4/dplzname/strname_deinr per /root/reference/src/geoadmin.rs:437-444. */
case class AdminPolygon(
    polygon_id: Long,
    name: String,
    admin_level: Int,                   // larger = more specific (country=2 .. building=10)
    country_code: String,
    ring_offsets: Seq[Int],
    ring_lons: Seq[Double],
    ring_lats: Seq[Double],
    min_lon: Double, min_lat: Double, max_lon: Double, max_lat: Double,
    cells: Seq[Long],
    fmt_house: String, fmt_road: String, fmt_suburb: String,
    fmt_city: String, fmt_county: String, fmt_state: String,
    fmt_region: String, fmt_postcode: String, fmt_country: String,
    loc_city: Map[String, String],      // lang -> localized city
    loc_country: Map[String, String],   // lang -> localized country
    dplz4: Int, dplzname: String, strname_deinr: String)

/** Bounding box; min = SW corner, max = NE corner
  * (/root/reference/src/lib.rs:138-147). */
case class Bounds(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double) {
  /** S1 — wire format "minLon,minLat,maxLon,maxLat"
    * (/root/reference/src/lib.rs:168-182). Used for lineage strings. */
  def wire: String = s"$minLon,$minLat,$maxLon,$maxLat"
}

/** Forward-geocode parameter surface — union of the three providers' params
  * (SURVEY.md §1.2): OpenstreetmapParams (/root/reference/src/openstreetmap.rs:36-93),
  * Opencage Parameters (/root/reference/src/opencage.rs:56-71),
  * GeoAdminParams (/root/reference/src/geoadmin.rs:36-102). */
case class ForwardParams(
    addressDetails: Boolean = false,            // P5
    viewbox: Option[Bounds] = None,             // P1
    countrycode: Option[String] = None,         // P3
    language: Option[String] = None,            // P4
    limit: Option[Int] = None,                  // L1
    origins: Option[Seq[String]] = None,        // P2
    sr: String = "4326",                        // C4/C5 CRS selector
    annotations: Boolean = false)               // P6

object ForwardParams {
  /** GeoAdmin defaults: origins list + limit 50
    * (/root/reference/src/geoadmin.rs:66-73). */
  val GeoAdminOrigins: Seq[String] =
    Seq("zipcode", "gg25", "district", "kantone", "gazetteer", "address", "parcel")
}

/** Reverse-geocode parameter surface. toleranceM models GeoAdmin's
  * identify-radius (/root/reference/src/geoadmin.rs:271-281, tolerance=50). */
case class ReverseParams(
    language: Option[String] = None,
    sr: String = "4326",
    annotations: Boolean = false,
    toleranceM: Double = 50.0)
