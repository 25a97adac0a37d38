package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/**
 * E8 — OpenCage-style annotation synthesis, computed offline (the reference
 * receives these as server JSON: /root/reference/src/opencage.rs:580-599).
 * Everything is a deterministic Column expression over (lon, lat,
 * country_code):
 *  - DMS strings              (opencage.rs:442-445)
 *  - Mercator x/y meters      (opencage.rs:448-451)
 *  - OSM map/edit URLs        (opencage.rs:452-455)
 *  - geohash                  (opencage.rs:474)
 *  - qibla bearing            (opencage.rs:594 `qibla: T`)
 *  - Maidenhead locator       (opencage.rs:583)
 *  - callingcode/currency/flag/timezone via broadcast-size country lookup
 *  - MGRS 1 m reference       (opencage.rs:582 — geo/Mgrs.scala Krüger UTM)
 * what3words requires a proprietary dataset — emitted as a null column with
 * the schema slot preserved.
 */
object Annotate {

  /** Great-circle initial bearing (degrees 0..360) to the Kaaba — the
    * OpenCage `qibla` annotation. */
  def qibla(lon: Column, lat: Column): Column = {
    val mLat = radians(lit(21.4225))
    val mLon = radians(lit(39.8262))
    val la = radians(lat)
    val dLon = mLon - radians(lon)
    val y = sin(dLon) * cos(mLat)
    val x = cos(la) * sin(mLat) - sin(la) * cos(mLat) * cos(dLon)
    pmod(degrees(atan2(y, x)), lit(360.0))
  }

  /** Maidenhead grid locator (6 chars). Pure arithmetic on lon/lat. */
  def maidenhead(lon: Column, lat: Column): Column = {
    val adjLon = lon + lit(180.0)
    val adjLat = lat + lit(90.0)
    val f1 = chr(lit(65) + floor(adjLon / 20.0).cast("int"))
    val f2 = chr(lit(65) + floor(adjLat / 10.0).cast("int"))
    val s1 = floor(pmod(adjLon, lit(20.0)) / 2.0).cast("int").cast("string")
    val s2 = floor(pmod(adjLat, lit(10.0))).cast("int").cast("string")
    val t1 = chr(lit(97) + floor(pmod(adjLon, lit(2.0)) * 12.0).cast("int"))
    val t2 = chr(lit(97) + floor(pmod(adjLat, lit(1.0)) * 24.0).cast("int"))
    concat(f1, f2, s1, s2, t1, t2)
  }

  /** Per-location timezone: coarse-cell index lookup first (resolves
    * multi-zone countries like US/BR/AU correctly), country-level zone as
    * fallback. The cell index is a literal map at fixture scale; at world
    * scale the same lookup is a broadcast join keyed by cell7. */
  def timezoneAt(lon: Column, lat: Column, cc: Column,
                 tzByCell: Map[Long, String]): Column = {
    val cellLookup =
      if (tzByCell.isEmpty) lit(null).cast("string")
      else {
        val pairs = tzByCell.toSeq.sortBy(_._1)
          .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
        element_at(map(pairs: _*),
          cellId(lon, lat, lit(graft.geo.CellIndex.CoarseLevel)))
      }
    coalesce(cellLookup, Format.timezoneCol(cc))
  }

  /** Append the annotations struct column. Expects lon/lat/country_code.
    * `ts` (e.g. the page's warc_ts) keys the Sun rise/set annotation
    * (opencage.rs:592-598) — deterministic, never the wall clock; omitted =
    * null sun with the schema slot preserved.
    *
    * `tzByCell` defaults EMPTY (timezone falls back to the country-level
    * zone): per-cell zones are a property of the caller's gazetteer, never of
    * the engine — callers with a gazetteer that carries per-place zones derive
    * the map from it (see api.EngineGeocoder / World.timezoneByCell7). */
  def withAnnotations(df: DataFrame, lon: Column, lat: Column, cc: Column,
                      ts: Option[Column] = None,
                      tzByCell: Map[Long, String] = Map.empty): DataFrame = {
    val sun = ts match {
      case Some(t) => struct(
        sunrise(lon, lat, t).as("rise"), sunset(lon, lat, t).as("set"))
      case None => struct(
        lit(null).cast("timestamp").as("rise"), lit(null).cast("timestamp").as("set"))
    }
    df.withColumn("annotations", struct(
      struct(dms(lat, lit(true)).as("lat"), dms(lon, lit(false)).as("lng")).as("DMS"),
      struct(mercatorX(lon).as("x"), mercatorY(lat).as("y")).as("Mercator"),
      struct(
        format_string("https://www.openstreetmap.org/?mlat=%.5f&mlon=%.5f#map=17/%.5f/%.5f",
          lat, lon, lat, lon).as("url"),
        format_string("https://www.openstreetmap.org/edit#map=17/%.5f/%.5f",
          lat, lon).as("edit_url")).as("OSM"),
      geohash(lon, lat, lit(9)).as("geohash"),
      qibla(lon, lat).as("qibla"),
      maidenhead(lon, lat).as("Maidenhead"),
      sun.as("sun"),
      Format.callingCodeCol(cc).as("callingcode"),
      Format.currencyCol(cc).as("currency"),
      Format.flagCol(cc).as("flag"),
      timezoneAt(lon, lat, cc, tzByCell).as("timezone"),
      lit(null).cast("string").as("what3words"),
      mgrs(lon, lat).as("MGRS")))
  }
}
