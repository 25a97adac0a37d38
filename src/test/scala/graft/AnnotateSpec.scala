package graft

import java.time.{LocalDate, ZoneOffset}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Annotate
import graft.fixtures.World
import graft.geo.Geo

/** E8 annotation extensions: sun rise/set (opencage.rs:592-598), per-location
  * timezone via the cell->tz index, and the OpenCage components map
  * (opencage.rs:571, indexed at opencage.rs:800). */
class AnnotateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sunUtc(lon: Double, lat: Double, date: String, rise: Boolean): Double = {
    val day = LocalDate.parse(date).toEpochDay
    val s = Geo.sunEventEpoch(lon, lat, day, rise)
    assert(s != null)
    (s.longValue() - day * 86400L) / 3600.0 // UTC hours that day
  }

  test("sunrise/sunset match known almanac values within 7 minutes") {
    // London, 2024 summer solstice: rise 04:43 BST = 3.72h UTC, set 21:21 BST
    assert(math.abs(sunUtc(-0.1278, 51.5074, "2024-06-21", rise = true) - 3.72) < 0.12)
    assert(math.abs(sunUtc(-0.1278, 51.5074, "2024-06-21", rise = false) - 20.35) < 0.12)
    // New York, 2024 spring equinox: rise 06:59 EDT = 10.98h UTC, set 19:08 EDT
    assert(math.abs(sunUtc(-74.006, 40.7128, "2024-03-20", rise = true) - 10.98) < 0.12)
    assert(math.abs(sunUtc(-74.006, 40.7128, "2024-03-20", rise = false) - 23.13) < 0.12)
  }

  test("polar night yields null sunrise") {
    // Longyearbyen in December: no sunrise
    assert(Geo.sunEventEpoch(15.63, 78.22, LocalDate.parse("2024-12-21").toEpochDay,
      rise = true) === null)
  }

  test("per-location timezone resolves US west/east correctly (country-level cannot)") {
    val pts = Seq((-118.2437, 34.0522, "us"), (-74.0060, 40.7128, "us"))
      .toDF("lon", "lat", "country_code")
    val tz = pts.withColumn("tz",
      Annotate.timezoneAt($"lon", $"lat", $"country_code", World.timezoneByCell7()))
      .select("lon", "tz").as[(Double, String)].collect().toMap
    assert(tz(-118.2437) === "America/Los_Angeles")
    assert(tz(-74.0060) === "America/New_York")
    // fallback: a US point with no cell entry gets the country zone
    val fallback = Seq((-100.0, 35.0, "us")).toDF("lon", "lat", "country_code")
      .withColumn("tz", Annotate.timezoneAt($"lon", $"lat", $"country_code",
        World.timezoneByCell7()))
      .select("tz").as[String].collect()(0)
    assert(fallback === "America/New_York")
  }

  test("annotations carry sun keyed by the row timestamp, never the wall clock") {
    val df = Seq((2.12870, 41.40139, "es",
      java.sql.Timestamp.from(LocalDate.parse("2024-06-21").atStartOfDay
        .toInstant(ZoneOffset.UTC))))
      .toDF("lon", "lat", "country_code", "warc_ts")
    val r = Annotate.withAnnotations(df, $"lon", $"lat", $"country_code",
      ts = Some($"warc_ts")).select("annotations.sun.rise", "annotations.sun.set")
      .collect()(0)
    assert(r.getTimestamp(0) !== null)
    assert(r.getTimestamp(0).toInstant.toString.startsWith("2024-06-21T04:1")) // 06:18 CEST Barcelona
    assert(r.getTimestamp(1).toInstant.toString.startsWith("2024-06-21T19:")) // ~21:2x CEST
  }

  test("components map carries OpenCage keys (opencage.rs:800 parity)") {
    val oc = new graft.api.Opencage(spark, language = Some("fr"))
    val r = oc.reverseFull(Seq((1L, 2.12870, 41.40139)).toDF("query_id", "lon", "lat"))
      .select("components").collect()(0)
    val m = r.getMap[String, String](0)
    assert(m("road") === "Carrer de Calatrava")
    assert(m("city") === "Barcelone") // localized, fr
    assert(m("country_code") === "es")
    // forward side too
    val fwd = graft.engine.Forward.forward(
      Seq((1L, "Carrer de Calatrava 64")).toDF("query_id", "query"),
      graft.engine.Gazetteer.nameIndex(graft.engine.Gazetteer.gazetteerDF(spark)))
      .select("components").collect()(0).getMap[String, String](0)
    assert(fwd("road") === "Carrer de Calatrava")
    assert(fwd("postcode") === "08017")
  }
}
