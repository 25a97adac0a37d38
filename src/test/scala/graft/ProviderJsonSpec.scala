package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ProviderJson

/** Typed ingestion of provider-shaped response JSON (D4/S4/S5/S6). Sample
  * documents mirror the reference's doc examples (values only). */
class ProviderJsonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Nominatim GeoJSON parses: explode order, lon/lat, address details") {
    val json =
      """{"type":"FeatureCollection","licence":"ODbL",
        |"features":[
        | {"type":"Feature","properties":{"place_id":67107259,"osm_type":"node",
        |  "osm_id":6028358795,"display_name":"Schwabing, München, Bayern, Deutschland",
        |  "place_rank":20,"category":"place","type":"suburb","importance":0.66,
        |  "address":{"city":"München","state":"Bayern","country_code":"de"}},
        |  "bbox":[11.5684858,48.1500887,11.6084858,48.1900887],
        |  "geometry":{"type":"Point","coordinates":[11.5884858,48.1700887]}},
        | {"type":"Feature","properties":{"place_id":99,"osm_type":"way","osm_id":5,
        |  "display_name":"Second","place_rank":30,"category":"place","type":"x",
        |  "importance":0.1},
        |  "bbox":[1,2,3,4],"geometry":{"type":"Point","coordinates":[1.5,2.5]}}
        |]}""".stripMargin.replace("\n", "")
    val out = ProviderJson.parseNominatim(Seq(("q1", json)).toDF("query_id", "body"),
      col("body")).orderBy("result_rank").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("place_id") === 67107259L)
    assert(out(0).getAs[Double]("lon") === 11.5884858)
    assert(out(0).getAs[Double]("lat") === 48.1700887)
    assert(out(0).getAs[org.apache.spark.sql.Row]("address").getAs[String]("city") === "München")
    assert(out(0).getAs[org.apache.spark.sql.Row]("bbox").getAs[Double]("minLon") === 11.5684858)
    assert(out(1).getAs[Int]("result_rank") === 2)

    // Vec-shape recovery
    val resp = ProviderJson.toNominatimResponse(
      ProviderJson.parseNominatim(Seq(("q1", json)).toDF("query_id", "body"), col("body")),
      Seq("query_id")).collect()(0)
    assert(resp.getAs[Seq[org.apache.spark.sql.Row]]("features").map(
      _.getAs[Int]("result_rank")) === Seq(1, 2))
  }

  test("OpenCage parses: lenient string-or-int components, UnixTime, rate") {
    // components mixes string and int values — the reference needs a custom
    // lenient deserializer (opencage.rs:73-88); Spark's string coercion
    // handles both
    val json =
      """{"documentation":"https://example","status":{"message":"OK","code":200},
        |"rate":{"limit":2500,"remaining":2499,"reset":1},
        |"total_results":1,
        |"timestamp":{"created_http":"x","created_unix":1525093578},
        |"results":[{"components":{"city":"Barcelona","postcode":"08017",
        |  "house_number":64,"_type":"building"},
        |  "confidence":10,"formatted":"Carrer de Calatrava, 64, 08017 Barcelona, Spain",
        |  "geometry":{"lat":41.40139,"lng":2.12870}}]}""".stripMargin.replace("\n", "")
    val out = ProviderJson.parseOpencage(Seq(("q1", json)).toDF("query_id", "body"),
      col("body")).collect()(0)
    assert(out.getAs[Int]("status_code") === 200)
    assert(out.getAs[Int]("remaining_calls") === 2499)
    assert(out.getAs[Double]("lon") === 2.12870)
    val comp = out.getAs[Map[String, String]]("components")
    assert(comp("city") === "Barcelona")
    assert(comp("house_number") === "64") // int coerced to string (S4)
    assert(out.getAs[java.sql.Timestamp]("created_ts").toInstant.getEpochSecond === 1525093578L)
  }

  test("GeoAdmin parses: forward attrs incl. projected x/y; reverse camelCase + arrays") {
    val fwd =
      """{"results":[{"id":1,"weight":4,"attrs":{"origin":"address",
        |"geom_quadindex":"021300","weight":4,"rank":7,"detail":"seftigenstrasse 264",
        |"lat":46.92793655395508,"lon":7.451352119445801,"num":264,
        |"x":197427.0,"y":600968.75,
        |"label":"Seftigenstrasse 264 <b>3084 Wabern</b>","zoomlevel":10}}]}"""
        .stripMargin.replace("\n", "")
    val f = ProviderJson.parseGeoAdminForward(Seq(("q", fwd)).toDF("query_id", "body"),
      col("body")).collect()(0)
    assert(f.getAs[String]("label") === "Seftigenstrasse 264 <b>3084 Wabern</b>")
    assert(f.getAs[Double]("lon") === 7.451352119445801)
    assert(f.getAs[Double]("y") === 600968.75)

    val rev =
      """{"results":[{"featureId":"1272199_0","layerBodId":"ch.bfs.gebaeude_wohnungs_register",
        |"layerName":"Register","properties":{"egid":"1272199","ggdenr":355,
        |"ggdename":"Köniz","gdekt":"BE","dplz4":3084,"dplzname":"Wabern",
        |"strname":["Seftigenstrasse"],"strsp":["DE"],
        |"strname_deinr":"Seftigenstrasse 264","label":"x"}}]}"""
        .stripMargin.replace("\n", "")
    val r = ProviderJson.parseGeoAdminReverse(Seq(("q", rev)).toDF("query_id", "body"),
      col("body")).collect()(0)
    assert(r.getAs[String]("featureId") === "1272199_0")
    assert(r.getAs[Seq[String]]("strname") === Seq("Seftigenstrasse"))
    assert(r.getAs[String]("formatted") === "Seftigenstrasse 264, 3084 Wabern")
  }
}
