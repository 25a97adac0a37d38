package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{GeoAdmin, Opencage, Openstreetmap}

/** The trait-level API surface (lib.rs:92-134 parity) through each provider
  * facade — the exact call shapes of the reference's doctests. */
class GeocoderApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val osm = new Openstreetmap(spark)
  lazy val oc = new Opencage(spark)
  lazy val ocFr = new Opencage(spark, language = Some("fr"))
  lazy val ga = new GeoAdmin(spark)
  lazy val gaLv95 = new GeoAdmin(spark, sr = "2056")

  test("Openstreetmap.forward — lib.rs doctest shape (lib.rs:109-125)") {
    val r = osm.forward(Seq((1L, "Schwabing, München")).toDF("query_id", "query"))
      .collect()
    assert(r.map(x => (x.getAs[Double]("x"), x.getAs[Double]("y"))).toSeq ===
      Seq((11.5884858, 48.1700887)))
  }

  test("Openstreetmap.reverse — lib.rs doctest shape (lib.rs:75-91)") {
    val r = osm.reverse(Seq((1L, 2.12870, 41.40139)).toDF("query_id", "lon", "lat"))
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("formatted").contains("Barcelona"))
  }

  test("Opencage.reverse returns exactly one formatted row (opencage.rs:192)") {
    val r = oc.reverse(Seq((1L, 2.12870, 41.40139)).toDF("query_id", "lon", "lat"))
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("formatted") ===
      "Carrer de Calatrava, 64, 08017 Barcelona, Spain")
  }

  test("Opencage language param localizes (opencage.rs:739-759)") {
    val r = ocFr.reverse(Seq((1L, 2.12870, 41.40139)).toDF("query_id", "lon", "lat"))
      .collect()
    assert(r.head.getAs[String]("formatted").endsWith("Barcelone, Espagne"))
  }

  test("GeoAdmin.forward pins limit 1 and swaps axes for sr=2056") {
    val q = Seq((1L, "Seftigenstrasse 264, 3084 Wabern")).toDF("query_id", "query")
    val wgs = ga.forward(q).collect()
    assert(wgs.length === 1)
    assert(wgs.head.getAs[Double]("x") === 7.451352119445801)
    val lv95 = gaLv95.forward(q).collect()
    assert(math.abs(lv95.head.getAs[Double]("x") - 2600968.75) < 5)
    assert(math.abs(lv95.head.getAs[Double]("y") - 1197427.0) < 5)
  }

  test("GeoAdmin.reverse returns None (null) when nothing within 50 m") {
    val r = ga.reverse(Seq((1L, -40.0, -40.0)).toDF("query_id", "lon", "lat"))
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("formatted") === null)
  }

  test("GeoAdmin.forward pins origins=address (geoadmin.rs:236): " +
      "gazetteer-only names return 0 rows") {
    // "Schwabing" resolves through OSM/OpenCage facades but is feature_class
    // 'gazetteer' — the reference's GeoAdmin::forward hardcodes
    // origins=address, so it must return no result here.
    val q = Seq((1L, "Schwabing, München")).toDF("query_id", "query")
    assert(ga.forward(q).count() === 0)
    assert(osm.forward(q).count() === 1)
  }

  test("unknown names return 0 rows, not an error") {
    assert(osm.forward(Seq((1L, "Atlantis Prime")).toDF("query_id", "query"))
      .count() === 0)
  }
}
