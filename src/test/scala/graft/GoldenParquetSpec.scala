package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Golden

/** Golden-Parquet parity gate: every engine run must reproduce the committed
  * golden/ results of the reference's 12 fixtures row-for-row (north_star:
  * identical coordinates, matched place names, tile assignments,
  * byte-identical extracted text per url). */
class GoldenParquetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("engine output equals committed golden parquet row-for-row") {
    val committed = spark.read.parquet("golden")
    val regenerated = Golden.build(spark)
    assert(committed.columns.sorted.toSeq === regenerated.columns.sorted.toSeq)
    val cols = committed.columns.sorted.map(org.apache.spark.sql.functions.col)
    val a = committed.select(cols: _*).orderBy("fixture_id").collect().toSeq
    val b = regenerated.select(cols: _*).orderBy("fixture_id").collect().toSeq
    assert(a === b)
    assert(a.size === 12)
  }

  test("golden rows carry the reference's expected values") {
    val g = Golden.build(spark).collect()
      .map(r => r.getAs[String]("fixture_id") -> r).toMap
    assert(g("osm_forward").getAs[Double]("x") === 11.5884858)
    assert(g("osm_forward").getAs[Double]("y") === 48.1700887)
    assert(g("oc_reverse").getAs[String]("formatted") ===
      "Carrer de Calatrava, 64, 08017 Barcelona, Spain")
    assert(g("oc_reverse_fr").getAs[String]("formatted") ===
      "Carrer de Calatrava, 64, 08017 Barcelone, Espagne")
    assert(math.abs(g("ga_forward_lv95").getAs[Double]("x") - 2600968.75) < 5)
    assert(g("ga_forward_full").getAs[String]("label") ===
      "Seftigenstrasse 264 <b>3084 Wabern</b>")
    assert(g("ga_reverse").getAs[String]("formatted") ===
      "Seftigenstrasse 264, 3084 Wabern")
    assert(g("oc_forward_full_nobox").getAs[String]("formatted") ===
      "Moabit, Berlin, Germany")
    // tile assignment parity: Schwabing at z12
    assert(g("osm_forward").getAs[Long]("tile_x") === 2179L)
    // byte-identity invariant: sha matches an independent digest of the text
    assert(g("osm_forward").getAs[String]("text_sha256") ===
      graft.geo.Geo.sha256Hex(graft.fixtures.Synth.fixtureTexts(0)))
  }
}
