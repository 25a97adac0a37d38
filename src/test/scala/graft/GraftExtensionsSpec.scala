package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{CellIndex, Geo}
import graft.text.TextCore

/** SparkSessionExtensions registration: the engine's scalar primitives
  * callable from pure SQL, lowering to the same codegen expressions. */
class GraftExtensionsSpec extends AnyFunSuite {

  /** A session WITH the extension, sharing the test SparkContext. */
  private lazy val ext: SparkSession = {
    SparkTestSession.spark // ensure the context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf, bound when the SparkContext is
    // created — on this shared test context the programmatic builder hook is
    // the way in (spark-submit deployments set the conf key instead)
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("SQL-surface functions agree with the pure-Scala core") {
    val r = ext.sql(
      """SELECT graft_cell_id(11.5884858D, 48.1700887D, 13),
        |  graft_cell_parent(graft_cell_id(11.5884858D, 48.1700887D, 13), 7),
        |  graft_haversine_m(2.1D, 41.4D, 2.2D, 41.5D),
        |  graft_tile_x(11.5884858D, 12), graft_tile_y(48.1700887D, 12),
        |  graft_geohash(11.5884858D, 48.1700887D, 9),
        |  graft_mercator_x(11.5884858D), graft_lv03_e(7.45D, 46.95D),
        |  graft_dms(48.1700887D, true), graft_simhash('hello world'),
        |  graft_morton(2117, 1458), graft_morton_x(graft_morton(2117, 1458)),
        |  graft_morton_y(graft_morton(2117, 1458))
        |""".stripMargin).head()
    val c13 = CellIndex.encode(11.5884858, 48.1700887, 13)
    assert(r.getLong(0) === c13)
    assert(r.getLong(1) === CellIndex.parent(c13, 7))
    assert(r.getDouble(2) === Geo.haversineM(2.1, 41.4, 2.2, 41.5))
    assert(r.getLong(3) === Geo.tileX(11.5884858, 12))
    assert(r.getLong(4) === Geo.tileY(48.1700887, 12))
    assert(r.getString(5) === Geo.geohash(11.5884858, 48.1700887, 9))
    assert(r.getDouble(6) === Geo.mercatorX(11.5884858))
    assert(r.getDouble(7) === Geo.wgs84ToLv03E(7.45, 46.95))
    assert(r.getString(8) === Geo.dms(48.1700887, isLat = true))
    assert(r.getLong(9) === TextCore.simhash("hello world"))
    assert(r.getLong(10) === Geo.morton(2117, 1458))
    assert(r.getLong(11) === 2117L)
    assert(r.getLong(12) === 1458L)
  }

  test("k_ring explodes in SQL and matches the core ring") {
    val c = CellIndex.encode(2.12870, 41.40139, 13)
    val got = ext.sql(s"SELECT explode(graft_k_ring(${c}L, 1))")
      .collect().map(_.getLong(0)).toSet
    assert(got === CellIndex.kRing(c, 1).toSet)
  }

  test("literal arguments constant-fold in the optimized plan") {
    val df = ext.sql("SELECT graft_cell_id(2.0D, 41.0D, 13) AS c")
    val optimized = df.queryExecution.optimizedPlan.toString
    // the StaticInvoke is deterministic + foldable: no function call survives
    assert(!optimized.contains("static_invoke"), optimized)
    assert(optimized.contains(CellIndex.encode(2.0, 41.0, 13).toString), optimized)
  }

  test("graft_resolve_url resolves dot segments from SQL") {
    val r = ext.sql("SELECT graft_resolve_url('https://h.example/a/b/p.html', " +
      "'../x?z=1') AS u").head()
    assert(r.getString(0) === "https://h.example/a/x?z=1")
  }

  test("text-family SQL functions: nfc, long_dot, html_text") {
    val r = ext.sql(
      // decomposed e + combining acute via Scala source escape — Spark's
      // chr() wraps at 256 so chr(769) cannot produce it
      "SELECT graft_nfc('cafe\u0301') AS n, " +
      "graft_long_dot(array(2L, 3L), array(5L, 7L)) AS d, " +
      "graft_html_text(CAST('<p>Hi &amp; bye</p>' AS BINARY)) AS t").head()
    assert(r.getString(0) === "caf\u00e9")
    assert(r.getLong(1) === 31L)
    assert(r.getString(2).trim === "Hi & bye")
  }

  test("wrong arity is rejected at analysis") {
    val e = intercept[Exception](ext.sql("SELECT graft_cell_id(1.0D)").collect())
    assert(e.getMessage.contains("graft_cell_id"), e.getMessage)
  }

  test("the base session without the extension does not see the functions") {
    val e = intercept[Exception](
      SparkTestSession.spark.sql("SELECT graft_cell_id(1.0D, 2.0D, 13)").collect())
    assert(e.getMessage.toLowerCase.contains("unresolved")
      || e.getMessage.contains("graft_cell_id"), e.getMessage)
  }
}
