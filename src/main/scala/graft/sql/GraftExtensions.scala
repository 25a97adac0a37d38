package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

import graft.functions.{GeoInternal, TextInternal}
import graft.geo.{CellIndex, Geo}

/**
 * SparkSessionExtensions entry point: registers the engine's scalar spatial /
 * sketch primitives as SQL functions, so a pure-SQL user (spark.sql, JDBC,
 * SQL files) can call the same codegen expressions the DataFrame API uses —
 * no UDF registration, no SerDe, identical bits.
 *
 * Install with either
 *   .config("spark.sql.extensions", "graft.sql.GraftExtensions")
 * on the session builder, or spark-submit --conf of the same key (the
 * standard extension mechanism, SPARK-18127).
 *
 * Every function lowers to the SAME StaticInvoke expressions as
 * graft.functions.GeoFunctions / TextFunctions — deterministic, null-safe,
 * constant-folding, whole-stage-codegen capable. SQL surface:
 *
 *   graft_cell_id(lon, lat, level)       -> BIGINT cell id (E3)
 *   graft_cell_parent(cell, level)       -> BIGINT coarser cell
 *   graft_cell_lon(cell) / graft_cell_lat(cell) -> DOUBLE center
 *   graft_k_ring(cell, r)                -> ARRAY<BIGINT> (E6 expansion)
 *   graft_haversine_m(lo1, la1, lo2, la2)-> DOUBLE great-circle meters
 *   graft_tile_x(lon, z) / graft_tile_y(lat, z) -> BIGINT web-mercator tile
 *   graft_geohash(lon, lat, precision)   -> STRING (E8 annotation)
 *   graft_mercator_x(lon) / graft_mercator_y(lat) -> DOUBLE EPSG:3857
 *   graft_lv03_e(lon, lat) / graft_lv03_n(lon, lat) -> DOUBLE Swiss LV03 (C3)
 *   graft_dms(value, is_lat)             -> STRING degrees-minutes-seconds
 *   graft_simhash(text)                  -> BIGINT 64-bit simhash
 *   graft_nfc(text)                      -> STRING Unicode NFC normalization
 *   graft_long_dot(a, b)                 -> BIGINT exact scaled-integer dot
 *   graft_html_text(html)                -> STRING visible text from HTML bytes
 *   graft_resolve_url(base, href)        -> STRING RFC 3986 reference resolution
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private val cellCls = CellIndex.getClass
  private val geoCls = Geo.getClass
  private val internCls = GeoInternal.getClass
  private val textCls = TextInternal.getClass

  /** `sig` is the target JVM method's declared parameter types; every SQL
    * argument is wrapped in a Cast to its slot so natural calls with integer
    * literals (`graft_haversine_m(0, 0, 1, 1)`) coerce the way builtin
    * functions do instead of failing StaticInvoke method resolution
    * (ADVICE r4). Identity casts are erased by Catalyst's SimplifyCasts. */
  private def fn(name: String, sig: Seq[DataType], usage: String)
                (build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val checked: Seq[Expression] => Expression = { args =>
      require(args.length == sig.length,
        s"$name expects ${sig.length} arguments, got ${args.length}")
      build(args.zip(sig).map { case (e, dt) => Cast(e, dt) })
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      checked)
  }

  private val D = DoubleType
  private val L = LongType
  private val I = IntegerType

  /** All registered (identifier, info, builder) triples. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fn("graft_cell_id", Seq(D, D, I), "cell id of (lon, lat) at level") { a =>
      StaticInvoke(cellCls, LongType, "encode", a, returnNullable = false)
    },
    fn("graft_cell_parent", Seq(L, I), "parent cell at a coarser level") { a =>
      StaticInvoke(cellCls, LongType, "parent", a, returnNullable = false)
    },
    fn("graft_cell_lon", Seq(L), "cell center longitude") { a =>
      StaticInvoke(cellCls, DoubleType, "centerLon", a, returnNullable = false)
    },
    fn("graft_cell_lat", Seq(L), "cell center latitude") { a =>
      StaticInvoke(cellCls, DoubleType, "centerLat", a, returnNullable = false)
    },
    fn("graft_k_ring", Seq(L, I), "cells within Chebyshev radius r") { a =>
      StaticInvoke(internCls, ArrayType(LongType, containsNull = false),
        "kRing", a, returnNullable = false)
    },
    fn("graft_haversine_m", Seq(D, D, D, D), "great-circle meters") { a =>
      StaticInvoke(geoCls, DoubleType, "haversineM", a, returnNullable = false)
    },
    fn("graft_tile_x", Seq(D, I), "web-mercator tile x at zoom z") { a =>
      StaticInvoke(geoCls, LongType, "tileX", a, returnNullable = false)
    },
    fn("graft_tile_y", Seq(D, I), "web-mercator tile y at zoom z") { a =>
      StaticInvoke(geoCls, LongType, "tileY", a, returnNullable = false)
    },
    fn("graft_morton", Seq(L, L), "Morton/Z-order interleave of tile coords") { a =>
      StaticInvoke(geoCls, LongType, "morton", a, returnNullable = false)
    },
    fn("graft_morton_x", Seq(L), "x component of a Morton code") { a =>
      StaticInvoke(geoCls, LongType, "mortonX", a, returnNullable = false)
    },
    fn("graft_morton_y", Seq(L), "y component of a Morton code") { a =>
      StaticInvoke(geoCls, LongType, "mortonY", a, returnNullable = false)
    },
    fn("graft_geohash", Seq(D, D, I), "geohash of (lon, lat) at precision") { a =>
      StaticInvoke(internCls, StringType, "geohash", a, returnNullable = false)
    },
    fn("graft_mercator_x", Seq(D), "EPSG:3857 x meters") { a =>
      StaticInvoke(geoCls, DoubleType, "mercatorX", a, returnNullable = false)
    },
    fn("graft_mercator_y", Seq(D), "EPSG:3857 y meters") { a =>
      StaticInvoke(geoCls, DoubleType, "mercatorY", a, returnNullable = false)
    },
    fn("graft_lv03_e", Seq(D, D), "Swiss LV03 easting") { a =>
      StaticInvoke(geoCls, DoubleType, "wgs84ToLv03E", a, returnNullable = false)
    },
    fn("graft_lv03_n", Seq(D, D), "Swiss LV03 northing") { a =>
      StaticInvoke(geoCls, DoubleType, "wgs84ToLv03N", a, returnNullable = false)
    },
    fn("graft_dms", Seq(D, BooleanType), "degrees-minutes-seconds string") { a =>
      StaticInvoke(internCls, StringType, "dms", a, returnNullable = false)
    },
    fn("graft_simhash", Seq(StringType), "64-bit simhash of text") { a =>
      StaticInvoke(textCls, LongType, "simhash", a, returnNullable = false)
    },
    fn("graft_nfc", Seq(StringType), "Unicode NFC normalization (UAX #15)") { a =>
      StaticInvoke(textCls, StringType, "nfc", a, returnNullable = false)
    },
    fn("graft_long_dot", Seq(ArrayType(LongType), ArrayType(LongType)),
        "exact dot product of two scaled-integer vectors") { a =>
      StaticInvoke(textCls, LongType, "longDot", a, returnNullable = false)
    },
    fn("graft_html_text", Seq(BinaryType), "HTML bytes -> visible text") { a =>
      StaticInvoke(textCls, StringType, "htmlText", a, returnNullable = false)
    },
    fn("graft_resolve_url", Seq(StringType, StringType),
        "RFC 3986 reference resolution of href against an absolute base") { a =>
      StaticInvoke(textCls, StringType, "resolveUrl", a, returnNullable = false)
    })
}
