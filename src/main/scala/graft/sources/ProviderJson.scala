package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * D4/S4/S5/S6 — typed ingestion of provider-shaped response JSON, and the
 * inverse Vec-shape reconstruction (SURVEY.md §1.3): the reference decodes
 * provider JSON into serde structs; we map the same documents onto Spark
 * schemas with `from_json`, one output row per result (exploded, order
 * preserved in `result_rank`), recoverable back into the response shape via
 * sort_array(collect_list(struct(...))).
 *
 * Schema provenance (reference structs):
 *  - Nominatim GeoJSON: /root/reference/src/openstreetmap.rs:284-347
 *  - OpenCage:          /root/reference/src/opencage.rs:550-673
 *  - GeoAdmin:          /root/reference/src/geoadmin.rs:357-446
 */
object ProviderJson {

  // ---- Nominatim (GeoJSON FeatureCollection) -------------------------------

  /** AddressDetails — openstreetmap.rs:321-337 (all Option<String>). */
  val addressDetailsSchema: StructType = StructType(Seq(
    "city", "city_district", "construction", "continent", "country",
    "country_code", "house_number", "neighbourhood", "postcode",
    "public_building", "state", "suburb", "road", "village"
  ).map(StructField(_, StringType, nullable = true)))

  val nominatimSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("licence", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", StructType(Seq(
        StructField("place_id", LongType),          // u64 -> Long, §1.3
        StructField("osm_type", StringType),
        StructField("osm_id", LongType),
        StructField("display_name", StringType),
        StructField("place_rank", LongType),
        StructField("category", StringType),
        StructField("type", StringType),
        StructField("importance", DoubleType),
        StructField("address", addressDetailsSchema, nullable = true)))),
      StructField("bbox", ArrayType(DoubleType)),   // (T,T,T,T)
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(DoubleType)))))))))))

  /** One row per feature, provider order preserved as result_rank (1-based);
    * coordinates projected to flat lon/lat (GeoJSON order is [lon, lat]). */
  def parseNominatim(df: DataFrame, jsonCol: Column): DataFrame =
    df.withColumn("__resp", from_json(jsonCol, nominatimSchema))
      .select(col("*"),
        posexplode(col("__resp.features")).as(Seq("__pos", "feature")))
      .withColumn("result_rank", col("__pos") + 1)
      .withColumn("licence", col("__resp.licence"))
      .withColumn("place_id", col("feature.properties.place_id"))
      .withColumn("osm_id", col("feature.properties.osm_id"))
      .withColumn("display_name", col("feature.properties.display_name"))
      .withColumn("place_rank", col("feature.properties.place_rank"))
      .withColumn("importance", col("feature.properties.importance"))
      .withColumn("address", col("feature.properties.address"))
      .withColumn("lon", col("feature.geometry.coordinates")(0))
      .withColumn("lat", col("feature.geometry.coordinates")(1))
      .withColumn("bbox", struct(
        col("feature.bbox")(0).as("minLon"), col("feature.bbox")(1).as("minLat"),
        col("feature.bbox")(2).as("maxLon"), col("feature.bbox")(3).as("maxLat")))
      .drop("__resp", "__pos", "feature")

  /** Vec-shape recovery: rows -> OpenstreetmapResponse-shaped struct per
    * group key (collect_list over result_rank order, §1.3). */
  def toNominatimResponse(results: DataFrame, groupCols: Seq[String]): DataFrame =
    results.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col("result_rank"), col("place_id"), col("display_name"),
        col("lon"), col("lat")))).as("features"))
      .withColumn("type", lit("FeatureCollection"))

  // ---- OpenCage --------------------------------------------------------------

  /** components is an open-world HashMap<String, Value> (opencage.rs:571);
    * MapType(String, String) + Spark's lenient JSON string coercion covers
    * the reference's deserialize_string_or_int (opencage.rs:73-88). */
  val opencageSchema: StructType = StructType(Seq(
    StructField("documentation", StringType),
    StructField("status", StructType(Seq(
      StructField("message", StringType),
      StructField("code", IntegerType)))),            // i16 -> Int
    StructField("rate", MapType(StringType, IntegerType), nullable = true),
    StructField("total_results", IntegerType),
    StructField("timestamp", StructType(Seq(
      StructField("created_http", StringType),
      StructField("created_unix", LongType)))),       // UnixTime(i64)
    StructField("results", ArrayType(StructType(Seq(
      StructField("annotations", MapType(StringType, StringType), nullable = true),
      StructField("bounds", StructType(Seq(
        StructField("northeast", MapType(StringType, DoubleType)),
        StructField("southwest", MapType(StringType, DoubleType)))), nullable = true),
      StructField("components", MapType(StringType, StringType)),
      StructField("confidence", IntegerType),         // i8 -> Int
      StructField("formatted", StringType),
      StructField("geometry", MapType(StringType, DoubleType))))))))

  /** One row per result; geometry map keys lat/lng -> flat lon/lat columns
    * (opencage.rs:412); created_unix -> TimestampType (S5). */
  def parseOpencage(df: DataFrame, jsonCol: Column): DataFrame =
    df.withColumn("__resp", from_json(jsonCol, opencageSchema))
      .withColumn("status_code", col("__resp.status.code"))
      .withColumn("total_results", col("__resp.total_results"))
      .withColumn("remaining_calls", element_at(col("__resp.rate"), "remaining"))
      .withColumn("created_ts",
        to_timestamp(from_unixtime(col("__resp.timestamp.created_unix"))))
      .select(col("*"),
        posexplode(col("__resp.results")).as(Seq("__pos", "result")))
      .withColumn("result_rank", col("__pos") + 1)
      .withColumn("formatted", col("result.formatted"))
      .withColumn("confidence", col("result.confidence"))
      .withColumn("components", col("result.components"))
      .withColumn("lon", element_at(col("result.geometry"), "lng"))
      .withColumn("lat", element_at(col("result.geometry"), "lat"))
      .drop("__resp", "__pos", "result")

  // ---- GeoAdmin ---------------------------------------------------------------

  /** Forward SearchServer response — geoadmin.rs:357-389. x,y are projected
    * LV coordinates alongside WGS84 lat/lon. */
  val geoAdminForwardSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("weight", LongType),
      StructField("attrs", StructType(Seq(
        StructField("origin", StringType),
        StructField("geom_quadindex", StringType),
        StructField("weight", LongType),
        StructField("rank", LongType),
        StructField("detail", StringType),
        StructField("lat", DoubleType),
        StructField("lon", DoubleType),
        StructField("num", LongType),
        StructField("x", DoubleType),
        StructField("y", DoubleType),
        StructField("label", StringType),
        StructField("zoomlevel", LongType))))))))))

  /** Reverse identify response — geoadmin.rs:411-446; camelCase field names
    * (featureId, layerBodId, layerName) preserved via schema (S6);
    * strname/strsp are the reference's only array-typed fields. */
  val geoAdminReverseSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(StructType(Seq(
      StructField("featureId", StringType),
      StructField("layerBodId", StringType),
      StructField("layerName", StringType),
      StructField("properties", StructType(Seq(
        StructField("egid", StringType),
        StructField("ggdenr", LongType),
        StructField("ggdename", StringType),
        StructField("gdekt", StringType),
        StructField("dplz4", LongType),
        StructField("dplzname", StringType),
        StructField("strname", ArrayType(StringType)),
        StructField("strsp", ArrayType(StringType)),
        StructField("strname_deinr", StringType),
        StructField("label", StringType))))))))))

  def parseGeoAdminForward(df: DataFrame, jsonCol: Column): DataFrame =
    df.withColumn("__resp", from_json(jsonCol, geoAdminForwardSchema))
      .select(col("*"), posexplode(col("__resp.results")).as(Seq("__pos", "result")))
      .withColumn("result_rank", col("__pos") + 1)
      .withColumn("result_id", col("result.id"))
      .withColumn("label", col("result.attrs.label"))
      .withColumn("origin", col("result.attrs.origin"))
      .withColumn("num", col("result.attrs.num"))
      .withColumn("rank", col("result.attrs.rank"))
      .withColumn("weight", col("result.attrs.weight"))
      .withColumn("lon", col("result.attrs.lon"))
      .withColumn("lat", col("result.attrs.lat"))
      .withColumn("x", col("result.attrs.x"))
      .withColumn("y", col("result.attrs.y"))
      .drop("__resp", "__pos", "result")

  def parseGeoAdminReverse(df: DataFrame, jsonCol: Column): DataFrame =
    df.withColumn("__resp", from_json(jsonCol, geoAdminReverseSchema))
      .select(col("*"), posexplode(col("__resp.results")).as(Seq("__pos", "result")))
      .withColumn("result_rank", col("__pos") + 1)
      .withColumn("featureId", col("result.featureId"))
      .withColumn("layerBodId", col("result.layerBodId"))
      .withColumn("strname_deinr", col("result.properties.strname_deinr"))
      .withColumn("dplz4", col("result.properties.dplz4"))
      .withColumn("dplzname", col("result.properties.dplzname"))
      .withColumn("strname", col("result.properties.strname"))
      .withColumn("formatted", concat(col("result.properties.strname_deinr"),
        lit(", "), col("result.properties.dplz4").cast("string"), lit(" "),
        col("result.properties.dplzname")))
      .drop("__resp", "__pos", "result")
}
