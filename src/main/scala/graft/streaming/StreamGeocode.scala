package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Forward, Tiler}
import graft.etl.{DictScanner, Extract}
import graft.functions.GeoFunctions
import graft.model.ForwardParams

/**
 * Structured-Streaming surface for the engine.
 *
 * The reference is strictly synchronous request/response — no streaming
 * semantics exist to replicate (SURVEY.md §2.8) — but forward geocoding is a
 * stateless map + broadcast join, so the batch operators lift onto
 * `readStream` unchanged. This module proves that property: the same
 * Extract/Forward code paths run under micro-batches; the only
 * streaming-specific piece is the top-1 selection, which becomes a
 * watermark + event-time-window max_by (batch row_number windows are not
 * streamable), and the watermarked per-window tile rollup.
 */
object StreamGeocode {

  /** Streaming pages -> per-(window, url, mention) best geocode candidate.
    * `pages` is a streaming DataFrame with the input_hint schema. Append-mode
    * safe: state is bounded by the 10-minute watermark on warc_ts. */
  def geocodeStream(spark: SparkSession, pages: DataFrame, nameIndex: DataFrame,
                    scanner: DictScanner,
                    params: ForwardParams = ForwardParams()): DataFrame = {
    val mentions = Extract.mentions(spark, pages, scanner)
      .filter(col("kind") === "name").drop("lon", "lat")
    val cand = Forward.candidates(mentions, nameIndex, params).drop("gaz_key")
    val best = cand
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "5 minutes"), col("url"), col("surface"))
      .agg(max_by(
        struct(col("name"), col("place_id"), col("lon"), col("lat"),
          col("country_code"), col("text_sha256")),
        struct(col("weight"), col("importance"), -col("place_id"))).as("best"))
      .select(col("window"), col("url"), col("surface"),
        col("best.name").as("name"), col("best.place_id").as("place_id"),
        col("best.lon").as("lon"), col("best.lat").as("lat"),
        col("best.country_code").as("country_code"),
        col("best.text_sha256").as("text_sha256"))
    best.withColumn("tile_z", lit(12))
      .withColumn("tile_x", GeoFunctions.tileX(col("lon"), lit(12)))
      .withColumn("tile_y", GeoFunctions.tileY(col("lat"), lit(12)))
  }

  /** Watermarked sliding-window tile counts over a stream of raw hits
    * (lon/lat/warc_ts) — the streaming twin of Tiler.aggregate. */
  def tileCounts(hits: DataFrame): DataFrame =
    Tiler.assign(hits, z = 12)
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "5 minutes"), col("tile_z"),
        col("tile_x"), col("tile_y"))
      .agg(count(lit(1)).as("n_hits"))
}
