package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{DictScanner, Extract}
import graft.model.{ForwardParams, ReverseParams}

/**
 * The flagship end-to-end job (north_star): pages -> mention/coordinate
 * extraction -> forward geocode (name mentions x broadcast gazetteer) +
 * reverse geocode (coordinate literals x polygon PIP) -> web-mercator tile
 * assignment. One scan of pages, two broadcast joins, one union; the only
 * shuffles are the per-(url, mention) top-k window and the optional tile
 * rollup. Every output row carries text_sha256 (byte-identity invariant).
 *
 * Stage boundaries can checkpoint (E10) via cfg.ckptDir — each stage then
 * resumes idempotently from Parquet + lineage.
 */
object Pipeline {

  case class Config(
      tileZ: Int = 12,
      ckptDir: Option[String] = None,
      runId: String = "run",
      fwdParams: ForwardParams = ForwardParams(limit = Some(1)),
      revParams: ReverseParams = ReverseParams())

  private def maybeStage(spark: SparkSession, cfg: Config, name: String)
                        (build: => DataFrame): DataFrame =
    cfg.ckptDir match {
      case Some(dir) => Checkpoint.stage(spark, dir, name, cfg.runId)(build)
      case None => build
    }

  /** Geocoded hits: one row per (url, mention) with resolved coordinates.
    * verb='forward' rows resolve name mentions to gazetteer places;
    * verb='reverse' rows resolve coordinate literals to admin polygons. */
  def geocode(spark: SparkSession, pages: DataFrame, nameIndex: DataFrame,
              polygons: DataFrame, polyCells: DataFrame, scanner: DictScanner,
              cfg: Config = Config()): DataFrame = {

    // Both the forward and reverse branches consume mentions. Checkpointed
    // runs re-read the stage Parquet; un-checkpointed runs persist the
    // extraction so pages are scanned (and the extraction UDF run) exactly
    // once — at 10^12-page scale this is the checkpoint path anyway.
    val mentions = cfg.ckptDir match {
      case Some(_) => maybeStage(spark, cfg, "mentions") {
        Extract.mentions(spark, pages, scanner)
      }
      case None if sys.env.contains("GRAFT_NO_MENTION_CACHE") =>
        Extract.mentions(spark, pages, scanner)
      case None => Extract.mentions(spark, pages, scanner)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }

    val fwd = maybeStage(spark, cfg, "forward") {
      Forward.geocodeMentions(mentions, nameIndex, cfg.fwdParams)
        .select(col("url"), col("warc_ts"), col("lang"), col("text_sha256"),
          col("surface"), lit("forward").as("verb"),
          col("name"), col("place_id").as("ref_id"),
          col("lon"), col("lat"), col("formatted"))
    }

    val rev = maybeStage(spark, cfg, "reverse") {
      val coords = mentions.filter(col("kind") === "coord")
        // query_id = the (url, literal) pair; keep page context alongside
        .select(concat_ws("|", col("url"), col("surface")).as("query_id"),
          col("url"), col("warc_ts"), col("lang"), col("text_sha256"),
          col("surface"), col("lon"), col("lat"))
      Reverse.reverse(coords, polygons, polyCells, cfg.revParams)
        .filter(col("geocode_status") === "ok")
        .select(col("url"), col("warc_ts"), col("lang"), col("text_sha256"),
          col("surface"), lit("reverse").as("verb"),
          col("name"), col("polygon_id").as("ref_id"),
          col("lon"), col("lat"), col("formatted"))
    }

    maybeStage(spark, cfg, "hits") {
      Tiler.assign(fwd.unionByName(rev), cfg.tileZ)
    }
  }

  /** Per-tile rollup of the geocoded hits (E7 aggregation). */
  def tiles(hits: DataFrame): DataFrame =
    hits.groupBy("tile_z", "tile_x", "tile_y")
      .agg(count(lit(1)).as("n_hits"),
        approx_count_distinct(col("url")).as("approx_pages"))
}
