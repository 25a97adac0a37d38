package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Count-Min frequency sketch — the bounded-memory heavy-hitter counter
 * for item streams whose distinct domain (n-grams, URLs, hosts) is too
 * wide to count exactly. depth x width cells, each cell the count of
 * items hashing to it; an item's estimate is the MIN over its depth
 * cells, so estimates NEVER undercount (cm_est >= true count, with
 * overcount bounded by collisions ~ total/width per row).
 *
 * Built on the PORTABLE sha60 hash family ("cm:<row>:<item>"), so an
 * external engine rebuilds every cell and every estimate bit-for-bit —
 * same contract as the KMV / MinHash / SimHash portable sketches.
 *
 * Scale shape: sketch construction is ONE combinable count aggregate over
 * depth x |input| map-side-generated (row, col) pairs; the materialized
 * sketch is depth*width rows REGARDLESS of input size, so estimation
 * joins broadcast the sketch, never the stream.
 */
object CountMin {

  /** The depth hash cells of one item as array[(cm_row, cm_col)]. */
  private def cellsOf(item: Column, depth: Int, width: Int): Column =
    transform(sequence(lit(0), lit(depth - 1)), r =>
      pmod(TextFunctions.sha60(
        concat(lit("cm:"), r.cast("string"), lit(":"), item)), lit(width.toLong)))

  /** Build the sketch: one row per touched cell, (cm_row: int, cm_col:
    * long, cm_cnt: long). Items count with multiplicity. */
  def sketch(items: DataFrame, item: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    items.select(posexplode(cellsOf(item, depth, width)).as(Seq("cm_row", "cm_col")))
      .groupBy("cm_row", "cm_col")
      .agg(count(lit(1)).as("cm_cnt"))
  }

  /** Merge sketches built with the SAME (depth, width, hash family) by
    * summing cells — the property that makes the sketch usable at fleet
    * scale: per-shard/per-day sketches combine into the corpus sketch
    * without touching the streams again. merge(sketch(A), sketch(B)) ==
    * sketch(A ++ B) exactly (cell-for-cell, not just estimate-for-estimate). */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("cm_row", "cm_col")
      .agg(sum("cm_cnt").as("cm_cnt"))
  }

  /** Point estimates for candidate items against a built sketch: min over
    * the item's depth cells. The sketch side is bounded (depth*width rows)
    * and broadcast; candidates never shuffle. Candidates absent from the
    * stream still estimate (their cells exist iff anything collided; a
    * fully untouched cell row is absent => treated as 0 via left join). */
  def estimate(sketchDf: DataFrame, candidates: DataFrame, item: Column,
               depth: Int, width: Int): DataFrame =
    candidates.select(item.as("item"))
      .select(col("item"),
        posexplode(cellsOf(col("item"), depth, width)).as(Seq("cm_row", "cm_col")))
      .join(broadcast(sketchDf), Seq("cm_row", "cm_col"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cm_cnt"), lit(0L))).as("cm_est"))
}
