package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sketch.Hll

/**
 * Streaming sketch maintenance: each micro-batch contributes its PARTIAL
 * HLL register table to an append-only sink; the live distinct estimate at
 * any point is the cell-max merge of everything appended so far. This is
 * the continuous-ingest shape a crawl pipeline actually runs — per-batch
 * state is constant-size per key (64 registers), the sink only ever
 * APPENDS (no streaming-aggregation state store, no update/complete mode),
 * and the merge is idempotent/commutative/associative, so replayed or
 * reordered batches cannot corrupt the estimate. Restart safety comes from
 * the checkpointed source offsets; a re-run batch re-appends identical
 * registers, which max-merge absorbs.
 */
object StreamSketch {

  /**
   * Start an AvailableNow (or caller-triggered) stream that appends one
   * partial register table per micro-batch, tagged with `batch_id`.
   * Columns written: (key, bucket, reg, batch_id).
   */
  def hllPartials(src: DataFrame, keyCol: Column, valueCol: Column,
                  sinkPath: String, checkpointPath: String,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Hll.registers(batch, keyCol, valueCol)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(sinkPath)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()

  /** Fold an appended partial-register sink into per-key estimates
    * (max-merge + the standard HLL estimation chain). */
  def estimateFromPartials(partials: DataFrame): DataFrame =
    Hll.estimate(Hll.merge(partials.select("key", "bucket", "reg")))

  /**
   * Streaming Count-Min maintenance — the heavy-hitter sibling of
   * [[hllPartials]]: each micro-batch appends its PARTIAL sketch cells
   * (cm_row, cm_col, cm_cnt, batch_id); the live sketch at any point is
   * the cell-SUM merge of everything appended so far, and
   * `CountMin.merge(partials) == CountMin.sketch(whole stream)` EXACTLY
   * (cell-for-cell), because the sketch is a pure count aggregate. Same
   * restart story: constant-size per-batch state (depth×width cells max),
   * append-only sink, no streaming state store; checkpointed offsets keep
   * a batch from double-appending.
   */
  def cmPartials(src: DataFrame, itemCol: Column, depth: Int, width: Int,
                 sinkPath: String, checkpointPath: String,
                 trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sketch.CountMin.sketch(batch, itemCol, depth, width)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(sinkPath)
      }
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .start()
}
