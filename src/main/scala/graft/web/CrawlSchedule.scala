package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-host politeness scheduling over a crawl fetch log — the operational
 * twin of the RFC 9309 rule gate in [[Robots]] (reference scope: the
 * providers' published rate policies, e.g. openstreetmap.rs:6-7): given
 * observed fetch timestamps and a per-host crawl delay, report how often
 * the crawler violated the delay, the tightest observed inter-fetch gap,
 * and when each host may next be fetched.
 *
 * Plan shape: one hash partition by host feeds both the lag window and the
 * final aggregate (Catalyst reuses the exchange), so the whole operator is
 * a single shuffle on the host key — the only scalable layout for a
 * billion-row fetch log. Per-host state is O(1) and host cardinality is
 * tiny relative to fetch volume, so the result always fits.
 */
object CrawlSchedule {

  /** @param fetches  fetch log
    * @param host     host key column
    * @param tsUs     fetch time, epoch microseconds (integral)
    * @param tieBreak deterministic within-host order for equal timestamps
    * @param delayS   per-host crawl delay, whole seconds */
  def schedule(fetches: DataFrame, host: Column, tsUs: Column,
               tieBreak: Column, delayS: Column): DataFrame = {
    val w = Window.partitionBy(col("host")).orderBy(col("ts_us"), col("tie"))
    fetches
      .select(host.as("host"), tsUs.cast("long").as("ts_us"),
        tieBreak.as("tie"), delayS.cast("long").as("delay_s"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .groupBy(col("host"), col("delay_s"))
      .agg(
        count(lit(1)).as("n_fetches"),
        // first fetch of a host has NULL gap -> the WHEN is null -> 0
        sum(when(col("gap_us") < col("delay_s") * lit(1000000L), 1L)
          .otherwise(0L)).as("n_violations"),
        coalesce(min(col("gap_us")), lit(-1L)).as("min_gap_us"),
        max(col("ts_us")).as("last_fetch_us"))
      .withColumn("next_allowed_us",
        col("last_fetch_us") + col("delay_s") * lit(1000000L))
  }
}
