package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * E9 — explicit skew handling for hot cells (dense urban buckets).
 *
 * Two layers, both used:
 *  1. AQE skew-join splitting (spark.sql.adaptive.skewJoin) — belt and braces,
 *     enabled in every session the engine builds.
 *  2. Explicit salting for the cell-keyed shuffle joins whose key histogram
 *     is known to be power-law (world city cells): the big side gets a
 *     deterministic salt from a row-identity column, the small side is
 *     replicated `salts` times. Join key becomes (key, salt) — hot keys fan
 *     out across `salts` reducers.
 */
object Salt {

  /** Deterministic salt in [0, salts) from a row-identity column. */
  def saltCol(idCol: Column, salts: Int): Column =
    pmod(xxhash64(idCol), lit(salts.toLong)).cast("int")

  /** Salted equi-join: big ⨝ small on `key`, skew-spread over `salts`
    * buckets. `bigId` must be a deterministic row identity on the big side
    * (e.g. url) so resumed runs salt identically. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 bigId: Column, joinType: String = "inner"): DataFrame = {
    val b = big.withColumn("__salt", saltCol(bigId, salts))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Hot-key histogram: keys whose row count exceeds `threshold` — feeds a
    * two-path plan (salted join for hot keys, plain join for the long tail). */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(key).count().filter(col("count") > threshold).select(key)

  /** Two-path skew join: hot keys take the salted path, the tail joins
    * plainly; union of both. Standard skew-mitigation shape when one join
    * side is too big to replicate wholesale. */
  def skewAwareJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                    bigId: Column, hotThreshold: Long): DataFrame = {
    val hot = hotKeys(big, key, hotThreshold).cache()
    val bigHot = big.join(broadcast(hot), Seq(key), "left_semi")
    val bigTail = big.join(broadcast(hot), Seq(key), "left_anti")
    val smallHot = small.join(broadcast(hot), Seq(key), "left_semi")
    val smallTail = small.join(broadcast(hot), Seq(key), "left_anti")
    saltedJoin(bigHot, smallHot, key, salts, bigId)
      .unionByName(bigTail.join(smallTail, Seq(key), "inner"))
  }
}
