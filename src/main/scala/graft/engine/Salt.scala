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
    * two-path plan (salted join for hot keys, plain join for the long tail).
    *
    * Default is a SAMPLED estimate (deterministic seed, threshold scaled by
    * the sampling fraction): a hot key is by definition massively over the
    * threshold, so a 1% Bernoulli sample finds it with near-certainty while
    * the pre-join aggregation shuffles 1% of the rows instead of a full
    * scan's worth — at 100 TB the exact histogram would cost an extra full
    * scan + full shuffle before the join even starts. `sampleFraction <= 0`
    * selects the exact histogram. Misclassification is SAFE either way: the
    * two-path join returns identical rows regardless of which keys take the
    * salted path (proven by the q10_skew_salted oracle) — only skew
    * mitigation quality varies, and AQE skew-join backstops the tail path. */
  def hotKeys(df: DataFrame, key: String, threshold: Long,
              sampleFraction: Double = 0.01): DataFrame =
    if (sampleFraction <= 0.0 || sampleFraction >= 1.0)
      df.groupBy(key).count().filter(col("count") > threshold).select(key)
    else
      df.sample(withReplacement = false, sampleFraction, seed = 42L)
        .groupBy(key).count()
        .filter(col("count") > math.max(1L, (threshold * sampleFraction).toLong))
        .select(key)

  /** Two-path skew join: hot keys take the salted path, the tail joins
    * plainly; union of both. Standard skew-mitigation shape when one join
    * side is too big to replicate wholesale. */
  def skewAwareJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                    bigId: Column, hotThreshold: Long,
                    sampleFraction: Double = 0.01): DataFrame = {
    val hot = hotKeys(big, key, hotThreshold, sampleFraction).cache()
    val bigHot = big.join(broadcast(hot), Seq(key), "left_semi")
    val bigTail = big.join(broadcast(hot), Seq(key), "left_anti")
    val smallHot = small.join(broadcast(hot), Seq(key), "left_semi")
    val smallTail = small.join(broadcast(hot), Seq(key), "left_anti")
    saltedJoin(bigHot, smallHot, key, salts, bigId)
      .unionByName(bigTail.join(smallTail, Seq(key), "inner"))
  }
}
