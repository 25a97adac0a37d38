package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * KMV (k-minimum-values) distinct-count sketch — the deterministic
 * cardinality estimator for per-group distinct counts at crawl scale,
 * where exact countDistinct shuffles every distinct value and
 * approx_count_distinct's HLL buckets are engine-private (not
 * oracle-comparable).
 *
 * KMV keeps the k smallest values of a uniform hash per group; with h_k
 * the k-th minimum over a hash domain of size D, the classic estimator is
 * (k-1) * D / h_k. Built on the PORTABLE sha60 hash (the same
 * conv(substring(sha2..)) family every sketch oracle uses), every number
 * here — hashes, k-th minimum, and the rounded estimate — is reproducible
 * bit-for-bit by an external engine.
 */
object Kmv {

  /** sha60's hash domain size, as an exactly-representable double (2^60). */
  val Domain: Double = 1152921504606846976.0

  /**
   * Per-key distinct-count sketch over `valueCol`.
   *
   * Scale shape: hash values map-side, collapse to distinct (key, hash) —
   * the only full-width shuffle, same as exact distinct — then the
   * per-key k-minimum selection runs over narrow (key, long) rows. The
   * contract shape uses a rank window for the k smallest; at world scale
   * the selection becomes a combinable bounded-heap aggregate, with the
   * estimator unchanged. Groups with fewer than k distinct values report
   * their EXACT count (the sketch is lossless below k).
   *
   * @return (key, kmv_k: int — values retained (< k means exact),
   *          h_k: long — k-th minimum hash, est_distinct: long,
   *          n_exact: long — exact distinct count for error inspection;
   *          drop it at crawl scale, it is the expensive one)
   */
  def kmvDistinct(df: DataFrame, keyCol: Column, valueCol: Column,
                  k: Int = 16): DataFrame = {
    require(k >= 2, "kmvDistinct needs k >= 2")
    val hashed = df.select(keyCol.as("key"), TextFunctions.sha60(valueCol).as("h"))
      .distinct()
    val w = Window.partitionBy(col("key")).orderBy(col("h"))
    val exact = hashed.groupBy("key").agg(count(lit(1)).as("n_exact"))
    hashed.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("key")
      .agg(count(lit(1)).cast("int").as("kmv_k"), max(col("h")).as("h_k"))
      .withColumn("est_distinct",
        when(col("kmv_k") < k, col("kmv_k").cast("long"))
          .otherwise(round(lit((k - 1).toDouble) * lit(Domain) / col("h_k"))
            .cast("long")))
      .join(exact, Seq("key"))
  }

  /**
   * Corpus-overlap (resemblance/Jaccard) estimate between two document
   * sets from one shared k-minimum-values sketch (Broder 1997): the k
   * smallest sha60 hashes of the UNION are a uniform sample of the union,
   * so the fraction of them present in BOTH sides estimates J(A, B). The
   * snapshot-diff scalar of a recrawl pipeline ("how much of the new crawl
   * is the old crawl"), at sketch cost — each side contributes only its
   * distinct hashes, the selection is a TakeOrdered over narrow longs, and
   * two broadcast-size semi-join probes finish it. Exact below k union
   * values; every number integer-derived, replayable anywhere.
   *
   * @return one row (k_used: long, n_both: long, jaccard_est: double)
   */
  def kmvJaccard(a: DataFrame, b: DataFrame, valueCol: Column,
                 k: Int = 256): DataFrame = {
    require(k >= 2, "kmvJaccard needs k >= 2")
    val ha = a.select(TextFunctions.sha60(valueCol).as("h")).distinct().persist()
    val hb = b.select(TextFunctions.sha60(valueCol).as("h")).distinct().persist()
    val unionK = ha.unionByName(hb).distinct()
      .orderBy(col("h").asc).limit(k)
    val flags = unionK
      .join(ha.withColumn("in_a", lit(1)), Seq("h"), "left")
      .join(hb.withColumn("in_b", lit(1)), Seq("h"), "left")
    val out = flags.agg(
      count(lit(1)).as("k_used"),
      sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
        .otherwise(0L)).as("n_both"))
      .select(col("k_used"), col("n_both"),
        round(col("n_both").cast("double") / col("k_used").cast("double"), 6)
          .as("jaccard_est"))
      .persist()
    out.count()
    ha.unpersist(); hb.unpersist()
    out
  }
}
