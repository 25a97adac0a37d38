package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mirror-host detection — the crawl-dedup step ABOVE document granularity:
 * two hosts serving (nearly) the same content set are one logical site, and
 * collapsing them early saves every downstream stage the duplicate corpus.
 * Hosts pair through the content digests they share, scored by shared-count
 * and exact integral Jaccard over their digest sets.
 *
 * Scale safety (the part that matters at 10^12 pages): pairs are generated
 * ONLY through digests, and a digest served by more than `maxHostsPerDigest`
 * hosts is EXCLUDED up front — boilerplate content (empty pages, error
 * pages, parked-domain templates) appears on thousands of hosts and would
 * otherwise fan out d² pairs per digest; dropping it loses nothing because
 * ubiquitous content carries no mirror signal (same containment reasoning
 * as [[LinkGraph.coCitation]]'s out-degree cap). Within the cap the pair
 * fan-out per digest is ≤ (cap choose 2), so candidate volume is linear in
 * distinct digests.
 *
 * Intersection AND set sizes are both measured over the CAPPED universe
 * (post-exclusion digests): boilerplate carries no mirror signal, so it
 * must neither generate pairs nor dilute the Jaccard denominator — a true
 * mirror pair rich in shared boilerplate keeps its full score.
 *
 * @param minShared pairs sharing fewer digests are dropped (noise floor)
 * @return (host_a, host_b — canonical a < b, n_shared, na, nb — capped-set
 *         sizes, jaccard_ppm — exact integral |A∩B|·10^6 div |A∪B| over
 *         the capped sets)
 */
object Mirrors {

  def mirrorPairs(docs: DataFrame, hostCol: Column, digestCol: Column,
                  minShared: Int = 2, maxHostsPerDigest: Int = 16): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxHostsPerDigest >= 2,
      s"maxHostsPerDigest must be >= 2, got $maxHostsPerDigest")
    val hd = docs.select(hostCol.as("host"), digestCol.as("digest")).distinct()
    val fan = hd.groupBy("digest").agg(count(lit(1)).as("n_hosts"))
      .filter(col("n_hosts") <= maxHostsPerDigest)
      .select("digest")
    val kept = hd.join(fan, "digest")
    val sizes = kept.groupBy("host").agg(count(lit(1)).as("n_digests"))
    val pairs = kept.select(col("digest"), col("host").as("host_a"))
      .join(kept.select(col("digest"), col("host").as("host_b")), "digest")
      .filter(col("host_a") < col("host_b"))
      .groupBy("host_a", "host_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("host").as("host_a"), col("n_digests").as("na")),
        "host_a")
      .join(sizes.select(col("host").as("host_b"), col("n_digests").as("nb")),
        "host_b")
      .select(col("host_a"), col("host_b"), col("n_shared"),
        col("na"), col("nb"),
        expr("(n_shared * 1000000) div (na + nb - n_shared)")
          .as("jaccard_ppm"))
  }
}
