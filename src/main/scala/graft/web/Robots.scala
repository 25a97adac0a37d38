package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.etl.UrlOps

/**
 * Robots-exclusion (REP) politeness filtering — the gate every crawl
 * pipeline applies between URL discovery and fetch scheduling. The
 * reference's providers fetch URLs directly (openstreetmap.rs /
 * opencage.rs request builders) and leave politeness to the server's
 * rate limiter; a corpus-scale crawler has to decide fetchability
 * offline, per URL, against each host's parsed rule set.
 *
 * Semantics = the de-facto REP standard (RFC 9309): among the rules of
 * the URL's host whose path-prefix matches, the LONGEST prefix wins;
 * on a length tie Allow beats Disallow; no matching rule means allowed.
 * One extra determinism guarantee on top of the RFC: a same-length
 * same-verdict tie resolves to the lexicographically smallest prefix,
 * so `matched_prefix` is reproducible at any parallelism.
 *
 * Scale shape: a host's parsed robots.txt is tiny and the host set is
 * many orders of magnitude smaller than the URL set, so the compiled
 * per-host rule arrays BROADCAST and the whole operator is ONE
 * BroadcastHashJoin plus a per-row fold over the (bounded) rule array —
 * the URL side stays map-only with zero shuffles at any corpus size.
 */
object Robots {

  /** Group a (host, prefix, allow) rule table into one broadcastable
    * row per host carrying its rule array. */
  def compile(rules: DataFrame): DataFrame =
    rules.groupBy(col("host")).agg(
      collect_list(struct(col("prefix"), col("allow"))).as("__rules"))

  /**
   * Decide fetchability for every URL.
   *
   * @param urls  any frame; `urlCol` is parsed with [[UrlOps]] (host
   *              lowercased, www/port stripped; path trailing-slash
   *              stripped, "" root normalized to "/")
   * @param rules (host: string, prefix: string, allow: boolean) — the
   *              parsed union of all hosts' robots.txt files
   * @return input columns + (host, path, allowed, matched_prefix) —
   *         matched_prefix = "" when no rule matched (default-allow)
   */
  def robotsFilter(urls: DataFrame, urlCol: Column,
                   rules: DataFrame): DataFrame = {
    val compiled = compile(rules)
    val withHp = urls
      .withColumn("host", UrlOps.urlHost(urlCol))
      .withColumn("path",
        when(UrlOps.urlPath(urlCol) === "", lit("/"))
          .otherwise(UrlOps.urlPath(urlCol)))
    val init = struct(lit(-1).as("mlen"), lit(true).as("mallow"),
      lit("").as("mprefix"))
    val best = aggregate(col("__rules"), init, (acc, r) => {
      val p = r.getField("prefix")
      val a = r.getField("allow")
      val plen = length(p)
      val better = col("path").startsWith(p) && (
        plen > acc.getField("mlen") ||
          (plen === acc.getField("mlen") &&
            ((a && !acc.getField("mallow")) ||
              (a === acc.getField("mallow") &&
                p < acc.getField("mprefix")))))
      when(better,
        struct(plen.as("mlen"), a.as("mallow"), p.as("mprefix")))
        .otherwise(acc)
    })
    withHp.join(broadcast(compiled), Seq("host"), "left")
      .withColumn("__b", coalesce(best, init))
      .withColumn("allowed", col("__b.mallow"))
      .withColumn("matched_prefix", col("__b.mprefix"))
      .drop("__rules", "__b")
  }
}
