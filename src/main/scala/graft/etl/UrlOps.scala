package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Canonical-URL operators for web-crawl corpora (the CommonCrawl/CCNet-style
 * URL-normalization + URL-dedup stage the reference's providers take for
 * granted — every provider in /root/reference geocodes *pages fetched by
 * URL*, cf. openstreetmap.rs / opencage.rs request builders).
 *
 * Everything here is composed from codegen'd string/array expressions
 * (regexp_*, lower, split, filter, array_sort, concat) — no UDFs — so the
 * whole canonicalization stays inside WholeStageCodegen and runs map-only:
 * at 100 TB the only shuffle any of these operators introduce is the final
 * aggregation on the (narrow) canonical-URL key.
 *
 * Canonicalization rules (fixed, documented, engine-independent):
 *   1. strip the fragment (`#...`);
 *   2. lowercase the scheme and host; strip a leading `www.`;
 *   3. drop the port iff it is the scheme default (`:80` http, `:443`
 *      https); keep any other port;
 *   4. preserve path case, strip trailing slashes (`/` root becomes "");
 *   5. drop tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`),
 *      drop empties, sort the survivors bytewise, re-join with `&`;
 *   6. inputs with no `://` scheme are treated as opaque: lowercased,
 *      trimmed, fragment-stripped, returned as-is.
 */
object UrlOps {

  /** Tracking params dropped during canonicalization (with or without `=v`). */
  val TrackingParamRe = "^(utm_[^=&]*|fbclid|gclid|ref)(=.*)?$"

  private def stripFragment(u: Column): Column = regexp_replace(u, "#.*$", "")

  private def afterScheme(u: Column): Column =
    regexp_replace(stripFragment(u), "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  private def hostPort(url: Column): Column =
    lower(regexp_extract(afterScheme(url), "^([^/?]*)", 1))

  private def pathQuery(url: Column): Column =
    regexp_replace(afterScheme(url), "^[^/?]*", "")

  /** Lowercased scheme, "" when the input carries none. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(stripFragment(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host with `www.` and any `:port` suffix stripped. */
  def urlHost(url: Column): Column =
    regexp_replace(regexp_replace(hostPort(url), ":[0-9]+$", ""), "^www\\.", "")

  /** The canonical port suffix (":8080") — "" when absent or scheme-default. */
  def urlPortSuffix(url: Column): Column = {
    val port = regexp_extract(hostPort(url), ":([0-9]+)$", 1)
    val sch = urlScheme(url)
    when(port === "", lit(""))
      .when(sch === "http" && port === "80", lit(""))
      .when(sch === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
  }

  /** Case-preserved path with trailing slashes stripped ("/" root -> ""). */
  def urlPath(url: Column): Column =
    regexp_replace(regexp_extract(pathQuery(url), "^([^?]*)", 1), "/+$", "")

  /** Canonical query string: tracking/empty params dropped, survivors
    * bytewise-sorted and `&`-joined; "" when nothing survives. */
  def urlQueryCanonical(url: Column): Column = {
    val pq = pathQuery(url)
    val q = when(pq.contains("?"), regexp_replace(pq, "^[^?]*\\?", ""))
      .otherwise(lit(""))
    val kept = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    array_join(kept, "&")
  }

  /** The canonical URL per the rules above. Idempotent: applying it to its
    * own output is a no-op. */
  def canonicalUrl(url: Column): Column = {
    val sch = urlScheme(url)
    val q = urlQueryCanonical(url)
    when(sch === "", lower(trim(stripFragment(url))))
      .otherwise(concat(sch, lit("://"), urlHost(url), urlPortSuffix(url),
        urlPath(url),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Registered domain ~ the last two dot-labels of a canonical host
    * (public-suffix lists are data, not code — callers at world scale swap
    * in a broadcast suffix table; the two-label rule is the deterministic
    * test shape). */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Dot-reversed host ("com.example.host") — the classic web-table sort key:
    * lexicographic order on it clusters a registered domain's hosts into
    * adjacent ranges, so a range-partitioned layout gets per-domain locality
    * for free. */
  def reverseHost(host: Column): Column =
    array_join(reverse(split(host, "\\.")), ".")

  /** Number of non-empty path segments. */
  def pathDepth(path: Column): Column =
    size(filter(split(path, "/"), _ =!= "")).cast("int")

  /**
   * URL-level exact dedup: one winner per canonical URL. The shuffle carries
   * only (canon_url, key, raw-url) and the winner is a combinable `min`, so
   * hot URLs collapse map-side — the same scale shape as exact doc dedup
   * (dedup/Dedup.scala). `n_raw_variants` (distinct raw spellings folded into
   * the canonical) is exact here; at crawl scale swap in approx_count_distinct.
   */
  def dedupByCanonical(df: DataFrame, urlCol: Column, keyCol: Column): DataFrame =
    df.select(canonicalUrl(urlCol).as("canon_url"), keyCol.as("__key"),
        urlCol.as("__raw"))
      .groupBy("canon_url")
      .agg(min(col("__key")).as("winner"), count(lit(1)).as("n_copies"),
        countDistinct(col("__raw")).as("n_raw_variants"))

  /**
   * Recrawl dedup: keep the LATEST capture per canonical URL. The winner is
   * a combinable max over (ts, key) structs — deterministic even under tied
   * timestamps (key breaks the tie), collapses map-side, and the shuffle
   * carries only (canon_url, ts, key). This is the snapshot-selection step
   * a crawl corpus runs before any content-level dedup.
   */
  def latestByCanonical(df: DataFrame, urlCol: Column, keyCol: Column,
      tsCol: Column): DataFrame =
    df.select(canonicalUrl(urlCol).as("canon_url"), keyCol.as("__key"),
        tsCol.as("__ts"))
      .groupBy("canon_url")
      .agg(max(struct(col("__ts"), col("__key"))).as("__w"),
        count(lit(1)).as("n_captures"))
      .select(col("canon_url"), col("__w").getField("__ts").as("latest_ts"),
        col("__w").getField("__key").as("latest_doc"), col("n_captures"))

  /** Per-registered-domain crawl stats: pages, distinct canonical URLs,
    * distinct hosts. One hash aggregation keyed by domain (narrow rows);
    * the distinct counts are exact for the contract — approx_count_distinct
    * is the drop-in at crawl scale. */
  def hostStats(df: DataFrame, urlCol: Column): DataFrame = {
    val host = urlHost(urlCol)
    df.select(registeredDomain(host).as("domain"), host.as("host"),
        canonicalUrl(urlCol).as("canon_url"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("canon_url")).as("n_canon_urls"),
        countDistinct(col("host")).as("n_hosts"))
  }
}
