package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.text.TextAnalysis

/**
 * Exact duplicated-substring removal — the corpus-level "exact substring
 * dedup" step LLM pipelines run after document-level dedup (dedup at the
 * span level catches boilerplate shared by otherwise-distinct pages that
 * MinHash document similarity misses).
 *
 * Semantics: every maximal run of tokens covered by at least one k-token
 * window whose exact text occurs >= minCopies times corpus-wide is a
 * duplicated span. This is the window-granular restriction of
 * suffix-array substring dedup: any duplicated substring of >= k tokens is
 * found (all of its k-windows repeat); shorter repeats are ignored by
 * design.
 *
 * Scale shape (the 100 TB plan):
 *  - window generation is a map-side generator expression — the explode
 *    runs inside the scan stage, no shuffle, ~dl rows per document;
 *  - the duplicate-window test is ONE combinable count aggregate on the
 *    window text (a boilerplate window repeated 10^9 times collapses to
 *    one row per input partition before the exchange);
 *  - the join back to positions is a hash join on the window text (AQE
 *    skew-split handles mega-hot windows);
 *  - span merging is gaps-and-islands over a window PARTITIONED BY
 *    document — bounded per-doc work, never a global sort.
 */
object SubstringDedup {

  /** Sliding k-token windows as (doc_key, win_idx, win_text): win_idx is
    * the 0-based token offset of the window start, win_text the k tokens
    * joined by one space. Documents shorter than k tokens emit nothing.
    * Pure map-side generator — one posexplode inside the scan stage. */
  def tokenWindows(docs: DataFrame, key: Column, text: Column, k: Int): DataFrame = {
    require(k >= 1, "window size k must be >= 1")
    // one codegen StaticInvoke call per row (tokenize once, emit all
    // windows) — a HOF lambda over the token array would re-tokenize per
    // element once CollapseProject inlines the token expression
    val wins = graft.functions.TextFunctions.windowNgrams(text, lit(k))
    docs.select(key.as("doc_key"), posexplode(wins).as(Seq("win_idx", "win_text")))
  }

  /**
   * Duplicated spans per document: one row per maximal merged interval of
   * duplicated k-windows, with token-offset bounds [span_start, span_end).
   *
   * Two windows belong to the same span iff their intervals [i, i+k)
   * overlap or touch, i.e. the island breaks when the gap in start
   * offsets exceeds k.
   *
   * @return (doc_key, span_id: int 1-based per doc in offset order,
   *          span_start: int, span_end: int, span_tokens: int,
   *          n_windows: int — duplicated windows merged into the span,
   *          max_copies: long — corpus-wide copy count of the span's
   *          most-repeated window)
   */
  def duplicatedSpans(docs: DataFrame, key: Column, text: Column,
                      k: Int, minCopies: Long = 2L): DataFrame = {
    require(minCopies >= 2L, "minCopies must be >= 2")
    val wins = tokenWindows(docs, key, text, k)
    val dup = wins.groupBy("win_text")
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= minCopies)
    val dwin = wins.join(dup, "win_text")
      .select(col("doc_key"), col("win_idx"), col("n_copies"))
    val byDoc = Window.partitionBy("doc_key").orderBy("win_idx")
    val gap = col("win_idx") - lag(col("win_idx"), 1).over(byDoc)
    val marked = dwin
      .withColumn("__brk", when(gap <= k, 0).otherwise(1))
      .withColumn("__island", sum(col("__brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col("doc_key"), col("__island"))
      .agg(min("win_idx").as("span_start"),
        (max(col("win_idx")) + k).as("span_end"),
        count(lit(1)).cast("int").as("n_windows"),
        max("n_copies").as("max_copies"))
      .withColumn("span_id", row_number().over(
        Window.partitionBy("doc_key").orderBy("span_start")))
      .select(col("doc_key"), col("span_id"), col("span_start"),
        col("span_end"), (col("span_end") - col("span_start")).as("span_tokens"),
        col("n_windows"), col("max_copies"))
  }

  /** Rewrite documents with every duplicated span removed: tokens whose
    * 0-based position falls inside any of the doc's spans are dropped and
    * the survivors re-joined with single spaces (the dedup is defined on
    * the token stream, so original whitespace is not preserved). Documents
    * with no spans pass through with their full token join. Adds
    * `clean_text` and `n_removed_tokens`. One aggregate to fold the span
    * list per doc (bounded: spans per doc <= dl / 1) + a hash join back. */
  def stripSpans(docs: DataFrame, key: Column, text: Column,
                 k: Int, minCopies: Long = 2L): DataFrame = {
    val spans = duplicatedSpans(docs, key, text, k, minCopies)
      .groupBy("doc_key")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = TextAnalysis.tokens(text)
    val covered = (i: Column) => exists(col("__spans"),
      s => i >= s.getField("span_start") && i < s.getField("span_end"))
    docs.select(key.as("doc_key"), toks.as("__toks"))
      .join(spans, Seq("doc_key"), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast("array<struct<span_start:int,span_end:int>>")))
      .withColumn("__kept", filter(col("__toks"),
        (t, i) => !covered(i)))
      .select(col("doc_key"),
        array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__toks")) - size(col("__kept"))).as("n_removed_tokens"))
  }

  /**
   * Cross-snapshot n-gram NOVELTY audit — "how much of this crawl is new
   * content?": for each candidate document, the fraction of its n-token
   * windows never seen in the reference snapshot. The recrawl-budget
   * metric that sits next to incremental dedup (which answers the
   * document-level question; this answers it at substring granularity, so
   * a rewritten page with one new paragraph scores its paragraph, not 0
   * or 1).
   *
   * Scale shape: the reference window set is ONE combinable distinct over
   * sha60-hashed windows (narrow longs, never the window strings); the
   * candidate side explodes once, joins on the hash, and aggregates
   * per-doc — one hash-keyed exchange each side. Windows hash through the
   * engine-wide portable sha60, so DuckDB replays the whole audit.
   *
   * @return (doc_key, n_windows: long, n_novel: long, novelty_ratio:
   *         double — null when the doc has fewer than n tokens)
   */
  def windowNovelty(newDocs: DataFrame, key: Column, text: Column,
                    ref: DataFrame, refText: Column, n: Int): DataFrame = {
    require(n >= 2, s"window size must be >= 2, got $n")
    val refW = ref
      .select(explode(TextFunctions.windowNgrams(refText, lit(n))).as("w"))
      .select(TextFunctions.sha60(col("w")).as("wh"))
      .distinct()
      .withColumn("seen", lit(1))
    val ex = newDocs
      .select(key.as("doc_key"),
        explode(TextFunctions.windowNgrams(text, lit(n))).as("w"))
      .select(col("doc_key"), TextFunctions.sha60(col("w")).as("wh"))
    val per = ex.join(refW, Seq("wh"), "left")
      .groupBy("doc_key")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("seen").isNull, lit(1L)).otherwise(lit(0L)))
          .as("n_novel"))
    newDocs.select(key.as("doc_key"))
      .join(per, Seq("doc_key"), "left")
      .select(col("doc_key"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(col("n_novel").cast("double")
          / col("n_windows").cast("double"), 6).as("novelty_ratio"))
  }
}
