package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Corpus-preparation operators a training-data pipeline runs between cleaning
 * and tokenization: deterministic train/val/test splits, stratified
 * sub-sampling to a target mixture, fixed-window document chunking, and
 * vocabulary construction. Everything is a map-only Column expression (or a
 * two-level aggregate for the vocabulary) keyed on the PORTABLE sha60 hash
 * ([[TextFunctions.sha60]]) so an external engine can reproduce every
 * assignment bit-for-bit — reshuffling a 100 TB corpus must be replayable,
 * never random.
 */
object Corpus {

  /** Portable per-row split bucket in [0, 100): sha60("split:<salt>:<key>")
    * mod 100. Salt changes reshuffle the assignment; the key keeps a document
    * in the same split across reruns and engines. */
  def splitBucket(key: Column, salt: String): Column =
    pmod(TextFunctions.sha60(
      concat(lit(s"split:$salt:"), key.cast("string"))), lit(100))

  /** Deterministic train/val/test assignment: buckets [0, trainPct) are
    * train, [trainPct, trainPct+valPct) val, the rest test. Map-only — the
    * assignment shuffles nothing and never needs a global pass. */
  def withSplit(docs: DataFrame, key: Column, salt: String = "v1",
                trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = splitBucket(key, salt)
    docs.withColumn("split_bucket", b.cast("int"))
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Per-stratum deterministic sampling rates folded into the plan as a CASE
    * expression (the rates table is tiny — a literal beats a broadcast join).
    * A row survives iff sha60("sample:<salt>:<key>") mod 1e6 falls under
    * rate*1e6, so changing one stratum's rate leaves every other stratum's
    * kept-set untouched (the property mixture re-balancing relies on). */
  def sampleStratified(docs: DataFrame, stratum: Column, key: Column,
                       rates: Map[String, Double], salt: String = "v1",
                       defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates in [0,1]")
    // thresholds resolved to integer literals at plan-build time (the same
    // (r*1e6).toLong both here and in any external re-derivation) — a
    // runtime double multiply would be engine-rounding-dependent
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(when(lit(false), 0L)) {
      case (acc, (k, r)) => acc.when(stratum === k, ppm(r))
    }.otherwise(ppm(defaultRate))
    val u = pmod(TextFunctions.sha60(
      concat(lit(s"sample:$salt:"), key.cast("string"))), lit(1000000))
    docs.filter(u < threshold)
  }

  /** Rate in parts-per-million — THE shared integer-threshold definition for
    * [[sampleStratified]] and its oracle re-derivations. */
  def ppm(rate: Double): Long = (rate * 1000000.0).toLong

  /** Fixed-size character windows with stride (stride < size ⇒ overlap):
    * one output row per (doc, window). A map-side generator — the explode
    * runs inside the scan stage, no shuffle, so chunking streams at 100 TB.
    * Empty texts yield one empty chunk (offset 0) rather than vanishing. */
  def chunk(docs: DataFrame, text: Column, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val offsets = sequence(lit(0), greatest(length(text) - 1, lit(0)), lit(stride))
    docs.select(col("*"), posexplode(offsets).as(Seq("chunk_id", "chunk_off")))
      .withColumn("chunk_text", substring(text, col("chunk_off") + 1, lit(size)))
      .withColumn("chunk_chars", length(col("chunk_text")))
  }

  /** Per-stratum quality gate: drop every document whose quality score falls
    * below its stratum's pct-th exact interpolated percentile. The threshold
    * table is one row per stratum (a broadcast join); the percentile runs
    * over the per-stratum AGGREGATE paths Spark distributes, so nothing here
    * is a global sort. Scores are rounded to 6 digits BEFORE both the
    * percentile and the comparison so the gate is bit-stable across engines.
    */
  def qualityGate(docs: DataFrame, stratum: Column, pct: Double): DataFrame = {
    require(pct > 0.0 && pct < 1.0, "pct in (0,1)")
    val scored = TextAnalysis.withQuality(docs)
      .withColumn("quality_score", round(col("quality_score"), 6))
    val thr = scored.groupBy(stratum.as("__stratum"))
      .agg(expr(s"percentile(quality_score, $pct)").as("quality_thr"))
    scored.join(broadcast(thr), stratum === col("__stratum"))
      .filter(col("quality_score") >= col("quality_thr"))
      .drop("__stratum")
  }

  /** Per-stratum cap: keep at most n documents per stratum, best quality
    * first (doc id breaks ties) — the host-level cap crawl cleaning applies
    * so no single domain dominates the corpus. One hash shuffle on the
    * stratum + a bounded window; never a global sort. */
  def capPerStratum(docs: DataFrame, stratum: Column, key: Column,
                    quality: Column, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(quality.desc, key)
    docs.withColumn("strat_rank", row_number().over(w))
      .filter(col("strat_rank") <= n)
  }

  /** Top-k token vocabulary with deterministic tie-break (count desc, token
    * asc) and a dense `vocab_id` rank. Partial map-side aggregation collapses
    * each partition to its distinct tokens before the single shuffle; the
    * top-k itself is a TakeOrdered (per-partition heads, never a global
    * sort), and the rank window runs over ≤ k rows on one partition. */
  def vocabTopK(docs: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = docs
      .select(explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token")).limit(k)
    counts.withColumn("vocab_id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occurrences").desc, col("token"))) - 1)
  }
}
