package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /**
   * Temperature-scaled source mixing — the multi-source/multilingual
   * re-balancing step: the output mixture follows p_s ∝ mass_s^alpha
   * (alpha=1 keeps natural proportions, alpha→0 flattens to uniform), with
   * the output token budget a fraction of the corpus. Source s is kept at
   * rate_s = min(1, p_s · budgetFraction · Σmass / mass_s), resolved to an
   * integer ppm threshold and applied with the deterministic sha60 coin
   * ("mix:<salt>:<key>"), so the kept-set is replayable across engines and
   * cluster sizes.
   *
   * Scale shape: ONE combinable integer mass aggregate (a handful of rows),
   * a window over that aggregate (never the raw docs), a broadcast join
   * back, then a map-only filter. Adds `rate_ppm` to every kept row.
   */
  def temperatureMix(docs: DataFrame, stratum: Column, key: Column,
                     tokenCount: Column, alpha: Double,
                     budgetFraction: Double, salt: String = "v1"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    require(budgetFraction > 0.0 && budgetFraction <= 1.0, "budgetFraction in (0, 1]")
    val masses = docs.groupBy(stratum.as("__stratum"))
      .agg(sum(tokenCount).as("__mass"))
    val whole = Window.partitionBy()
    // rate arithmetic in a fixed operation order (w/sumw, then the budget
    // ratio) so an external engine replays the same IEEE doubles; the final
    // half-up round to integer ppm absorbs any sub-ulp divergence
    val rates = masses
      .withColumn("__w", pow(col("__mass").cast("double"), lit(alpha)))
      .withColumn("__sumw", sum(col("__w")).over(whole))
      .withColumn("__summass", sum(col("__mass")).over(whole))
      .withColumn("__rate", least(lit(1.0), (col("__w") / col("__sumw")) *
        ((lit(budgetFraction) * col("__summass").cast("double")) /
          col("__mass").cast("double"))))
      .withColumn("rate_ppm", round(col("__rate") * lit(1000000.0), 0).cast("long"))
      .select(col("__stratum"), col("rate_ppm"))
    val u = pmod(TextFunctions.sha60(
      concat(lit(s"mix:$salt:"), key.cast("string"))), lit(1000000))
    docs.join(broadcast(rates), stratum === col("__stratum"))
      .filter(u < col("rate_ppm"))
      .drop("__stratum")
  }

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
    // eager per-invocation localCheckpoint (same rationale as
    // [[ccnetBuckets]]): BOTH the threshold side and the probe read the
    // scored table, and withQuality is the expensive per-doc text-analysis
    // pass — without this it runs twice per query
    val scored = TextAnalysis.withQuality(docs)
      .withColumn("quality_score", round(col("quality_score"), 6))
      .localCheckpoint()
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

  /** Corpus-wide segment-level exact dedup (the CCNet / RefinedWeb
    * line-dedup step): across ALL documents, each distinct segment text
    * survives exactly once, at its first occurrence in (docKey, segIdx)
    * order. One shuffle on the segment text with a COMBINABLE aggregate —
    * `min(struct(key, idx))` partial-aggregates map-side, so a boilerplate
    * segment repeated 10^9 times collapses to one row per input partition
    * before the exchange (a row_number window would funnel the hot segment
    * through one task). Output: one row per distinct segment with its winning
    * position and its corpus-wide copy count. */
  def dedupSegments(segs: DataFrame, docKey: Column, segIdx: Column,
                    segText: Column): DataFrame =
    segs.groupBy(segText.as("seg_text"))
      .agg(min(struct(docKey.as("k"), segIdx.as("i"))).as("__first"),
        count(lit(1)).as("n_copies"))
      .select(col("__first.k").as("doc_key"), col("__first.i").as("seg_idx"),
        col("seg_text"), col("n_copies"))

  /** Rebuild per-document text from surviving segments: sort each document's
    * segments by index and join with `sep`. One shuffle on the document key;
    * the sort happens inside `array_sort` per group (struct ordering is
    * lexicographic, so the index field leads), never as a global sort. */
  def reassembleSegments(segs: DataFrame, docKey: Column, segIdx: Column,
                         segText: Column, sep: String): DataFrame =
    segs.groupBy(docKey.as("doc_key"))
      .agg(concat_ws(sep, transform(
        array_sort(collect_list(struct(segIdx.as("i"), segText.as("t")))),
        s => s.getField("t"))).as("text"),
        count(lit(1)).as("n_segments"))

  /**
   * Deterministic weighted sampling without replacement (Efraimidis &
   * Spirakis 2006, A-ES): every item gets priority ln(u) / w with
   * u = (sha60(key:salt) + 1) / 2^60 — the top-k by priority is an exact
   * weight-proportional sample without replacement, reproducible on any
   * engine/cluster because u is hash-derived, never drawn. The priority is
   * rounded to 7dp (the validated cross-engine `ln` grain, same as DSIR's
   * LLR) with ties broken by key.
   *
   * Scale shape: priority is map-only; selection is the DSIR
   * kth-threshold — two TakeOrderedAndProject jobs on k rows broadcast
   * back as a 1-row threshold, never a global sort. Items with
   * non-positive weight are never selected.
   *
   * @return (doc_key, w, priority, selected)
   */
  def weightedSample(docs: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String = "v1"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (TextFunctions.sha60(
        concat(key.cast("string"), lit(":" + salt))) + lit(1L))
      .cast("double") / lit(graft.sketch.Kmv.Domain)
    // priority only for positive weights (ANSI double division would
    // throw on w = 0; non-positive weights are unselectable anyway)
    val w = docs.select(key.as("doc_key"), weight.cast("long").as("w"),
        when(weight.cast("long") > 0,
          round(log(u) / weight.cast("double"), 7)).as("priority"))
      .persist()
    val kth = w.filter(col("w") > 0)
      .orderBy(col("priority").desc, col("doc_key").asc).limit(k)
      .orderBy(col("priority").asc, col("doc_key").desc).limit(1)
      .select(col("priority").as("kth_p"), col("doc_key").as("kth_key"))
    w.crossJoin(broadcast(kth))
      .select(col("doc_key"), col("w"), col("priority"),
        coalesce(col("w") > 0 && (col("priority") > col("kth_p") ||
            (col("priority") === col("kth_p") &&
              col("doc_key") <= col("kth_key"))),
          lit(false)).as("selected"))
  }

  /** C4-style boilerplate segment rules, each surfaced as its own flag so a
    * pipeline can audit WHY a segment dropped: fewer than `minWords` tokens
    * (shared tokenizer), a blacklist phrase (policy/boilerplate markers),
    * curly braces (leaked code/CSS), and — optional, for corpora where prose
    * carries punctuation — a missing terminal punctuation mark. Map-only. */
  def segmentFlags(segs: DataFrame, segText: Column, minWords: Int,
                   blacklist: Seq[String],
                   requireTerminalPunct: Boolean = false): DataFrame = {
    require(minWords >= 0, "minWords must be >= 0")
    val low = lower(segText)
    val black = blacklist.sorted
      .map(b => low.contains(b.toLowerCase(java.util.Locale.ROOT)))
      .foldLeft(lit(false))(_ || _)
    val noPunct =
      if (requireTerminalPunct) !segText.rlike("[.!?\"']\\s*$") else lit(false)
    segs
      .withColumn("flag_too_short",
        size(TextAnalysis.tokens(segText)) < minWords)
      .withColumn("flag_blacklist", black)
      .withColumn("flag_brace", segText.contains("{") || segText.contains("}"))
      .withColumn("flag_no_punct", noPunct)
      .withColumn("seg_keep", !col("flag_too_short") && !col("flag_blacklist")
        && !col("flag_brace") && !col("flag_no_punct"))
  }

  /** Distinct word n-grams of `text` under the shared tokenizer; documents
    * with fewer than n tokens yield none (no collision is possible). The
    * n-gram is materialized as the space-joined token run — the SAME string
    * an external engine rebuilds, so collision sets are portable. A codegen
    * StaticInvoke ([[TextCore.wordNgrams]]): the HOF-lambda formulation
    * re-tokenizes per element after CollapseProject inlining (~10x). */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    TextFunctions.wordNgrams(text, lit(n))
  }

  /** Benchmark decontamination: flag every training document sharing at
    * least one word n-gram with the evaluation set (the n-gram-collision
    * rule the GPT-3/Llama corpus papers apply before training). The bench
    * n-gram set is distinct-aggregated and BROADCAST — eval suites are tiny
    * next to the corpus — so the per-doc collision count is a map-side
    * semi-probe; the only exchanges are the bench-side distinct and the
    * final count-per-doc aggregate over matched grams (narrow rows). */
  def decontaminate(docs: DataFrame, docKey: Column, text: Column,
                    bench: DataFrame, benchText: Column, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(wordNgrams(benchText, n)).as("__gram")).distinct()
    val hits = docs
      .select(docKey.as("__k"), explode(wordNgrams(text, n)).as("__gram"))
      .join(broadcast(benchGrams), "__gram")
      .groupBy(col("__k")).agg(count(lit(1)).as("n_contaminated_grams"))
    docs.join(hits, docKey === col("__k"), "left")
      .withColumn("n_contaminated_grams",
        coalesce(col("n_contaminated_grams"), lit(0L)))
      .withColumn("contaminated", col("n_contaminated_grams") > 0)
      .drop("__k")
  }

  /** GPT-style sequence packing coordinates: within each shard, documents
    * are concatenated in `key` order and cut every `seqLen` tokens; each
    * document learns its token span [tok_start, tok_end) and the range of
    * training sequences it lands in. Pure integer window math — one running
    * sum per shard (shards bound the sort; there is no global order), so
    * the layout is bit-replayable by any engine. Zero-token documents carry
    * their boundary position with seq_first = seq_last = the sequence the
    * boundary falls in. */
  def packSequences(docs: DataFrame, shard: Column, key: Column,
                    tokenCount: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard).orderBy(key)
    val cnt = tokenCount.cast("long")
    // offsets are non-negative, so integral DIV is floor division — double
    // arithmetic would lose token resolution past 2^53 (a real number for
    // cumulative token offsets at 100 TB)
    docs.withColumn("shard", shard)
      .withColumn("tok_end", sum(cnt).over(w))
      .withColumn("tok_start", col("tok_end") - cnt)
      .withColumn("seq_first", expr(s"tok_start DIV ${seqLen.toLong}"))
      .withColumn("seq_last",
        when(cnt > 0, expr(s"(tok_end - 1) DIV ${seqLen.toLong}"))
          .otherwise(expr(s"tok_start DIV ${seqLen.toLong}")))
      .withColumn("seq_off", pmod(col("tok_start"), lit(seqLen.toLong)))
  }

  /** Explode [[packSequences]] coordinates into per-(document, sequence)
    * slice rows — the writer's unit of work: which run of the document's
    * tokens lands in which training sequence, at which offset. A map-side
    * generator over the packed coordinates; empty documents emit nothing. */
  def packExplode(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val L = lit(seqLen.toLong)
    packed.filter(col("tok_end") > col("tok_start"))
      .select(col("*"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .withColumn("doc_tok_off",
        greatest(col("seq_id") * L - col("tok_start"), lit(0L)))
      .withColumn("seq_tok_off",
        greatest(col("tok_start") - col("seq_id") * L, lit(0L)))
      .withColumn("n_toks",
        least(col("tok_end"), (col("seq_id") + 1) * L)
          - greatest(col("tok_start"), col("seq_id") * L))
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

  /**
   * Rule-based sentence segmentation — the granularity decontamination and
   * parallel-corpus mining actually operate at. The rule is deliberately a
   * pure-regex contract (terminator [.!?] followed by spaces ends a
   * sentence) with NO lookbehind, so any RE2-class engine replays it: the
   * boundary is marked by a capture-group replace (`"$1" + `), then
   * one split — two codegen string passes, map-only, no shuffle at all.
   * Empty segments (e.g. a trailing terminator) are dropped; `sent_idx`
   * keeps the pre-filter position so downstream joins stay stable.
   *
   * PRECONDITION: the boundary marker is the in-band sentinel U+0001, so
   * `text` must not already contain U+0001 — a document that does gains
   * spurious splits and shifted `sent_idx` values. This holds for any
   * cleaned corpus (C0 controls are stripped by the upstream text
   * extraction), and the DuckDB oracle replays the SAME sentinel, so
   * engine and oracle agree even on hostile input; strip U+0001 first if
   * feeding raw bytes.
   *
   * @return (doc_key, sent_idx: int, sentence, n_chars: int)
   */
  def sentences(docs: DataFrame, key: Column, text: Column): DataFrame = {
    val marked = regexp_replace(text, "([.!?]) +", "$1")
    docs.select(key.as("doc_key"),
        posexplode(split(marked, "")).as(Seq("sent_idx", "sentence")))
      .filter(length(col("sentence")) > 0)
      .withColumn("n_chars", length(col("sentence")).cast("int"))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score every
   * document with the interpolated bigram LM, derive corpus-level head/middle
   * thresholds, and tag each document `head` / `middle` / `tail` by where its
   * per-token negative log-likelihood falls. The signature CCNet move is that
   * thresholds come from the CORPUS distribution, not fixed constants.
   *
   * Exactness: the per-doc score stays in the exact integer domain end to
   * end — the 7-dp DECIMAL LM sum becomes per-token NLL in 1e-7 nats via an
   * integral division (`nll_e7 = (−sdec · 10^7) div n_tokens`, both operands
   * non-negative so floor == truncate in every engine) — so bucket membership
   * is an integer comparison with no float boundary.
   *
   * Scale shape: the thresholds are NOT a global sort/ntile (a corpus-wide
   * window would single-partition 10^12 rows); they come from the mergeable
   * log-histogram quantile sketch ([[graft.sketch.QuantileHist]], ≤ ~250
   * cells, combinable map-side), then ride back as a broadcast 1-row join.
   * Sketch quantiles are deterministic bucket upper bounds, so the head/tail
   * split is reproducible bit-for-bit — the property that matters when the
   * bucket feeds a training-mix contract. Empty documents are excluded
   * (no tokens → no perplexity to bucket).
   *
   * @return (doc_key, n_tokens, nll_e7, t33, t66, bucket)
   */
  def ccnetBuckets(docs: DataFrame, key: Column, text: Column,
                   lam: Double = 0.7): DataFrame = {
    // materialized ONCE because BOTH the threshold-sketch side and the
    // final probe read it: without this the whole bigram-LM scoring
    // pipeline (tokenize + 2 count models + 3 joins + per-doc decimal sum)
    // computes twice — once under the broadcast build, once on the probe
    // (measured 18 jobs for a ~8-stage pipeline). EAGER localCheckpoint,
    // not persist(): a persist of this deterministic plan would be served
    // from the CacheManager to every later identical invocation (cross-run
    // memoization — prohibited), while the checkpointed RDD is
    // per-invocation; eager because nothing runs an action on `nll` itself
    // before the consumers, so a lazy checkpoint would dedupe nothing
    // (measured: lazy = 18 jobs unchanged, eager = half the pipeline).
    val nll = TextAnalysis.bigramLmDecimal(docs, key, text, lam)
      .filter(col("n_tokens") >= 1)
      .select(col("doc_key"), col("n_tokens"),
        expr("CAST((-__sdec) * 10000000 AS BIGINT) div CAST(n_tokens AS BIGINT)")
          .as("nll_e7"))
      .localCheckpoint()
    val cells = graft.sketch.QuantileHist.cells(nll, lit("corpus"), col("nll_e7"))
    val th = graft.sketch.QuantileHist.quantiles(cells, Seq(33, 66))
      .groupBy("key").agg(
        max(when(col("pct") === 33, col("est_value"))).as("t33"),
        max(when(col("pct") === 66, col("est_value"))).as("t66"))
      .drop("key")
    nll.crossJoin(broadcast(th))
      .select(col("doc_key"), col("n_tokens"), col("nll_e7"),
        col("t33"), col("t66"),
        when(col("nll_e7") <= col("t33"), lit("head"))
          .when(col("nll_e7") <= col("t66"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
