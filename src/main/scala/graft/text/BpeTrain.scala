package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Distributed byte-pair-encoding tokenizer TRAINING (merge learning) — the
 * step a large-scale training-data pipeline runs before `tokenCountBpe` can
 * count anything: learn the merge table itself from the corpus (Sennrich et
 * al. 2016 shape, re-expressed as Spark aggregations).
 *
 * Algorithm, per merge round:
 *   1. pair statistics: every adjacent symbol pair of every word type,
 *      weighted by word frequency — ONE codegen call per word
 *      ([[TextFunctions.spacePairs]]) exploded into a combinable hash
 *      aggregation whose map-side partials absorb the Zipf head;
 *   2. best pair: TakeOrdered(1) by (count desc, pair asc) — a per-partition
 *      heads reduction, never a global sort; the single winning row comes to
 *      the driver (one scalar decision per round, the same documented
 *      driver-side role as the IVF trainer's per-iteration centroids);
 *   3. merge rewrite: map-only, the learned pair folded in as a plan
 *      LITERAL — the symbol sequence is rewritten by a sentinel-delimited
 *      string replace applied twice: the first left-to-right pass cannot
 *      match two occurrences that share a delimiter space, the second pass
 *      picks up exactly those, so the double application realizes the full
 *      disjoint greedy merge. (On an odd run of a repeated symbol the
 *      unmerged singleton lands mid-run rather than last — an
 *      order-of-application detail of the scan semantics, replayed
 *      identically by the oracle.)
 *
 * Scale shape: the working set is the WORD-TYPE table (Zipf-compressed
 * distinct words + counts), orders of magnitude smaller than the corpus; the
 * corpus itself is scanned exactly once (word counting). Each round is ONE
 * Spark job: rewrites stack as lazy literal projections over the cached word
 * table (CollapseProject fuses them into a single codegen pass), so a round
 * = cache scan + fused rewrites + pair explode + combinable agg +
 * TakeOrdered(1). Every [[CutEvery]] rounds the stack is materialized and
 * re-entered as a LogicalRDD leaf (HITS-style), so thousands-of-merges runs
 * replay O(CutEvery) rewrites per round, not O(t). Rounds are inherently
 * sequential (each merge conditions the next) — the known BPE-training
 * critical path.
 *
 * Determinism: counts are exact integers; ties cut by pair string ascending;
 * every rewrite is literal string replace — bit-reproducible at any cluster
 * size, and an external engine can replay every round exactly
 * (SparkEntry `doc_bpe_train`).
 */
object BpeTrain {

  private def cut(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Materialize the rewrite stack every this many rounds (see loop note). */
  private val CutEvery = 16

  /** SQL literal for a symbol string (symbols are alnum + the marker, but
    * quote defensively). */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /**
   * @param tokenFilter regex a word must fully match to participate (default
   *                    ASCII lower-alnum, which also makes the char-split
   *                    engine-portable); pass ".*" to train on everything
   * @return (merge_rank, pair_left, pair_right, merged, pair_n) — one row
   *         per learned merge, in learning order; fewer than `rounds` rows
   *         if the corpus runs out of pairs
   */
  def learnMerges(docs: DataFrame, text: Column, rounds: Int,
                  tokenFilter: String = "^[a-z0-9]+$"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val words0 = docs.select(explode(TextAnalysis.tokens(text)).as("w"))
      .filter(col("w").rlike(tokenFilter))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), TextFunctions.bpeCharSeq(col("w")).as("seq"))

    var curCached = words0.persist()
    curCached.count()
    var cur = curCached
    var sinceCut = 0
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var t = 1
    var exhausted = false
    while (t <= rounds && !exhausted) {
      // ONE job per round: scan the cached word table, replay the (driver-
      // literal) rewrite stack lazily — CollapseProject fuses it into a
      // single codegen'd pass — then pair-explode + combinable agg +
      // TakeOrdered(1)
      val best = cur
        .select(explode(TextFunctions.spacePairs(col("seq"))).as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("pair_n"))
        .orderBy(col("pair_n").desc, col("p").asc).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val p = best(0).getString(0)
        val n = best(0).getLong(1)
        val Array(l, r) = p.split(" ", 2)
        learned += ((t, l, r, l + r, n))
        if (t < rounds) {
          val pat = sqlLit(" " + p + " ")
          val rep = sqlLit(" " + l + r + " ")
          cur = cur.select(col("w"), col("cnt"),
            expr(s"replace(replace(seq, $pat, $rep), $pat, $rep)").as("seq"))
          sinceCut += 1
          // bound the replayed-rewrite depth: every `CutEvery` rounds
          // materialize the rewritten table and restart the lazy stack
          // (thousands-of-merges runs pay O(CutEvery) replays per round,
          // not O(t))
          if (sinceCut == CutEvery) {
            val nextCached = cur.persist()
            nextCached.count()
            curCached.unpersist()
            curCached = nextCached
            cur = cut(nextCached)
            sinceCut = 0
          }
        }
      }
      t += 1
    }
    curCached.unpersist()
    learned.toSeq.toDF("merge_rank", "pair_left", "pair_right", "merged", "pair_n")
  }

  /**
   * Checkpoint-integrated merge learning: identical algorithm and bit-equal
   * merge table to [[learnMerges]], with the training state flowing through
   * [[graft.engine.Iterate.resumable]] — BPE training is the pipeline's one
   * inherently SEQUENTIAL critical path (each merge conditions the next), so
   * at a production vocabulary (30k-50k rounds) a killed run that restarts
   * from round 0 is catastrophic. Here the state after round t — the
   * rewritten word-TYPE table AND the merges learned so far, as one
   * two-kind DataFrame (word rows carry `w/cnt/seq`, merge rows carry
   * `merge_rank/pair_left/pair_right/merged/pair_n`; the other columns are
   * null) — lands in `<ckptDir>/bpe_i<t>` parquet every `every` rounds with
   * per-partition lineage, so:
   *
   *  - a rerun resumes from the last completed block (lineage
   *    `resumed=true`), replaying zero pair-stat jobs for finished rounds;
   *  - EXTENDING the vocabulary is incremental: a `rounds = 50k` run over a
   *    checkpoint written by a `rounds = 30k` run serves the 30k prefix
   *    from disk and trains only the 20k new merges (BpeResumeSpec);
   *  - the parquet leaf at each block bounds the replayed-rewrite depth at
   *    `every`, subsuming [[CutEvery]].
   *
   * Each round still collects its single argmax row inside the block build
   * (the same one-scalar-per-round driver decision as [[learnMerges]]);
   * fully-checkpointed blocks never execute it.
   */
  def learnMergesResumable(spark: org.apache.spark.sql.SparkSession,
                           ckptDir: String, inputFingerprint: String,
                           docs: DataFrame, text: Column, rounds: Int,
                           tokenFilter: String = "^[a-z0-9]+$",
                           every: Int = 1): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val nullS = lit(null).cast("string")
    val fp = s"bpe|$tokenFilter|$inputFingerprint"
    val fin = graft.engine.Iterate.resumable(
        spark, ckptDir, "bpe", fp, rounds, every) {
      docs.select(explode(TextAnalysis.tokens(text)).as("w"))
        .filter(col("w").rlike(tokenFilter))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("w"), col("cnt"),
          TextFunctions.bpeCharSeq(col("w")).as("seq"),
          lit(null).cast("int").as("merge_rank"), nullS.as("pair_left"),
          nullS.as("pair_right"), nullS.as("merged"),
          lit(null).cast("long").as("pair_n"))
    } { (state, t) =>
      val words = state.filter(col("merge_rank").isNull)
      val best = words
        .select(explode(TextFunctions.spacePairs(col("seq"))).as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("pair_n"))
        .orderBy(col("pair_n").desc, col("p").asc).limit(1)
        .collect()
      if (best.isEmpty) state // corpus out of pairs: every later round too
      else {
        val p = best(0).getString(0)
        val n = best(0).getLong(1)
        val Array(l, r) = p.split(" ", 2)
        val pat = sqlLit(" " + p + " ")
        val rep = sqlLit(" " + l + r + " ")
        val mergeRow = spark.range(1).select(nullS.as("w"),
          lit(null).cast("long").as("cnt"), nullS.as("seq"),
          lit(t).as("merge_rank"), lit(l).as("pair_left"),
          lit(r).as("pair_right"), lit(l + r).as("merged"),
          lit(n).as("pair_n"))
        words.select(col("w"), col("cnt"),
            expr(s"replace(replace(seq, $pat, $rep), $pat, $rep)").as("seq"),
            col("merge_rank"), col("pair_left"), col("pair_right"),
            col("merged"), col("pair_n"))
          .unionByName(state.filter(col("merge_rank").isNotNull))
          .unionByName(mergeRow)
      }
    }
    fin.filter(col("merge_rank").isNotNull)
      .select(col("merge_rank"), col("pair_left"), col("pair_right"),
        col("merged"), col("pair_n"))
      .orderBy("merge_rank")
  }

  /**
   * ENCODE with a learned merge table: per-document BPE token counts — the
   * apply half of the tokenizer (train with [[learnMerges]], then size the
   * corpus in learned-BPE tokens, the number an LLM data pipeline actually
   * budgets by).
   *
   * Shape: the merge list (vocabulary-sized by construction — one row per
   * learned merge) folds into a literal rewrite chain, applied per token
   * occurrence: explode tokens, build the char sequence, run the fused
   * replace chain, count symbols — all map-only inside one codegen span —
   * then ONE combinable per-document sum. Words not matching `tokenFilter`
   * are excluded, consistent with training. (For merge tables in the tens
   * of thousands, amortize the chain over the word-TYPE table and join
   * counts back by word instead — the chain cost moves from per-occurrence
   * to per-type.)
   *
   * @param merges output of [[learnMerges]] (merge_rank, pair_left,
   *               pair_right, ...) — collected to the driver (vocab-sized)
   * @return (doc_id, n_bpe_tokens); documents with no qualifying tokens
   *         emit no row
   */
  def applyMerges(docs: DataFrame, id: Column, text: Column, merges: DataFrame,
                  tokenFilter: String = "^[a-z0-9]+$"): DataFrame = {
    val ms = merges.select(col("merge_rank"), col("pair_left"), col("pair_right"))
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val rewritten = ms.foldLeft("seq") { case (acc, (l, r)) =>
      val pat = sqlLit(" " + l + " " + r + " ")
      val rep = sqlLit(" " + l + r + " ")
      s"replace(replace($acc, $pat, $rep), $pat, $rep)"
    }
    docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("w"))
      .filter(col("w").rlike(tokenFilter))
      .select(col("doc_id"), TextFunctions.bpeCharSeq(col("w")).as("seq"))
      .select(col("doc_id"),
        size(split(trim(expr(rewritten)), " ")).as("n_sym"))
      .groupBy("doc_id").agg(sum("n_sym").as("n_bpe_tokens"))
  }
}
