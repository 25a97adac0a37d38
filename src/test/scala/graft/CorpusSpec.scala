package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Corpus

/** Corpus-preparation operators: deterministic splits, stratified sampling,
  * chunking, vocabulary. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()

  test("weightedSample: exactly k selected, weight-proportional, deterministic") {
    val r = Corpus.weightedSample(docs, $"doc_id", $"n_chars", k = 40).cache()
    assert(r.filter($"selected").count() === 40)
    assert(r.count() === docs.count()) // every doc flagged, none dropped
    // weight-proportionality: the selected set's mean weight exceeds the
    // corpus mean (heavier docs are favoured)
    val meanSel = r.filter($"selected").agg(avg($"w")).head.getDouble(0)
    val meanAll = r.agg(avg($"w")).head.getDouble(0)
    assert(meanSel > meanAll)
    // deterministic across runs; a different salt reshuffles the draw
    val r2 = Corpus.weightedSample(docs, $"doc_id", $"n_chars", k = 40)
    assert(r.collect().toSet === r2.collect().toSet)
    val resalted = Corpus.weightedSample(docs, $"doc_id", $"n_chars",
      k = 40, salt = "v2").filter($"selected")
      .select("doc_key").as[Long].collect().toSet
    val orig = r.filter($"selected").select("doc_key").as[Long].collect().toSet
    assert(resalted !== orig)
    // zero/negative weights are never selected
    val withZero = docs.withColumn("n_chars",
      when($"doc_id" % 2 === 0, lit(0L)).otherwise($"n_chars"))
    val z = Corpus.weightedSample(withZero, $"doc_id", $"n_chars", k = 40)
      .filter($"selected").select("doc_key").as[Long].collect()
    assert(z.forall(_ % 2 !== 0L) && z.length === 40)
  }

  test("withSplit: deterministic, exhaustive, and approximately proportional") {
    val a = Corpus.withSplit(docs, $"doc_id").select("doc_id", "split")
    val b = Corpus.withSplit(docs, $"doc_id").select("doc_id", "split")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    val byShare = a.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = docs.count().toDouble
    assert(byShare.values.sum === n.toLong) // every doc assigned exactly once
    assert(byShare("train") / n > 0.80 && byShare("train") / n < 0.97)
    assert(byShare.keySet === Set("train", "val", "test"))
    // a different salt reshuffles assignments (some doc changes split)
    val resalted = Corpus.withSplit(docs, $"doc_id", salt = "v2")
      .select("doc_id", "split")
    assert(a.except(resalted).count() > 0)
  }

  test("withSplit is map-only (no Exchange in the plan)") {
    val plan = Corpus.withSplit(docs, $"doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("sampleStratified: monotone in rate, stratum-independent") {
    val lo = Corpus.sampleStratified(docs, $"lang", $"doc_id",
      Map("en" -> 0.2), defaultRate = 0.5).select("doc_id")
    val hi = Corpus.sampleStratified(docs, $"lang", $"doc_id",
      Map("en" -> 0.6), defaultRate = 0.5).select("doc_id")
    // raising one stratum's rate only ADDS rows, never removes any
    assert(lo.except(hi).count() === 0)
    assert(hi.count() > lo.count())
    // non-en strata are untouched by the en-rate change
    val loOther = Corpus.sampleStratified(docs, $"lang", $"doc_id",
      Map("en" -> 0.2), defaultRate = 0.5).filter($"lang" =!= "en")
    val hiOther = Corpus.sampleStratified(docs, $"lang", $"doc_id",
      Map("en" -> 0.6), defaultRate = 0.5).filter($"lang" =!= "en")
    assert(loOther.count() === hiOther.count())
    // rate 1.0 keeps everything, 0.0 keeps nothing
    assert(Corpus.sampleStratified(docs, $"lang", $"doc_id", Map.empty,
      defaultRate = 1.0).count() === docs.count())
    assert(Corpus.sampleStratified(docs, $"lang", $"doc_id", Map.empty,
      defaultRate = 0.0).count() === 0)
  }

  test("chunk: windows cover the text, stride/size honored, reassembly exact") {
    val d = Seq((1L, "a" * 500), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val c = Corpus.chunk(d, $"text", size = 200, stride = 150)
      .select("doc_id", "chunk_id", "chunk_off", "chunk_text", "chunk_chars")
      .as[(Long, Int, Int, String, Int)].collect().sortBy(r => (r._1, r._2))
    // doc 1: offsets 0,150,300,450 — sizes 200,200,200,50
    val d1 = c.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq === Seq(0, 150, 300, 450))
    assert(d1.map(_._5).toSeq === Seq(200, 200, 200, 50))
    // stride < size ⇒ consecutive chunks overlap by size - stride chars
    d1.sliding(2).foreach { case Array(p, q) =>
      assert(p._4.takeRight(50) === q._4.take(50))
    }
    // non-overlapped reassembly reproduces the original text exactly
    val rebuilt = d1.map(_._4.take(150)).mkString.take(500) + d1.last._4.drop(150)
    assert(rebuilt.length >= 500 && rebuilt.startsWith("a" * 500))
    // short doc: one chunk, whole text; empty doc: one empty chunk (kept)
    assert(c.filter(_._1 == 2L).toSeq === Seq((2L, 0, 0, "xy", 2)))
    assert(c.filter(_._1 == 3L).toSeq === Seq((3L, 0, 0, "", 0)))
  }

  test("qualityGate: per-stratum threshold, broadcast join, keeps >= pct share") {
    val gated = graft.text.Corpus.qualityGate(docs, $"source", pct = 0.25)
    val kept = gated.count().toDouble
    val total = docs.count().toDouble
    // p25 gate keeps at least 75% of every stratum (ties can keep more)
    assert(kept / total >= 0.70 && kept < total)
    // every kept row satisfies its own threshold
    assert(gated.filter($"quality_score" < $"quality_thr").count() === 0)
    // threshold table joins via broadcast, not a shuffle of the docs side
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("capPerStratum: at most n per stratum, best-quality-first, ties by key") {
    val d = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 5L, 0.7)).toDF("source", "doc_id", "q")
    val capped = graft.text.Corpus.capPerStratum(d, $"source", $"doc_id", $"q", n = 2)
      .select("source", "doc_id", "strat_rank")
      .as[(String, Long, Int)].collect().sortBy(r => (r._1, r._3))
    // tie at 0.9 broken by doc_id asc; doc 3/4 dropped; stratum b unaffected
    assert(capped.toSeq === Seq(("a", 1L, 1), ("a", 2L, 2), ("b", 5L, 1)))
  }

  test("dedupSegments: first occurrence wins, copies counted; reassembly") {
    val segs = Seq(
      (1L, 0, "alpha"), (1L, 1, "boiler"), (1L, 2, "beta"),
      (2L, 0, "boiler"), (2L, 1, "gamma"),
      (3L, 0, "boiler"), (3L, 1, "alpha")).toDF("doc_id", "seg_idx", "seg")
    val d = Corpus.dedupSegments(segs, $"doc_id", $"seg_idx", $"seg")
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    // "boiler" survives only at (1,1) with 3 copies; "alpha" at (1,0) with 2
    assert(d.toSeq === Seq((1L, 0, "alpha", 2L), (1L, 1, "boiler", 3L),
      (1L, 2, "beta", 1L), (2L, 1, "gamma", 1L)))
    val re = Corpus.reassembleSegments(
        Corpus.dedupSegments(segs, $"doc_id", $"seg_idx", $"seg"),
        $"doc_key", $"seg_idx", $"seg_text", sep = " ")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(re.toSeq === Seq((1L, "alpha boiler beta", 3L), (2L, "gamma", 1L)))
  }

  test("segmentFlags: each C4 rule fires independently") {
    val segs = Seq(
      "a perfectly fine prose segment.",
      "ok",                               // too short
      "please enable javascript to view", // blacklist
      "body { color: red }",              // brace (and blacklist-free)
      "no terminal punctuation here"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "seg")
    val f = Corpus.segmentFlags(segs, $"seg", minWords = 3,
        blacklist = Seq("javascript", "lorem ipsum"),
        requireTerminalPunct = true)
      .select("id", "flag_too_short", "flag_blacklist", "flag_brace",
        "flag_no_punct", "seg_keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(f.map(_._6).toSeq === Seq(true, false, false, false, false))
    assert(f(1)._2 && f(2)._3 && f(3)._4 && f(4)._5)
    // without the punctuation rule, the last segment is kept
    val lax = Corpus.segmentFlags(segs, $"seg", minWords = 3,
      blacklist = Seq("javascript"))
    assert(lax.filter($"id" === 4 && $"seg_keep").count() === 1)
  }

  test("decontaminate: n-gram collision with the bench set flags the doc") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated training text with other words"),
      (3L, "short")).toDF("doc_id", "text")
    val bench = Seq("quick brown fox jumps over benchmarks", "zzz")
      .map(Tuple1(_)).toDF("btext")
    val d = Corpus.decontaminate(train, $"doc_id", $"text",
        bench, $"btext", n = 4)
      .select("doc_id", "n_contaminated_grams", "contaminated")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // doc 1 shares 2 distinct 4-grams ("quick brown fox jumps",
    // "brown fox jumps over"); docs 2 and 3 (< n tokens) are clean
    assert(d.toSeq === Seq((1L, 2L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("packSequences + packExplode: exact concat-and-cut coordinates") {
    val d = Seq((0L, 0, 7L), (1L, 0, 0L), (2L, 0, 12L), (3L, 0, 5L),
      (10L, 1, 25L)).toDF("doc_id", "shard", "cnt")
    val packed = Corpus.packSequences(d, $"shard", $"doc_id", $"cnt", seqLen = 10)
    val p = packed.select("doc_id", "tok_start", "tok_end", "seq_first",
        "seq_last", "seq_off")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(p.toSeq === Seq(
      (0L, 0L, 7L, 0L, 0L, 0L),    // fits in seq 0
      (1L, 7L, 7L, 0L, 0L, 7L),    // empty doc carries its boundary
      (2L, 7L, 19L, 0L, 1L, 7L),   // straddles seqs 0 and 1
      (3L, 19L, 24L, 1L, 2L, 9L),  // straddles seqs 1 and 2
      (10L, 0L, 25L, 0L, 2L, 0L))) // shard 1 restarts at token 0
    val e = Corpus.packExplode(packed, seqLen = 10)
      .select("doc_id", "seq_id", "doc_tok_off", "seq_tok_off", "n_toks")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(e.toSeq === Seq(
      (0L, 0L, 0L, 0L, 7L),
      (2L, 0L, 0L, 7L, 3L), (2L, 1L, 3L, 0L, 9L),
      (3L, 1L, 0L, 9L, 1L), (3L, 2L, 1L, 0L, 4L),
      (10L, 0L, 0L, 0L, 10L), (10L, 1L, 10L, 0L, 10L), (10L, 2L, 20L, 0L, 5L)))
    // every shard's sequence slots are tiled exactly: per (shard, seq_id)
    // the slice lengths sum to seqLen except the final partial sequence
    val perSeq = Corpus.packExplode(packed, seqLen = 10)
      .groupBy("shard", "seq_id").agg(sum("n_toks").as("n"))
      .as[(Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(perSeq.toSeq === Seq((0, 0L, 10L), (0, 1L, 10L), (0, 2L, 4L),
      (1, 0L, 10L), (1, 1L, 10L), (1, 2L, 5L)))
  }

  test("vocabTopK: rank ordered by count desc then token asc, capped at k") {
    val d = Seq("b b b a a c", "a c d").map(Tuple1(_)).toDF("text")
    val v = Corpus.vocabTopK(d, $"text", k = 3)
      .select("vocab_id", "token", "n_occurrences")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    // counts: a=3, b=3, c=2, d=1 → tie a/b broken by token asc
    assert(v.toSeq === Seq((0, "a", 3L), (1, "b", 3L), (2, "c", 2L)))
  }

  test("sentences: terminator+spaces splits, empties dropped, indices stable") {
    val d = Seq(
      (1L, "One two. Three four!  Five?"),
      (2L, "No terminator here"),
      (3L, "Trailing dot. "),
      (4L, "a.b stays glued. next")).toDF("doc_id", "text")
    val out = Corpus.sentences(d, col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(byDoc(1L).map(_._3) === Seq("One two.", "Three four!", "Five?"))
    assert(byDoc(1L).map(_._2) === Seq(0, 1, 2))
    assert(byDoc(2L) === Seq((2L, 0, "No terminator here", 18)))
    // trailing ". " leaves an empty tail segment that is dropped
    assert(byDoc(3L) === Seq((3L, 0, "Trailing dot.", 13)))
    // a dot NOT followed by a space never splits
    assert(byDoc(4L).map(_._3) === Seq("a.b stays glued.", "next"))
  }
}
