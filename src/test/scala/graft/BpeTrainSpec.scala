package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{BpeTrain, TextCore}

/** BPE merge learning: hand-computed merge sequence on the classic
  * low/lower/newest/widest corpus, scan-semantics pinning, helpers. */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bpeCharSeq: sentinel-delimited codepoint symbols + end marker") {
    assert(TextCore.bpeCharSeq("low") === " l o w </w> ")
    assert(TextCore.bpeCharSeq("a") === " a </w> ")
    assert(TextCore.bpeCharSeq("") === " </w> ")
    // astral-plane codepoint stays one symbol
    assert(TextCore.bpeCharSeq(new String(Character.toChars(0x1F600))) ===
      " 😀 </w> ")
  }

  test("spacePairs: adjacent symbol pairs") {
    assert(TextCore.spacePairs(" l o w </w> ").toSeq ===
      Seq("l o", "o w", "w </w>"))
    assert(TextCore.spacePairs(" a </w> ").toSeq === Seq("a </w>"))
    assert(TextCore.spacePairs(" x ").toSeq === Seq.empty)
  }

  test("learnMerges reproduces the hand-computed classic merge sequence") {
    // low:5 lower:2 newest:6 widest:3 — the Sennrich et al. teaching corpus
    val doc = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, doc)).toDF("doc_id", "text")
    val got = BpeTrain.learnMerges(docs, col("text"), rounds = 5)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)))
  }

  test("merge rewrite scan semantics: odd run leaves the singleton mid-run") {
    // both Spark and DuckDB replace() scan left-to-right continuing after
    // each match; the doubled application realizes the full disjoint merge
    val r = spark.sql(
      "SELECT replace(replace(' a a a a a </w> ', ' a a ', ' aa '), ' a a ', ' aa ')")
      .head().getString(0)
    assert(r === " aa a aa </w> ")
    val r2 = spark.sql(
      "SELECT replace(replace(' a b a b </w> ', ' a b ', ' ab '), ' a b ', ' ab ')")
      .head().getString(0)
    assert(r2 === " ab ab </w> ")
  }

  test("token filter excludes non-matching words from training") {
    val docs = Seq((1L, "aa aa über über über")).toDF("doc_id", "text")
    // default filter: ascii lower alnum only — "über" sits out; (a,</w>) and
    // (a,a) tie at 2 and "a </w>" < "a a" ('<' sorts before 'a')
    val got = BpeTrain.learnMerges(docs, col("text"), rounds = 1)
      .collect().map(_.getString(3)).toSeq
    assert(got === Seq("a</w>"))
    // with the filter open, über's pairs (n=3) dominate; tie cuts at "b e"
    val open = BpeTrain.learnMerges(docs, col("text"), rounds = 1,
      tokenFilter = ".*").collect().map(_.getString(3)).toSeq
    assert(open === Seq("be"))
  }

  test("applyMerges counts learned-BPE tokens per document") {
    // words: ab(3), ba(1) -> learned merges: ab, ab</w>, a</w>, ba</w>
    val docs = Seq((1L, "ab ab"), (2L, "ba ab öö")).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, col("text"), rounds = 10)
    assert(merges.orderBy("merge_rank").collect().map(_.getString(3)).toSeq ===
      Seq("ab", "ab</w>", "a</w>", "ba</w>"))
    val got = BpeTrain.applyMerges(docs, col("doc_id"), col("text"), merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // every ascii word collapses to ONE symbol under the learned merges;
    // "öö" is excluded by the token filter (as in training)
    assert(got === Seq((1L, 2L), (2L, 2L)))
  }

  test("fewer merges than rounds when pairs run dry") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = BpeTrain.learnMerges(docs, col("text"), rounds = 10)
      .orderBy("merge_rank").collect()
    // " a b </w> " -> merge (a,b) -> " ab </w> " -> merge (ab,</w>) ->
    // " ab</w> " -> no pairs left
    assert(got.length === 2)
    assert(got(0).getString(3) === "ab")
    assert(got(1).getString(3) === "ab</w>")
  }
}
