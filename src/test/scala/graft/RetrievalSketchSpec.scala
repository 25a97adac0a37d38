package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SubstringDedup
import graft.sketch.CountMin
import graft.text.Search

/** Substring-level dedup (windowed suffix-array restriction), Count-Min
  * frequency sketch, and BM25 ranked retrieval. */
class RetrievalSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // ---- SubstringDedup ------------------------------------------------------

  test("tokenWindows emits len-k+1 windows, nothing for short docs") {
    val d = docs(1L -> "a b c d e", 2L -> "x y")
    val w = SubstringDedup.tokenWindows(d, col("doc_id"), col("text"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(w.toSeq === Seq((1L, 0, "a b c"), (1L, 1, "b c d"), (1L, 2, "c d e")))
  }

  test("duplicatedSpans merges touching windows and finds cross-doc repeats") {
    // the 4-token phrase "one two three four" appears in both docs: with k=2
    // its three windows merge into one span of 4 tokens in each doc
    val d = docs(
      1L -> "alpha one two three four beta",
      2L -> "one two three four gamma delta")
    val sp = SubstringDedup.duplicatedSpans(d, col("doc_id"), col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sorted
    // doc 1: tokens 1..5 -> [1, 5); doc 2: tokens 0..4 -> [0, 4)
    assert(sp.toSeq === Seq((1L, 1, 5, 4), (2L, 0, 4, 4)))
  }

  test("duplicatedSpans splits islands when the gap exceeds k") {
    // "p q" repeats at offsets 0 and 6 of doc 1 (gap 6 > k=2) -> two spans
    val d = docs(1L -> "p q m n o r p q", 2L -> "p q z")
    val sp = SubstringDedup.duplicatedSpans(d, col("doc_id"), col("text"), k = 2)
      .filter($"doc_key" === 1L)
      .orderBy("span_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(sp.toSeq === Seq((1, 0, 2), (2, 6, 8)))
  }

  test("stripSpans removes exactly the covered tokens") {
    val d = docs(
      1L -> "alpha one two three four beta",
      2L -> "one two three four gamma delta")
    val out = SubstringDedup.stripSpans(d, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq(
      (1L, "alpha beta", 4), (2L, "gamma delta", 4)))
  }

  test("stripSpans passes untouched documents through") {
    val d = docs(1L -> "all tokens unique here", 2L -> "and these differ too")
    val out = SubstringDedup.stripSpans(d, col("doc_id"), col("text"), k = 2)
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.forall(_._2 === 0))
    assert(out.map(_._1).toSet === Set("all tokens unique here", "and these differ too"))
  }

  // ---- CountMin ------------------------------------------------------------

  test("count-min never undercounts and is exact without collisions") {
    val items = Seq.fill(7)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold")
    val df = items.toDF("item")
    val sk = CountMin.sketch(df, col("item"), depth = 4, width = 512)
    val cand = Seq("hot", "warm", "cold", "absent").toDF("item")
    val est = CountMin.estimate(sk, cand, col("item"), depth = 4, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 7L && est("warm") >= 3L && est("cold") >= 1L)
    // 4 distinct items across 4x512 cells: no collisions, exact
    assert(est === Map("hot" -> 7L, "warm" -> 3L, "cold" -> 1L, "absent" -> 0L))
  }

  test("sketch size is bounded by depth*width regardless of stream size") {
    val df = (1 to 5000).map(i => s"item$i").toDF("item")
    val sk = CountMin.sketch(df, col("item"), depth = 2, width = 16)
    assert(sk.count() <= 32L)
    // total mass per row equals the stream size
    val mass = sk.groupBy("cm_row").agg(sum("cm_cnt").as("m"))
      .collect().map(_.getLong(1))
    assert(mass.toSeq === Seq(5000L, 5000L))
  }

  test("count-min merge of shard sketches equals the whole-stream sketch") {
    val items = (1 to 300).map(i => s"it${i % 40}")
    val (a, b) = items.splitAt(120)
    val whole = CountMin.sketch(items.toDF("item"), col("item"), 3, 64)
    val merged = CountMin.merge(
      CountMin.sketch(a.toDF("item"), col("item"), 3, 64),
      CountMin.sketch(b.toDF("item"), col("item"), 3, 64))
    val w = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w === m)
  }

  test("bloom union of shard filters equals the whole-set filter") {
    val (a, b) = (1 to 100).map(i => s"u$i").splitAt(40)
    val whole = graft.sketch.Bloom.build((a ++ b).toDF("u"), col("u"), 3, 2048)
    val merged = graft.sketch.Bloom.union(
      graft.sketch.Bloom.build(a.toDF("u"), col("u"), 3, 2048),
      graft.sketch.Bloom.build(b.toDF("u"), col("u"), 3, 2048))
    assert(whole.as[Long].collect().sorted.toSeq ===
      merged.as[Long].collect().sorted.toSeq)
  }

  // ---- Search / BM25 -------------------------------------------------------

  test("postings carry tf and dl") {
    val d = docs(1L -> "spark spark table", 2L -> "table")
    val p = Search.postings(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(p === Set((1L, 3, "spark", 2L), (1L, 3, "table", 1L), (2L, 1, "table", 1L)))
  }

  test("bm25 ranks the term-dense short document first") {
    val d = docs(
      1L -> "spark spark spark",
      2L -> "spark filler filler filler filler filler filler filler",
      3L -> "no match here",
      4L -> "spark spark filler")
    val out = Search.bm25(d, col("doc_id"), col("text"), Seq("spark"), topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
    // doc 3 has no query term -> absent; density order 1, 4, 2
    assert(out.map(_._1).toSeq === Seq(1L, 4L, 2L))
    assert(out.forall(_._2 === 1))
    assert(out.map(_._3).toSeq === Seq(1, 2, 3))
  }

  test("bm25 matches a hand-computed score") {
    // one doc, one term: N=2, df=1, idf=ln(1+(2-1+0.5)/1.5)=ln(2);
    // tf=1, dl=2, avgdl=2 -> tfNorm=2.2/(1+1.2)=1.0 -> score=round(ln 2,7)
    val d = docs(1L -> "spark table", 2L -> "row scan")
    val out = Search.bm25(d, col("doc_id"), col("text"), Seq("spark"), topK = 5)
      .collect()
    assert(out.length === 1)
    val expect = BigDecimal(math.log(2.0) * 1.0)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head.getDouble(2) - expect) < 1e-12)
  }

  test("bm25 multi-term scores sum and count matched terms") {
    val d = docs(
      1L -> "spark merge",
      2L -> "spark only doc",
      3L -> "nothing relevant")
    val out = Search.bm25(d, col("doc_id"), col("text"), Seq("spark", "merge"), topK = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 2, 2L -> 1))
  }

  test("tfIdfTopK: rare terms outscore common ones, hand-checked score") {
    // N=3; "spark" in all 3 docs (df=3), "quark" only in doc 1 (df=1)
    val d = docs(
      1L -> "spark quark quark",
      2L -> "spark filler",
      3L -> "spark other")
    val out = Search.tfIdfTopK(d, col("doc_id"), col("text"), k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDecimal(4).doubleValue(), r.getInt(5)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._6)
    // quark: tf=2 df=1 -> (ln(4/2)+1)*2; spark: tf=1 df=3 -> ln(4/4)+1 = 1
    assert(doc1.map(x => (x._2, x._3, x._4)).toSeq ===
      Seq(("quark", 2L, 1L), ("spark", 1L, 3L)))
    val expQuark = BigDecimal((math.log(2.0) + 1.0) * 2.0)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(doc1.head._5 - expQuark) < 1e-12)
    assert(doc1.last._5 === 1.0)
    // every doc contributes at most k rows; docs with 2 terms emit 2
    assert(out.count(_._1 == 2L) === 2)
  }

  test("tfIdfTopK: ties break by term ascending inside the k window") {
    // doc 1 has three distinct singleton terms, all same idf -> same score;
    // k=2 must keep the lexicographically first two
    val d = docs(1L -> "cc bb aa", 2L -> "dd")
    val keep = Search.tfIdfTopK(d, col("doc_id"), col("text"), k = 2)
      .filter(col("doc_key") === 1L).collect()
      .map(r => (r.getString(1), r.getInt(5))).sortBy(_._2)
    assert(keep.map(_._1).toSeq === Seq("aa", "bb"))
  }
}
