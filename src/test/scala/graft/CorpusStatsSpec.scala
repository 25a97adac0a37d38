package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.QuantileHist
import graft.text.Cooccur

/** PMI collocations and the mergeable log-histogram quantile sketch. */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bigram LM: hand-derived interpolation, empty docs null out") {
    val docs = Seq((1L, "a b"), (2L, "a c c"), (3L, "!!!"))
      .toDF("doc_id", "text")
    val got = graft.text.TextAnalysis
      .bigramLmScore(docs, $"doc_id", $"text", lam = 0.7)
      .orderBy("doc_key").collect()
    def r7(x: Double) = BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    val lam = 0.7; val back = 1.0 - lam
    // uni: a:2 b:1 c:2, N=5; bigrams: (a,b):1 (a,c):1 (c,c):1
    val f = r7(math.log(2.0 / 5))
    val d1 = (f + r7(math.log(lam * (1.0 / 2) + back * (1.0 / 5)))).toDouble / 2
    val p2 = r7(math.log(lam * (1.0 / 2) + back * (2.0 / 5)))
    val d2 = (f + p2 + p2).toDouble / 3
    assert(got(0).getInt(1) === 2)
    assert(math.abs(got(0).getDouble(2) - d1) < 1e-9)
    assert(got(1).getInt(1) === 3)
    assert(math.abs(got(1).getDouble(2) - d2) < 1e-9)
    assert(got(2).getInt(1) === 0)
    assert(got(2).isNullAt(2))
  }

  test("quantile bucket: upper bound covers v within 25% relative error") {
    val vals = (Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 100L, 1000L, 12345L,
      1000000L) ++ (1 to 20).map(i => (1L << i) - 1) ++
      (1 to 20).map(i => 1L << i)).distinct
    val r = QuantileHist.cells(vals.toDF("v").withColumn("k", lit("x")),
      col("k"), col("v"))
    // every value's bucket upper bound is >= the value and within 25%
    val df = vals.toDF("v").withColumn("k", lit("x"))
      .select(col("v"))
      .withColumn("b", expr(
        "CAST(CASE WHEN v < 4 THEN v ELSE (length(bin(v)) - 1) * 4 + " +
        "(shiftright(v, CAST(length(bin(v)) AS INT) - 3) & 3) END AS INT)"))
      .withColumn("ub", expr(
        "CASE WHEN b < 4 THEN CAST(b AS BIGINT) ELSE " +
        "shiftleft(CAST(b % 4 + 5 AS BIGINT), (b div 4) - 2) - 1 END"))
      .collect()
    df.foreach { row =>
      val (v, ub) = (row.getLong(0), row.getLong(2))
      assert(ub >= v, s"v=$v ub=$ub")
      assert(ub.toDouble <= math.max(v.toDouble * 1.25, 3.0), s"v=$v ub=$ub")
    }
    assert(r.count() > 0)
  }

  test("quantiles: exact on small-value domain, thresholds correct") {
    // values < 4 are their own buckets -> the sketch is exact there
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 0L), ("b", 3L)).toDF("k", "v")
    val q = QuantileHist.sketch(df, col("k"), col("v"), Seq(50, 100))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // a: [1,1,2,3] -> p50 threshold ceil(2)=2 -> bucket 1; p100 -> 3
    assert(q(("a", 50)) === 1L)
    assert(q(("a", 100)) === 3L)
    // b: [0,3] -> p50 threshold 1 -> bucket 0; p100 -> 3
    assert(q(("b", 50)) === 0L)
    assert(q(("b", 100)) === 3L)
  }

  test("quantile merge == one-shot sketch (mergeability)") {
    val df = (0 until 500).map(i => (s"g${i % 3}", (i * i % 9973).toLong))
      .toDF("k", "v")
    val direct = QuantileHist.sketch(df, col("k"), col("v"), Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val shards = (0 until 4).map(i =>
      QuantileHist.cells(df.filter(pmod(col("v"), lit(4L)) === i),
        col("k"), col("v")))
    val merged = QuantileHist.quantiles(
        QuantileHist.merge(shards.reduce(_ unionByName _)), Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(merged === direct)
  }

  test("logit quality: clean English keeps, punctuation soup drops") {
    val docs = Seq(
      (1L, "the cat and the dog ran to the house in the morning and it was " +
        "warm for them so they stayed out in the sun"),
      (2L, "!!! ??? *** &&& $$$ %%% @@@ ###")).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.withLogitQuality(docs)
      .select(col("doc_id"), col("p_keep")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > 0.5, s"clean text p=${r(1L)}")
    assert(r(2L) < 0.5, s"soup p=${r(2L)}")
  }

  test("pmiTopK: planted collocation outranks independent pairs") {
    // "zq xv" always co-occur (20x); filler tokens pair up independently
    val docs = ((1 to 20).map(i => s"zq xv common$i") ++
      (1 to 20).map(i => s"alpha beta gamma delta common$i") ++
      (1 to 20).map(i => s"beta alpha delta gamma")).toDF("text")
    val r = Cooccur.pmiTopK(docs, col("text"), minPairCount = 5, k = 10)
      .collect()
    val top = r.head
    assert(top.getAs[String]("tok_a") === "zq")
    assert(top.getAs[String]("tok_b") === "xv")
    assert(top.getAs[Long]("n_ab") === 20L)
    assert(top.getAs[Long]("n_a") === 20L && top.getAs[Long]("n_b") === 20L)
    // pmi descending and > 0 for the planted pair
    assert(top.getAs[Double]("pmi6") > 0.0)
    val pmis = r.map(_.getAs[Double]("pmi6"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
  }

  test("Gopher rule gate: each rule trips on its own planted violation") {
    import graft.text.TextAnalysis
    val good = (("the deal is that we have to be of one mind and go " * 5) +
      "morewords plainly wordsmith herein").trim // 69 words, mean len 3.13, passes
    val docs = Seq(
      (1L, good),
      (2L, "too few words the of"),                      // word-count rule
      (3L, good + (" ################" * 2)),            // symbol ratio (mean len ok)
      (4L, good.split(' ').map("- " + _).mkString("\n")), // all bullet lines
      (5L, good + "...\nwait...\nmore..."),              // ellipsis-end lines
      (6L, good + (" 123 456 789 000" * 8)),             // alpha-word ratio
      (7L, ("zq xv wk jm " * 20).trim)                   // no required stopwords
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withGopherRules(docs)
      .orderBy("doc_id").collect()
    def keep(i: Int) = r(i).getAs[Boolean]("gopher_keep")
    assert(keep(0), "clean doc must pass every rule")
    assert(!keep(1) && r(1).getAs[Long]("n_words") < 50L)
    assert(!keep(2) && r(2).getAs[Double]("symbol_ratio") > 0.1)
    assert(!keep(3) && r(3).getAs[Double]("bullet_ratio") > 0.9)
    assert(!keep(4) && r(4).getAs[Double]("ellipsis_ratio") > 0.3)
    assert(!keep(5) && r(5).getAs[Double]("alpha_ratio") < 0.8)
    assert(!keep(6) && r(6).getAs[Long]("n_req_stopwords") < 2L)
    // per-rule columns: the clean doc's values are exactly hand-derivable
    assert(r(0).getAs[Long]("n_words") === 69L)
    assert(r(0).getAs[Long]("n_req_stopwords") === 7L)
    assert(r(0).getAs[Double]("bullet_ratio") === 0.0)
    assert(r(0).getAs[Double]("symbol_ratio") === 0.0)
  }
}
