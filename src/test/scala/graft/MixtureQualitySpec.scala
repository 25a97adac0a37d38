package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.Bloom
import graft.text.{Corpus, TextAnalysis}

/** Temperature-scaled source mixing, unigram-LM quality scoring, and the
  * portable Bloom filter. */
class MixtureQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- temperatureMix ------------------------------------------------------

  private def mixDocs = (1L to 400L).map { i =>
    // source a: 300 docs, source b: 100 docs, 10 tokens each
    (i, if (i <= 300) "a" else "b", 10L)
  }.toDF("doc_id", "source", "n_tok")

  test("alpha=1 with full budget keeps everything at natural proportions") {
    val out = Corpus.temperatureMix(mixDocs, col("source"), col("doc_id"),
      col("n_tok"), alpha = 1.0, budgetFraction = 1.0)
    // rate = p_s * summass / mass = 1 for every source
    assert(out.count() === 400L)
    assert(out.select("rate_ppm").distinct().as[Long].collect().toSeq === Seq(1000000L))
  }

  test("alpha<1 upweights the small source relative to natural share") {
    val out = Corpus.temperatureMix(mixDocs, col("source"), col("doc_id"),
      col("n_tok"), alpha = 0.5, budgetFraction = 0.5)
    val rates = out.select("source", "rate_ppm").distinct()
      .as[(String, Long)].collect().toMap
    // masses 3000/1000; w = sqrt -> p_a ~ 0.634, p_b ~ 0.366
    // rate_a = .634*.5*4000/3000 ~ 0.423; rate_b = .366*.5*4000/1000 ~ 0.732
    assert(rates("b") > rates("a"))
    assert(math.abs(rates("a") - 422650L) < 5)
    assert(math.abs(rates("b") - 732051L) < 5)
    // kept counts track the rates (sha60 coin is uniform-ish)
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("a") - 300.0 * 0.4227) < 45)
    assert(math.abs(kept("b") - 100.0 * 0.7321) < 30)
  }

  test("mix is deterministic and rates clamp at 1") {
    val a = Corpus.temperatureMix(mixDocs, col("source"), col("doc_id"),
      col("n_tok"), alpha = 0.3, budgetFraction = 1.0)
    val b = Corpus.temperatureMix(mixDocs, col("source"), col("doc_id"),
      col("n_tok"), alpha = 0.3, budgetFraction = 1.0)
    assert(a.select("doc_id").as[Long].collect().sorted.toSeq ===
      b.select("doc_id").as[Long].collect().sorted.toSeq)
    assert(a.agg(max("rate_ppm")).as[Long].head() <= 1000000L)
  }

  // ---- lmScore -------------------------------------------------------------

  test("lmScore matches a hand-computed mean log-prob") {
    // corpus: "x x y" + "y z": counts x=2 y=2 z=1, total=5
    val d = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    def dec(x: Double) = BigDecimal(x)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP)
    val lx = dec(math.log(2.0 / 5)); val lz = dec(math.log(1.0 / 5))
    val exp1 = ((lx + lx + lx) / 3).toDouble  // ln(2/5) for all three tokens
    val exp2 = ((lx + lz).toDouble) / 2
    assert(math.abs(out(1L)._2 - exp1) < 1e-12 && out(1L)._1 === 3)
    assert(math.abs(out(2L)._2 - exp2) < 1e-9 && out(2L)._1 === 2)
  }

  test("lmScore ranks typical text above rare-token text; empty doc null") {
    val d = Seq((1L, "the the the the"), (2L, "zq"), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1L)._2.get > out(2L)._2.get)
    assert(out(3L) === ((0, None)))
  }

  // ---- knBigramLmScore -----------------------------------------------------

  test("knBigramLmScore matches hand-computed Kneser-Ney chain") {
    // corpus: "x y x y" + "y z"
    // bigram types: (x,y):2 (y,x):1 (y,z):1 -> T=3; vocab V=3
    // pref: x (c_a=2, fwd=1), y (c_a=2, fwd=2); fan-in: x=1 y=1 z=1
    val d = Seq((1L, "x y x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLmScore(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    def dec(x: Double) = BigDecimal(x)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP)
    // first token: ln((fan_in + 1) / (T + V))
    val f_x = dec(math.log(2.0 / 6))            // doc1 starts with x
    val f_y = dec(math.log(2.0 / 6))            // doc2 starts with y
    // (x,y): (max(2-.75,0) + .75*1*(1/3)) / 2 = 0.75
    val p_xy = dec(math.log((1.25 + 0.75 * 1.0 * (1.0 / 3)) / 2))
    // (y,x) and (y,z): (0.25 + .75*2*(1/3)) / 2 = 0.375
    val p_yx = dec(math.log((0.25 + 0.75 * 2.0 * (1.0 / 3)) / 2))
    val exp1 = (f_x + p_xy + p_yx + p_xy).toDouble / 4
    val exp2 = (f_y + p_yx).toDouble / 2
    assert(out(1L)._1 === 4)
    assert(math.abs(out(1L)._2 - exp1) < 1e-9)
    assert(math.abs(out(2L)._2 - exp2) < 1e-9)
  }

  test("knBigramLmScore: empty doc null, single-token doc scores first term") {
    val d = Seq((1L, "x y"), (2L, "x"), (3L, " ")).toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLmScore(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(3L) === ((0, None)))
    // doc 2: one token "x", fan-in(x)=0 (never a continuation), T=1, V=2
    // -> ln((0+1)/(1+2)) = ln(1/3)
    val exp = BigDecimal(math.log(1.0 / 3))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble / 1
    assert(out(2L)._1 === 1)
    assert(math.abs(out(2L)._2.get - exp) < 1e-9)
  }

  // ---- ccnetBuckets ----------------------------------------------------------

  test("ccnetBuckets: thresholds ordered, buckets respect the integer NLL") {
    // three perplexity strata separated by well over the sketch's 25%
    // bucket width: pure repetition (very low NLL), one rare token in a
    // common frame, and all-unique tokens (NLL ~ ln corpus size per token)
    val docs = ((1L to 10L).map(i => (i, "the the the the the the")) ++
      (11L to 20L).map(i => (i, s"the cat uniq$i mat")) ++
      (21L to 30L).map(i =>
        (i, s"zq$i wv$i kj$i mn$i pq$i rs$i uv$i ab$i cd$i ef$i")))
      .toDF("doc_id", "text")
    val out = Corpus.ccnetBuckets(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(out.length === 30)
    val (t33, t66) = (out.head._3, out.head._4)
    assert(t33 <= t66)
    // bucket is exactly the integer comparison against the thresholds
    out.foreach { case (_, nll, lo, hi, b) =>
      val expect = if (nll <= lo) "head" else if (nll <= hi) "middle" else "tail"
      assert(b === expect, s"nll=$nll lo=$lo hi=$hi")
    }
    // the strata land in order: repetitive docs never in tail, unique never in head
    val byBucket = out.groupBy(_._5).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert((1L to 10L).forall(i => !byBucket("tail").contains(i)))
    assert((21L to 30L).forall(i => !byBucket("head").contains(i)))
    // every head NLL <= every middle NLL <= every tail NLL
    def nlls(b: String) = out.filter(_._5 == b).map(_._2)
    assert(nlls("head").max <= nlls("middle").min)
    assert(nlls("middle").max <= nlls("tail").min)
  }

  // ---- hashEmbed -------------------------------------------------------------

  test("hashEmbed: sha60-derived buckets and signs, empty doc emits nothing") {
    val d = Seq((1L, "a b a"), (2L, "   "), (3L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.hashEmbed(d, col("doc_id"), col("text"), dims = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def h(t: String) = graft.text.TextCore.sha60("fh:" + t)
    def k(t: String) = (h(t) % 8).toInt
    def s(t: String) = if (((h(t) >> 1) & 1) == 0L) 1L else -1L
    val expect = Seq("a", "b", "a").map(t => (k(t), s(t)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got1 = out.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(got1 === expect)
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L).toSeq === Seq((3L, k("c"), s("c"))))
  }

  // ---- nfcNorm ---------------------------------------------------------------

  test("nfcNorm composes combining marks and is identity on ASCII") {
    val d = Seq((1L, "cafe\u0301 A\u030A n\u0303o"), (2L, "plain ascii"))
      .toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        graft.functions.TextFunctions.nfcNorm(col("text")).as("n"),
        length(col("text")).as("lr"),
        length(graft.functions.TextFunctions.nfcNorm(col("text"))).as("ln"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L)._1 === "caf\u00e9 \u00c5 \u00f1o")
    assert(out(1L)._2 === 12 && out(1L)._3 === 9)
    assert(out(2L) === (("plain ascii", 11, 11)))
  }

  // ---- Bloom ---------------------------------------------------------------

  test("bloom has no false negatives and bounded size") {
    val set = (1 to 200).map(i => s"url$i").toDF("u")
    val bf = Bloom.build(set, col("u"), k = 3, m = 4096)
    assert(bf.count() <= 600L)
    val cand = (1 to 400).map(i => s"url$i").toDF("u")
    val out = Bloom.mightContain(bf, cand, col("u"), k = 3, m = 4096)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // every member hits
    assert((1 to 200).forall(i => out(s"url$i")))
    // non-members mostly miss (fp rate ~ (600/4096)^3 ~ 0.3%)
    val fps = (201 to 400).count(i => out(s"url$i"))
    assert(fps <= 5)
  }

  test("bloom membership is exact when m is huge") {
    val set = Seq("a", "b").toDF("u")
    val bf = Bloom.build(set, col("u"), k = 4, m = 1 << 20)
    val out = Bloom.mightContain(bf, Seq("a", "b", "c", "d").toDF("u"),
      col("u"), k = 4, m = 1 << 20)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out === Map("a" -> true, "b" -> true, "c" -> false, "d" -> false))
  }

  test("charDistribution: hand-computed gini/entropy, degenerate vs diverse") {
    val df = Seq(
      (1L, "aaaa"),          // one class: gini 0, entropy 0
      (2L, "ab"),            // two equal classes: gini 0.5, entropy 1 bit
      (3L, "aAaA"),          // lowercased -> one class
      (4L, "a1 b~")          // a,1,space,b + other(~): 5 classes of 1
    ).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.withCharDistribution(df)
      .select("doc_id", "n_chars_cd", "n_char_classes", "char_gini_ppm",
        "char_entropy_b6")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getInt(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r(1L) === ((4L, 1, 0L, 0.0)))
    // gini = 1 - 2*(1/2)^2 = 0.5 -> 500000 ppm; entropy = 1 bit
    assert(r(2L) === ((2L, 2, 500000L, 1.0)))
    assert(r(3L) === ((4L, 1, 0L, 0.0)))
    // 5 singleton classes in 5 chars: gini = 1 - 5/25 = 0.8; entropy log2 5
    assert(r(4L)._1 === 5L)
    assert(r(4L)._2 === 5)
    assert(r(4L)._3 === 800000L)
    assert(math.abs(r(4L)._4 - 2.321928) < 1e-6)
  }
}
