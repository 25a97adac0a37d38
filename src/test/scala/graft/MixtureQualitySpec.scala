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
