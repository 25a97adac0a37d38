package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Dsir

/** DSIR importance resampling: hashed-ngram LLR weights + top-k selection. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Two disjoint vocabularies: target docs speak "alpha", the rest "zeta".
  private def corpus = Seq(
    (1L, "alpha beta alpha beta gamma", true),
    (2L, "alpha gamma beta alpha", true),
    (3L, "zeta eta theta zeta eta", false),
    (4L, "theta zeta eta theta", false),
    (5L, "alpha beta gamma alpha beta", false), // raw doc with target vocab
    (6L, "", false))
    .toDF("doc_id", "text", "is_t")

  test("target-vocabulary docs outscore raw-vocabulary docs") {
    val w = Dsir.dsirSelect(corpus, col("doc_id"), col("text"), col("is_t"),
        k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)).map(_.toString.toDouble),
          r.getBoolean(3))).toMap
    // the raw doc written in target vocabulary scores like the target docs
    assert(w(5L)._2.get > w(3L)._2.get && w(5L)._2.get > w(4L)._2.get)
    assert(w(1L)._2.get > w(3L)._2.get)
    // top-3 = the three target-vocab docs, NOT the target flag itself
    assert(Seq(1L, 2L, 5L).map(w(_)._3) === Seq(true, true, true))
    assert(Seq(3L, 4L, 6L).map(w(_)._3) === Seq(false, false, false))
    // empty doc: no features, null weight, never selected
    assert(w(6L)._1 === 0 && w(6L)._2.isEmpty)
    // n_feats = n_tokens + n_bigrams
    assert(w(1L)._1 === 5 + 4)
  }

  test("k larger than the corpus selects every weighted doc") {
    val w = Dsir.dsirSelect(corpus, col("doc_id"), col("text"), col("is_t"),
        k = 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(w(_)))
    assert(!w(6L)) // null weight stays unselected
  }

  test("selection plan: TakeOrdered threshold, no global sort of the corpus") {
    val plan = Dsir.dsirSelect(corpus, col("doc_id"), col("text"),
        col("is_t"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Sort [dsir_logw"), "corpus must never globally sort")
  }
}
