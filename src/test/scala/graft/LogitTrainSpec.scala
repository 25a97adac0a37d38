package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.LogitTrain

/** Full-batch logistic-GD training of the quality filter. */
class LogitTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))

  test("separable data: weights move to separate, loss decreases") {
    // positives live at f=1, negatives at f=0
    val ftab = ((1 to 20).map(_ => (1.0, 1.0)) ++
      (1 to 20).map(_ => (0.0, 0.0))).toDF("f", "y")
    val hist = LogitTrain.train(ftab, Seq("f"), "y", rounds = 25, lr = 2.0)
    assert(hist.length === 26)
    assert(hist.head === ((0, Vector(0.0, 0.0))))
    val Vector(b, w) = hist.last._2
    assert(w > 0.0, "feature weight must turn positive")
    assert(b < 0.0, "bias must turn negative")
    assert(sigmoid(b + w) > 0.75 && sigmoid(b) < 0.25,
      "trained model must separate the classes")
    // full-batch GD on a convex loss with a sane lr: loss strictly improves
    def loss(ws: Vector[Double]) = {
      val p1 = sigmoid(ws(0) + ws(1)); val p0 = sigmoid(ws(0))
      -(math.log(p1) + math.log(1.0 - p0)) / 2.0
    }
    assert(loss(hist.last._2) < loss(hist(1)._2))
  }

  test("gradient round 1 from zero init is the closed-form value") {
    // at w=0, p=0.5 for every row, so g_f = sum((0.5 - y) * f) / 1 and the
    // update is w -= lr * g / n
    val ftab = Seq((1.0, 1.0), (1.0, 1.0), (0.0, 0.0), (2.0, 0.0))
      .toDF("f", "y")
    val h = LogitTrain.train(ftab, Seq("f"), "y", rounds = 1, lr = 0.5)
    val g_b = (0.5 - 1.0) + (0.5 - 1.0) + (0.5 - 0.0) + (0.5 - 0.0) // = 0
    val g_f = (0.5 - 1.0) * 1 + (0.5 - 1.0) * 1 + 0.0 + (0.5 - 0.0) * 2
    assert(h.last._2(0) === -0.5 * (g_b / 4.0))
    assert(h.last._2(1) === -0.5 * (g_f / 4.0))
  }

  test("trainQuality emits the iter-by-iter weight history") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", "src0"),
      (2L, "word word word word word and the of to in is that", "src1"),
      (3L, "@@@@ #### 1234 !!!! %%%% ^^^^ 5678 &&&& **** ((((", "src5"),
      (4L, "numbers 111 222 333 444 555 666 777 888 999 000", "src7"))
      .toDF("doc_id", "text", "source")
    val out = LogitTrain.trainQuality(spark, docs,
      col("source").isin("src0", "src1"), rounds = 3, lr = 0.5)
    assert(out.columns.toSeq ===
      Seq("iter", "b", "w_ntok", "w_mtl", "w_punct", "w_digit", "w_stop"))
    val rows = out.orderBy("iter").collect()
    assert(rows.length === 4)
    assert((1 to 6).forall(j => rows(0).getDouble(j) === 0.0))
    // clean-text positives vs punct/digit-heavy negatives: the punct and
    // digit weights must come out negative, the stopword weight positive
    assert(rows(3).getDouble(4) < 0.0 && rows(3).getDouble(5) < 0.0)
    assert(rows(3).getDouble(6) > 0.0)
  }
}
