package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{Quantize, Similarity, VecCore}

/** SQ8 embedding quantization: code bounds, ties-away rounding, exact
  * integer dots, and the two-phase search's equivalence to brute force when
  * the shortlist covers the corpus. */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = sys.env.getOrElse("GRAFT_TEST_SF", "/root/testdata/sf0.001")

  test("int8Pack: bounded, sign-preserving, max component hits +-127") {
    val v = Array(0.5f, -1.0f, 0.25f, 0.0f, 1.0f)
    val c = VecCore.int8Pack(v)
    assert(c.forall(b => b >= -127 && b <= 127))
    assert(c(1) === -127 && c(4) === 127 && c(3) === 0)
    assert(c(0) === 64) // 0.5*127 = 63.5 -> ties away -> 64
    assert(c(2) === 32) // 0.25*127 = 31.75 -> 32
  }

  test("ties round AWAY from zero on both signs") {
    // maxAbs = 127 so x_i = v_i exactly; +-2.5 are exact binary ties
    val c = VecCore.int8Pack(Array(2.5f, -2.5f, 127f))
    assert(c(0) === 3 && c(1) === -3)
  }

  test("zero vector packs to all-zero codes (no division blowup)") {
    assert(VecCore.int8Pack(Array(0f, 0f, 0f)).forall(_ === 0))
  }

  test("int8Dot is the exact integer dot") {
    val a = Array[Byte](127, -127, 3, 0, -50)
    val b = Array[Byte](-127, -127, 7, 99, 2)
    val expect = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    assert(VecCore.int8Dot(a, b) === expect)
  }

  test("int8RerankKnn with a corpus-wide shortlist equals brute force") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(80).cache()
    val n = e.count().toInt
    val q = e.filter($"vec_id" < 4)
    assert(q.count() === 4) // limit(80) must have kept the query ids
    val brute = Similarity.bruteForceKnn(q, e, k = 5)
      .select("query_id", "knn_rank", "item_id")
      .as[(Long, Int, Long)].collect().toSet
    val reranked = Quantize.int8RerankKnn(q, e, k = 5, shortlist = n)
      .select("query_id", "knn_rank", "item_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(reranked === brute)
  }

  test("int8 shortlist recalls planted near-identical neighbours at rank 1") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(60)
    val planted = e.filter($"vec_id" < 4)
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id + 100000L, v.map(x => x * 0.9f)) }
    val corpus = e.unionByName(planted.toSeq.toDF("vec_id", "embedding"))
    val top1 = Quantize.int8Knn(e.filter($"vec_id" < 4), corpus, k = 1)
      .select("query_id", "item_id").as[(Long, Long)].collect().toMap
    (0L until 4L).foreach { id => assert(top1(id) === id + 100000L) }
  }
}
