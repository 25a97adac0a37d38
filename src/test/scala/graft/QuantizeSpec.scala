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

  // ---- product quantization (ADC) ----

  test("int8PackScaled: clamped, zero on non-positive scale, global-scale codes") {
    val v = Array(0.5f, -1.0f, 2.0f)
    assert(VecCore.int8PackScaled(v, 0.0).forall(_ === 0))
    val c = VecCore.int8PackScaled(v, 2.0)
    assert(c.toSeq === Seq(32, -64, 127)) // 0.5*63.5=31.75->32; -63.5->ties away -64
    // scale below a component clamps instead of overflowing the byte
    assert(VecCore.int8PackScaled(Array(4.0f), 2.0).head === 127)
  }

  test("pqEncode picks the integer-L2 argmin per subspace, first index on ties") {
    // dim=4, m=2, sub=2, ks=2: books = rows [1,2,3,4] and [5,6,3,4]
    val books = Array[Byte](1, 2, 3, 4, 5, 6, 3, 4)
    val code = Array[Byte](5, 6, 3, 4)
    val codes = VecCore.pqEncode(code, books, m = 2, ks = 2)
    assert(codes(0) === 1) // (5,6) exactly matches row 1's first subspace
    assert(codes(1) === 0) // (3,4) ties between rows -> first index wins
  }

  test("pqAdc equals the direct query-centroid reconstruction dot") {
    val books = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8) // ks=2, dim=4
    val q = Array[Byte](10, -3, 7, 2)
    val lut = VecCore.pqLut(q, books, m = 2, ks = 2)
    val codes = Array[Byte](1, 0)
    val est = VecCore.pqAdc(lut, codes, ks = 2)
    // reconstruction: subspace 0 -> row 1 comps (5,6); subspace 1 -> row 0 (3,4)
    val expect = 10L * 5 + -3L * 6 + 7L * 3 + 2L * 4
    assert(est === expect)
  }

  test("pqKnn is deterministic and recalls planted duplicates at rank 1") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(120).cache()
    // an exact duplicate quantizes to the same codes, so its ADC estimate
    // ties the self-match (excluded) and must surface at rank 1
    val planted = e.filter($"vec_id" < 4)
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id + 100000L, v) }
    val corpus = e.unionByName(planted.toSeq.toDF("vec_id", "embedding"))
    val q = e.filter($"vec_id" < 4)
    val r1 = Quantize.pqKnn(q, corpus, k = 3).collect().map(_.toSeq)
    val r2 = Quantize.pqKnn(q, corpus, k = 3).collect().map(_.toSeq)
    assert(r1.toSeq === r2.toSeq)
    val top1 = Quantize.pqKnn(q, corpus, k = 1)
      .select("query_id", "item_id").as[(Long, Long)].collect().toMap
    (0L until 4L).foreach { id => assert(top1(id) === id + 100000L) }
  }

  test("ivfPqKnn with exhaustive probing equals the flat PQ-ADC result") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(120).cache()
    val q = e.filter($"vec_id" < 4)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "knn_rank", "item_id", "est")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(key(Quantize.ivfPqKnn(q, e, k = 5, nlist = 8, nprobe = 8)) ===
      key(Quantize.pqKnn(q, e, k = 5)))
  }

  test("ivfPqKnn at nprobe=1 recalls an exact duplicate (it shares the query's list)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(120).cache()
    val planted = e.filter($"vec_id" < 4)
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id + 100000L, v) }
    val corpus = e.unionByName(planted.toSeq.toDF("vec_id", "embedding"))
    val q = e.filter($"vec_id" < 4)
    // identical vector -> identical nearest coarse centroid -> the
    // duplicate's posting list IS the query's first probe, at any nprobe
    val top1 = Quantize.ivfPqKnn(q, corpus, k = 1, nlist = 8, nprobe = 1)
      .select("query_id", "item_id").as[(Long, Long)].collect().toMap
    (0L until 4L).foreach { id => assert(top1(id) === id + 100000L) }
  }

  test("bucketed IVF+PQ: bucket-pruned scan, no codes-side shuffle, equals flat PQ-ADC") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").filter($"vec_id" < 120).cache()
    val cents = graft.sim.Similarity.trainIvfCentroids(e, nlist = 8, iters = 1)
    val (scale, books) = Quantize.pqTrainBooks(e, ks = 16)
    Quantize.writeIvfPqBucketed(spark, e, cents, scale, books,
      "graft_ivfpq_test", s"$wh/ivfpq", buckets = 4)
    val q = e.filter($"vec_id" < 4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val knn = Quantize.ivfPqKnnBucketed(spark, "graft_ivfpq_test", q,
        k = 3, nprobe = 2, cents, scale, books)
      val plan = knn.queryExecution.executedPlan
      assert(plan.toString.contains("SelectedBucketsCount"),
        s"expected bucket pruning in plan:\n$plan")
      val shuffles = plan.collect {
        case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
      }
      assert(shuffles.size == 1, s"unexpected codes-side shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // exhaustive probing over the persisted layout == flat PQ-ADC
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "knn_rank", "item_id", "est")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(key(Quantize.ivfPqKnnBucketed(spark, "graft_ivfpq_test", q,
        k = 5, nprobe = 8, cents, scale, books)) ===
      key(Quantize.pqKnn(q, e, k = 5)))
    spark.sql("DROP TABLE IF EXISTS graft_ivfpq_test")
    e.unpersist()
  }

  test("pqKnn plan: corpus side is map-only to codes; one exchange (final top-k)") {
    // filter, not limit: LocalLimit/GlobalLimit would inject its own
    // SinglePartition exchange and hide the shape under test
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").filter($"vec_id" < 100)
    val p = Quantize.pqKnn(e.filter($"vec_id" < 4), e, k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "corpus must never sort-merge")
    // the per-query top-k window is the plan's ONLY shuffle: every other
    // Exchange must be the query-side broadcast (codes projection map-only)
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    assert(shuffles == 1, s"expected exactly 1 shuffle (final top-k), got $shuffles:\n$p")
  }
}
