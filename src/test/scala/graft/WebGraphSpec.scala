package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.Kmv
import graft.web.LinkGraph

/** Link-graph centrality (fixed-point PageRank) and the KMV cardinality
  * sketch. */
class WebGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pageRank: known graph, mass accounting, determinism") {
    // star: 1,2,3 all link to 0; 0 links to 1.
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val r = LinkGraph.pageRank(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(0L, 1L, 2L, 3L))
    // hub 0 outranks its spokes; pure sources 2,3 sit at the base rank
    assert(r(0L) > r(1L) && r(1L) > r(2L))
    assert(r(2L) === r(3L))
    // fixed-point mass: total <= Scale (integral truncation only loses),
    // and stays within 1% of it (no dangling nodes in this graph)
    val total = r.values.sum
    assert(total <= LinkGraph.Scale)
    assert(total > LinkGraph.Scale * 99L / 100L)
    // bit-reproducible across runs (the property floats would not give)
    val r2 = LinkGraph.pageRank(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === r2)
  }

  test("pageRank: damping 100 keeps no base mass, 0 is uniform") {
    val e = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val uniform = LinkGraph.pageRank(e, iters = 2, dampingPct = 0).collect()
    assert(uniform.map(_.getLong(1)).distinct.length === 1)
    val cycle = LinkGraph.pageRank(e, iters = 3, dampingPct = 100).collect()
    // a 2-cycle with full damping just circulates the initial mass
    assert(cycle.map(_.getLong(1)).forall(_ === LinkGraph.Scale / 2))
  }

  test("kmvDistinct: exact below k, estimate within 50% above k") {
    val df = (0 until 400).map(i => (s"g${i % 4}", s"v${i % (50 * (i % 4 + 1))}"))
      .toDF("g", "v")
      .unionByName(Seq(("small", "a"), ("small", "b"), ("small", "a"))
        .toDF("g", "v"))
    val r = Kmv.kmvDistinct(df, col("g"), col("v"), k = 16).collect()
      .map(x => x.getString(0) -> (x.getInt(1), x.getLong(3), x.getLong(4)))
      .toMap
    // below k: lossless, kmv_k == exact == estimate
    assert(r("small") === ((2, 2L, 2L)))
    // above k: kmv_k pinned at k, estimate within 50% of exact (k=16 has
    // ~25% standard error; 50% is a deterministic-input assertion, not a
    // statistical one — the inputs are fixed so this can never flake)
    r.filterNot(_._1 == "small").foreach { case (g, (kk, est, exact)) =>
      if (exact > 16) {
        assert(kk === 16, g)
        assert(est > exact / 2 && est < exact * 2, s"$g est=$est exact=$exact")
      } else assert(est === exact, g)
    }
  }
}
