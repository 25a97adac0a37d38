package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.{Hll, Kmv}
import graft.web.LinkGraph

/** Link-graph centrality (fixed-point PageRank, HITS), anchor-text
  * consolidation, and the KMV/HLL cardinality sketches. */
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

  test("trustRank: seed-unreachable nodes get zero, seeds keep teleport") {
    // trusted 0 -> 1 -> 2 chain; spam farm 10 <-> 11 interlinked but
    // unreferenced from the trusted side
    val e = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val t = LinkGraph.trustRank(e, seeds, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(t.keySet === Set(0L, 1L, 2L, 10L, 11L))
    // the farm is unreachable from the seed: exactly zero trust, however
    // well it interlinks — the property plain PageRank lacks
    assert(t(10L) === 0L && t(11L) === 0L)
    // trust decays along the chain, seed holds the teleport mass
    assert(t(0L) > t(1L) && t(1L) > t(2L) && t(2L) > 0L)
    // total trust mass <= Scale (integral truncation only loses)
    assert(t.values.sum <= LinkGraph.Scale)
    // bit-reproducible
    val t2 = LinkGraph.trustRank(e, seeds, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(t === t2)
    // seeds outside the node set are ignored, not divided into
    val t3 = LinkGraph.trustRank(e, Seq(0L, 999L).toDF("node"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(t3 === t)
  }

  test("spamMass: farm at ~1e6 ppm, trusted chain low, seed clamped to 0") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val pr = LinkGraph.pageRank(e, iters = 3)
    val tr = LinkGraph.trustRank(e, seeds, iters = 3)
    val sm = LinkGraph.spamMass(pr, tr).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    // zero-trust farm: spam mass == 1e6 ppm exactly
    assert(sm(10L) === 1000000L && sm(11L) === 1000000L)
    // the seed's trust exceeds its plain rank -> clamped to 0
    assert(sm(0L) === 0L)
    // the trusted cycle sits well below the farm
    assert(sm(1L) < 500000L && sm(2L) < 500000L)
  }

  test("labelPropagation: two bridged 4-cliques split into two communities") {
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val e = (cliqueA ++ cliqueB ++ Seq((3L, 10L))).toDF("src", "dst")
    val r = LinkGraph.labelPropagation(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // clique majorities beat the bridge: A converges to label 0, B to 10
    assert((0L to 3L).forall(r(_) === 0L))
    assert((10L to 13L).forall(r(_) === 10L))
    // deterministic (the tie-to-smallest rule, unlike classic random LPA)
    val r2 = LinkGraph.labelPropagation(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === r2)
  }

  test("coCitation: shared-source pair counts, supernode excluded by cap") {
    val e = Seq((1L, 20L), (1L, 21L), (2L, 20L), (2L, 21L), (3L, 20L),
      (3L, 22L)).toDF("src", "dst")
    val r = LinkGraph.coCitation(e, maxOutdeg = 16).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // 20 and 21 are co-cited by sources 1 and 2; canonical a < b order
    assert(r((20L, 21L)) === 2L)
    assert(r((20L, 22L)) === 1L)
    assert(!r.contains((21L, 20L)))
    // a directory supernode above the cap asserts nothing about any pair
    val withSuper = e.unionByName(
      (100L to 120L).map(d => (9L, d)).toDF("src", "dst"))
    val capped = LinkGraph.coCitation(withSuper, maxOutdeg = 16).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(capped === r)
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

  test("hits: star graph — authority at the hub target, equal spoke hubs") {
    // 1,2,3 all link to 0; 0 links back to 1.
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val r = LinkGraph.hits(e, iters = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r.keySet === Set(0L, 1L, 2L, 3L))
    // node 0 is the authority; 2,3 (never linked-to) carry zero authority
    assert(r(0L)._1 > r(1L)._1 && r(1L)._1 > 0)
    assert(r(2L)._1 === 0L && r(3L)._1 === 0L)
    // 1,2,3 are equal hubs (all point at the authority) and beat node 0
    assert(r(1L)._2 === r(2L)._2 && r(2L)._2 === r(3L)._2)
    assert(r(1L)._2 > r(0L)._2 && r(0L)._2 > 0)
    // L1 mass: each vector sums to <= HitsScale, within truncation loss
    val (authSum, hubSum) = (r.values.map(_._1).sum, r.values.map(_._2).sum)
    assert(authSum <= LinkGraph.HitsScale && authSum > LinkGraph.HitsScale * 99 / 100)
    assert(hubSum <= LinkGraph.HitsScale && hubSum > LinkGraph.HitsScale * 99 / 100)
    // bit-reproducible
    val r2 = LinkGraph.hits(e, iters = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r === r2)
  }

  test("anchorStats: counts, host diversity, deterministic tie-break") {
    val links = Seq(
      (10L, "home", "a.com"), (10L, "home", "b.com"), (10L, "start", "a.com"),
      // target 20: "x" and "y" tie at 2 — lexicographically smaller wins
      (20L, "y", "a.com"), (20L, "y", "a.com"), (20L, "x", "b.com"),
      (20L, "x", "c.com")
    ).toDF("dst", "anchor", "src_host")
    val r = LinkGraph.anchorStats(links, col("dst"), col("anchor"),
        col("src_host")).collect()
      .map(x => x.getLong(0) -> x).toMap
    val t10 = r(10L)
    assert(t10.getAs[Long]("n_inlinks") === 3L)
    assert(t10.getAs[Long]("n_src_hosts") === 2L)
    assert(t10.getAs[Long]("n_anchors") === 2L)
    assert(t10.getAs[String]("top_anchor") === "home")
    assert(t10.getAs[Long]("top_anchor_n") === 2L)
    assert(t10.getAs[Seq[String]]("anchors") === Seq("home", "start"))
    val t20 = r(20L)
    assert(t20.getAs[String]("top_anchor") === "x") // tie 2-2 → lexicographic
    assert(t20.getAs[Long]("n_src_hosts") === 3L)
  }

  test("kmvJaccard: exact below k, estimate near truth above k") {
    // |A|=60, |B|=60, |A ∩ B|=30 -> J = 30/90
    val a = (0 until 60).map(i => s"item$i").toDF("v")
    val b = (30 until 90).map(i => s"item$i").toDF("v")
    // k above the union size: exact
    val exact = Kmv.kmvJaccard(a, b, col("v"), k = 256).head
    assert(exact.getLong(0) === 90L && exact.getLong(1) === 30L)
    assert(math.abs(exact.getDouble(2) - 30.0 / 90.0) < 1e-6)
    // k below the union size: a uniform union sample, estimate within 0.2
    val est = Kmv.kmvJaccard(a, b, col("v"), k = 32).head
    assert(est.getLong(0) === 32L)
    assert(math.abs(est.getDouble(2) - 30.0 / 90.0) < 0.2)
    // disjoint and identical corpora hit the boundaries exactly
    val dis = Kmv.kmvJaccard(a, (100 until 160).map(i => s"x$i").toDF("v"),
      col("v"), k = 32).head
    assert(dis.getDouble(2) === 0.0)
    val same = Kmv.kmvJaccard(a, a, col("v"), k = 32).head
    assert(same.getDouble(2) === 1.0)
  }

  test("hllDistinct: small exact-ish via linear counting, large within 50%") {
    val df = (0 until 600).map(i => (s"g${i % 3}", s"v${i % (40 * (i % 3 + 1))}"))
      .toDF("g", "v")
      .unionByName(Seq(("small", "a"), ("small", "b"), ("small", "a"))
        .toDF("g", "v"))
    val r = Hll.hllDistinct(df, col("g"), col("v")).collect()
      .map(x => (x.getString(0),
        (x.getInt(1), x.getLong(3), x.getLong(4)))).toMap
    r.foreach { case (g, (vZero, est, exact)) =>
      assert(vZero >= 0 && vZero < Hll.M, g)
      // deterministic inputs → a fixed, non-flaking accuracy assertion;
      // m=64 has ~13% standard error, 50% is generous headroom
      assert(est > exact / 2 && est < exact * 2, s"$g est=$est exact=$exact")
    }
    // tiny group sits on the linear-counting branch and lands exactly
    assert(r("small")._2 === 2L)
  }

  test("hll register merge == one-shot sketch (mergeability)") {
    val df = (0 until 500).map(i => (s"g${i % 2}", s"v${i % 120}")).toDF("g", "v")
    val oneShot = Hll.estimate(Hll.registers(df, col("g"), col("v"))).collect()
      .map(x => x.getString(0) -> ((x.getInt(1), x.getLong(2), x.getLong(3))))
      .toMap
    // shard by an unrelated predicate, sketch each shard, union + merge
    val s1 = Hll.registers(df.filter(col("v").substr(2, 10).cast("int") % 2 === 0),
      col("g"), col("v"))
    val s2 = Hll.registers(df.filter(col("v").substr(2, 10).cast("int") % 2 === 1),
      col("g"), col("v"))
    val merged = Hll.estimate(Hll.merge(s1.unionByName(s2))).collect()
      .map(x => x.getString(0) -> ((x.getInt(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(merged === oneShot)
  }

  test("crawlFrontier: min-hop labels, early exhaustion, hop-0 budget") {
    // 1→{2,3}, 2→3, 3→4, 5→6 (disconnected): min hop beats the longer path
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = LinkGraph.crawlFrontier(e, seeds, maxHops = 3).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // exhaustion: a budget far past the diameter returns the same set
    val wide = LinkGraph.crawlFrontier(e, seeds, maxHops = 50).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(wide === got)
    // budget 0 = seeds only, deduplicated
    val zero = LinkGraph.crawlFrontier(e, Seq(1L, 1L, 5L).toDF("node"),
      maxHops = 0).collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(zero === Map(1L -> 0, 5L -> 0))
    // a cycle terminates at the visited-set fixpoint, not the budget
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val c = LinkGraph.crawlFrontier(cyc, Seq(0L).toDF("node"), maxHops = 99)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(c === Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("triangles: K4, triangle-free star, direction/dup/self-loop collapse") {
    // K4: every node in C(3,2)=3 triangles, degree 3, clustering 1.0
    val k4 = (for (i <- 0 to 3; j <- 0 to 3 if i != j) yield (i.toLong, j.toLong))
      .toDF("src", "dst") // both directions present = dup collapse exercised
    val r = LinkGraph.triangles(k4).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r.size === 4)
    r.values.foreach { case (deg, tri, cc) =>
      assert(deg === 3L); assert(tri === 3L); assert(cc === 1000000L)
    }
    // star K1,3: zero triangles; center degree 3 cc 0, leaves degree 1 cc 0
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 0L)).toDF("src", "dst")
    val s = LinkGraph.triangles(star).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(s(0L) === ((3L, 0L, 0L)))
    assert(s(1L) === ((1L, 0L, 0L)))
    // one triangle hanging off a path: 0-1-2-0 plus 2-3
    val mix = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("src", "dst")
    val m = LinkGraph.triangles(mix).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(m(0L) === ((2L, 1L, 1000000L)))
    assert(m(2L) === ((3L, 1L, 333333L))) // 2*1*1e6 div (3*2)
    assert(m(3L) === ((1L, 0L, 0L)))
  }

  test("degreeHistogram: log2 buckets, exact counts, ppm shares") {
    // degrees: node 0 -> 4 (bucket 2), nodes 1..4 -> 1 (bucket 0)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val h = LinkGraph.degreeHistogram(e).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))).toMap
    assert(h(0L) === ((4L, 1L, 1L, 800000L)))
    assert(h(2L) === ((1L, 4L, 4L, 200000L)))
    assert(h.size === 2)
  }

  test("kCore: peels tails layer by layer, keeps the dense core") {
    // triangle 0-1-2 with a 3-hop tail 2-3-4-5: the 2-core is exactly the
    // triangle, and the tail must unravel one node per round (3 rounds)
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val core = LinkGraph.kCore(e, k = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(core === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // k above the max degree: empty core, still converges
    assert(LinkGraph.kCore(e, k = 4).collect().isEmpty)
    // direction/duplicates/self-loops collapse before peeling
    val noisy = Seq((1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L), (0L, 0L))
      .toDF("src", "dst")
    val c2 = LinkGraph.kCore(noisy, k = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(c2 === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("kCore: under-budgeted maxRounds fails loudly, never half-peeled") {
    // 4-hop tail off a triangle needs 4 peel rounds; cap at 2 must throw
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      LinkGraph.kCore(e, k = 2, maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("fixed point"))
    // with budget it converges to the triangle
    assert(LinkGraph.kCore(e, k = 2, maxRounds = 8).collect().length === 3)
  }

  test("hostGraph rolls page edges up to host pairs with distinct-src counts") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 4L))
      .toDF("src", "dst")
    val pages = Seq((1L, "a.com"), (2L, "a.com"), (3L, "b.org"), (4L, "b.org"))
      .toDF("page_id", "host")
    val r = LinkGraph.hostGraph(edges, pages).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    // a->a: 1->2 (1 link, 1 src, intra); a->b: 1->3, 2->3 (2 links, 2 srcs)
    // b->a: 3->1; b->b: 4->4 (intra)
    assert(r(("a.com", "a.com")) === ((1L, 1L, true)))
    assert(r(("a.com", "b.org")) === ((2L, 2L, false)))
    assert(r(("b.org", "a.com")) === ((1L, 1L, false)))
    assert(r(("b.org", "b.org")) === ((1L, 1L, true)))
  }

  test("resolveRedirects: exact chain hops; cycles and feeders unresolved") {
    // 0->1->2->3 (terminal), 10->11 (terminal), 61->62<->63 (cycle + feeder)
    val r = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L),
      (61L, 62L), (62L, 63L), (63L, 62L)).toDF("src", "dst")
    val out = LinkGraph.resolveRedirects(r, doublings = 4).collect()
      .map(x => x.getLong(0) -> ((
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getLong(2)),
        x.getString(3)))).toMap
    assert(out(0L) === ((Some(3L), Some(3L), "resolved")))
    assert(out(1L) === ((Some(3L), Some(2L), "resolved")))
    assert(out(2L) === ((Some(3L), Some(1L), "resolved")))
    assert(out(10L) === ((Some(11L), Some(1L), "resolved")))
    assert(out(61L) === ((None, None, "unresolved")))
    assert(out(62L) === ((None, None, "unresolved")))
    assert(out(63L) === ((None, None, "unresolved")))
  }

  test("mirrorPairs: shared counts, exact Jaccard, boilerplate cap") {
    // a/b mirror 3 of 4 docs; boilerplate digest "bp" on ALL hosts; host c
    // shares only the boilerplate (must vanish under the cap)
    val rows = Seq(
      ("a", "d1"), ("a", "d2"), ("a", "d3"), ("a", "onlyA"), ("a", "bp"),
      ("b", "d1"), ("b", "d2"), ("b", "d3"), ("b", "onlyB"), ("b", "bp"),
      ("c", "bp"), ("c", "onlyC")).toDF("host", "digest")
    val r = graft.web.Mirrors.mirrorPairs(rows, col("host"), col("digest"),
        minShared = 2, maxHostsPerDigest = 2).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // only (a, b) survives; sizes are CAPPED-set sizes (bp excluded from
    // numerator AND denominator): 3 shared of 4/4 -> jaccard 3/5
    assert(r.keySet === Set(("a", "b")))
    assert(r(("a", "b")) === ((3L, 4L, 4L, 600000L)))
  }

  test("linkDistance: zero rounds returns exactly the seed set at 0") {
    val edges = Seq((0L, 1L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(0L, 5L).toDF("node")
    val out = graft.web.LinkGraph.linkDistance(edges, seeds, maxRounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 5L -> 0L))
  }

  test("linkDistance: Bellman-Ford hand-derived, cheap-path beats short-path") {
    // 0 -> 1 costs 10 direct, but 0 -> 2 -> 1 costs 1+2=3; parallel edge
    // 0 -> 2 at cost 5 must collapse to the cheaper 1
    val edges = Seq(
      (0L, 1L, 10L), (0L, 2L, 1L), (0L, 2L, 5L), (2L, 1L, 2L),
      (1L, 3L, 1L), (9L, 0L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    val out = graft.web.LinkGraph.linkDistance(edges, seeds, maxRounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 9 only points INTO the seed -> unreachable, absent
    assert(out === Map(0L -> 0L, 2L -> 1L, 1L -> 3L, 3L -> 4L))
  }

  test("linkDistance: round budget bounds walk length exactly") {
    val chain = (0L until 5L).map(i => (i, i + 1, 2L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    val r2 = graft.web.LinkGraph.linkDistance(chain, seeds, maxRounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(0L -> 0L, 1L -> 2L, 2L -> 4L)) // <= 2 edges only
    val r5 = graft.web.LinkGraph.linkDistance(chain, seeds, maxRounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r5(5L) === 10L)
  }

  test("linkDistance: cycles stay monotone, multi-seed takes the nearer") {
    val edges = Seq((0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L), (7L, 2L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(0L, 7L).toDF("node")
    val out = graft.web.LinkGraph.linkDistance(edges, seeds, maxRounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 0<->1 cycle never lowers dist below the true shortest
    assert(out === Map(0L -> 0L, 7L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("resolveRedirects handles chains up to 2^doublings in log rounds") {
    // a 14-hop chain resolves with doublings=4 (2^4 = 16 >= 14)
    val chain = (0L until 14L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = LinkGraph.resolveRedirects(chain, doublings = 4).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(out(0L) === ((14L, 14L)))
    assert(out(13L) === ((14L, 1L)))
  }
}
