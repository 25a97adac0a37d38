package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.KMeans

/** Distributed Lloyd k-means in exact scaled-integer arithmetic. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two blobs separate; distances are exact fixed-point integers") {
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.1f, 0.0f)), (2L, Seq(0.0f, 0.1f)),
      (3L, Seq(1.0f, 1.0f)), (4L, Seq(0.9f, 1.0f)), (5L, Seq(1.0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val r = KMeans.kmeans(pts, col("vec_id"), col("embedding"),
        k = 2, rounds = 3)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getLong(2))).toMap
    val (blobA, blobB) = (Seq(0L, 1L, 2L).map(r(_)._1),
      Seq(3L, 4L, 5L).map(r(_)._1))
    assert(blobA.distinct.size === 1 && blobB.distinct.size === 1)
    assert(blobA.head !== blobB.head)
    // centroid of blob A converges to the exact floored mean of the three
    // scaled points: ((0 + 100000 + 0)/3, (0 + 0 + 100000)/3) = (33333, 33333)
    val d0 = r(0L)._2
    assert(d0 === 33333L * 33333L * 2)
  }

  test("identical init centroids: ties break low, empty cluster carries") {
    val pts = Seq(
      (0L, Seq(5.0f, 5.0f)), (1L, Seq(5.0f, 5.0f)),
      (2L, Seq(0.0f, 0.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = KMeans.kmeans(pts, col("vec_id"), col("embedding"),
        k = 2, rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    // round 1: init c0 == c1, every point ties -> ALL to cluster 0 (low
    // tiebreak), so cluster 1 is empty and CARRIES its init centroid (5,5).
    // round 2: the carried centroid wins the two (5,5) points back from the
    // all-points mean (2.75, 2.75) -> a real 2-cluster split. Without the
    // carryover rule cluster 1 would have no centroid at all.
    assert(Seq(0L, 1L).map(r(_)) === Seq(1, 1))
    assert(Seq(2L, 3L).map(r(_)) === Seq(0, 0))
  }

  test("final assignment is map-only: no join in the plan") {
    val pts = (0L to 19L).map(i => (i, Seq(i.toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    val plan = KMeans.kmeans(pts, col("vec_id"), col("embedding"),
        k = 4, rounds = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
  }

  // ---- Pca.powerIteration ----------------------------------------------------

  test("power iteration recovers the dominant axis; projections exact longs") {
    // spread along e1 dominates a small e2 component
    val pts = (1 to 40).map(i =>
      (i.toLong, Seq(0.5f + i * 0.02f, (i % 5) * 0.01f))).toDF("vec_id", "embedding")
    val r = graft.sim.Pca.powerIteration(pts, col("vec_id"), col("embedding"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length === 40)
    assert(r.head._3 > 0L)                       // eigenvalue proxy positive
    // pc1 order matches the e1 coordinate order
    val sortedByPc = r.sortBy(_._2).map(_._1).toSeq
    assert(sortedByPc === (1L to 40L))
    // dominant-axis projection magnitude ~ x * 1e12: endpoints bracket it
    assert(r.map(_._2).min > (0.4e12).toLong)
    assert(r.map(_._2).max < (1.5e12).toLong)
  }

  test("removeDominant: residuals EXACTLY orthogonal to the direction") {
    val pts = (1 to 20).map(i =>
      (i.toLong, Seq(0.5f + i * 0.02f, (i % 5) * 0.01f, 0.3f - i * 0.01f)))
      .toDF("vec_id", "embedding")
    val resid = graft.sim.Pca.removeDominant(pts, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getDecimal(2).toBigInteger, r.getLong(3)))
    assert(resid.length === 60)
    assert(resid.map(_._4).distinct.length === 1 && resid.head._4 > 0L)
    // recover the direction from pc1: resid_num = x*den - v*dot, so for a
    // fixed vector, sum_j resid_num_j * v_j must be EXACT integer zero.
    // v is not exposed directly; verify via the whiten identity against the
    // projection output instead: x*den - resid_num = v*dot, so the ratio
    // (x*den - resid)/dot is the same v_j for every vector where dot != 0.
    val pc = graft.sim.Pca.powerIteration(pts, col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val den = BigInt(resid.head._4)
    val sv = pts.select(col("vec_id"),
        graft.functions.TextFunctions.scaleLongs(col("embedding"),
          lit(graft.sim.Pca.Scale.toDouble)).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // orthogonality: sum_j resid_j * v_j == 0 exactly, with v_j recovered
    // per vector as (x_j*den - resid_j) / dot (exact division by identity)
    resid.groupBy(_._1).foreach { case (id, rows) =>
      val dot = BigInt(pc(id))
      if (dot != 0) {
        val v = rows.sortBy(_._2).map { case (_, j, rn, _) =>
          val num = BigInt(sv(id)(j)) * den - BigInt(rn)
          assert(num % dot === BigInt(0), s"v recovery not exact for $id/$j")
          num / dot
        }
        val orth = rows.sortBy(_._2).map(_._3).zip(v)
          .map { case (rn, vj) => BigInt(rn) * vj }.sum
        assert(orth === BigInt(0), s"residual not orthogonal for vec $id")
      }
    }
  }

  test("signed random projection: exact, deterministic, JL-reasonable") {
    val pts = (1 to 30).map(i =>
      (i.toLong, (0 until 8).map(j => ((i * 7 + j * 13) % 19) * 0.05f - 0.4f)))
      .toDF("vec_id", "embedding")
    val a = graft.sim.RandomProjection.project(pts, col("vec_id"),
      col("embedding"), outDims = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val b = graft.sim.RandomProjection.project(pts, col("vec_id"),
      col("embedding"), outDims = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 120)
    // hand-check one coordinate against the sign matrix definition
    val x = pts.select(col("vec_id"),
        graft.functions.TextFunctions.scaleLongs(col("embedding"),
          lit(graft.sim.RandomProjection.Scale.toDouble)).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val expect = (0 until 8).map(i =>
      x(1L)(i) * graft.sim.RandomProjection.sign(2, i)).sum
    assert(a.find(t => t._1 == 1L && t._2 == 2).get._3 === expect)
  }

  test("power iteration is deterministic and fails loudly on zero input") {
    val pts = (1 to 8).map(i =>
      (i.toLong, Seq(i * 0.1f, 0.3f - i * 0.05f, 0.02f * (i % 3))))
      .toDF("vec_id", "embedding")
    val a = graft.sim.Pca.powerIteration(pts, col("vec_id"), col("embedding"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    val b = graft.sim.Pca.powerIteration(pts, col("vec_id"), col("embedding"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
    val zeros = (1 to 4).map(i => (i.toLong, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      graft.sim.Pca.powerIteration(zeros, col("vec_id"), col("embedding")).collect()
    }
    assert(ex.getMessage.contains("degenerate") ||
      ex.getCause != null && ex.getCause.getMessage.contains("degenerate"))
  }

  test("Pca.renorm: no silent wrap when m exceeds Long.MaxValue/Scale") {
    val S = graft.sim.Pca.Scale
    // non-overflow regime: identical to the plain Long formula
    val small = Array(123456789L, -987654321L, 42L, 0L)
    val mS = small.map(math.abs).max
    assert(graft.sim.Pca.renorm(small, mS).toSeq ===
      small.map(x => (if (x < 0) -1L else 1L) * (math.abs(x) * S / mS)).toSeq)
    // overflow regime: m > Long.MaxValue/Scale would wrap abs(x)*Scale —
    // the dominant element must renormalize to exactly Scale, others to
    // their exact BigInt quotient
    val m = Long.MaxValue / S * 3 // ~2.8e13 > ~9.2e12 bound
    val big = Array(m, -m / 2, m / 7)
    val got = graft.sim.Pca.renorm(big, m)
    assert(got(0) === S, "dominant element must map to exactly Scale")
    assert(got.toSeq === big.map(x => ((BigInt(math.abs(x)) * S / m).toLong *
      (if (x < 0) -1L else 1L))).toSeq)
    // the plain Long formula demonstrably corrupts this input (guards the
    // test against a future revert to the wrapping arithmetic)
    assert(math.abs(m) * S / m !== S)
  }
}
