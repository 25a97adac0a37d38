package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Mmr

/** MMR diversified selection: hand-derived greedy rounds, tie-breaks,
  * lambda extremes, query isolation, shortlist exhaustion. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // query 0: item 2 is a near-dup of the top item 1, item 3 is distant —
  // diversity must promote 3 over 2 at round 2
  private val cand = Seq(
    (0L, 1L, 900000L), (0L, 2L, 880000L), (0L, 3L, 500000L)
  ).toDF("query_id", "item_id", "rel_ppm")
  private val pairs = Seq(
    (0L, 1L, 2L, 990000L), (0L, 2L, 1L, 990000L),
    (0L, 1L, 3L, 100000L), (0L, 3L, 1L, 100000L),
    (0L, 2L, 3L, 120000L), (0L, 3L, 2L, 120000L)
  ).toDF("query_id", "a_id", "b_id", "sim_ppm")

  private def run(k: Int, num: Int = 7, den: Int = 10) =
    Mmr.mmrSelect(cand, pairs, k, num, den).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("greedy rounds hand-derived: diversity beats the near-duplicate") {
    val out = run(3)
    // r1: pure relevance -> item 1 (7*900000)
    assert(out((0L, 1)) === ((1L, 6300000L)))
    // r2: item 2 penalized by sim-to-1 (7*880000-3*990000=3190000) loses to
    // item 3 (7*500000-3*100000=3200000)
    assert(out((0L, 2)) === ((3L, 3200000L)))
    // r3: only item 2 left, penalty = max(990000, 120000)
    assert(out((0L, 3)) === ((2L, 3190000L)))
  }

  test("pure-relevance lambda (1/1) degenerates to rel order") {
    val out = run(3, num = 1, den = 1)
    assert(out.map { case ((_, r), (id, _)) => r -> id } ===
      Map(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("score ties break to the smallest item_id") {
    val c = Seq((0L, 9L, 700000L), (0L, 4L, 700000L))
      .toDF("query_id", "item_id", "rel_ppm")
    val p = Seq((0L, 9L, 4L, 0L), (0L, 4L, 9L, 0L))
      .toDF("query_id", "a_id", "b_id", "sim_ppm")
    val out = Mmr.mmrSelect(c, p, 2).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 4L, 2 -> 9L))
  }

  test("penalty reads the candidate->selected direction of pairSims only") {
    // asymmetric sims: (2 -> 1) is high, (1 -> 2) is low; after picking 1,
    // candidate 2's penalty must use a_id=2, b_id=1 (the high one)
    val c = Seq((0L, 1L, 900000L), (0L, 2L, 890000L), (0L, 3L, 600000L))
      .toDF("query_id", "item_id", "rel_ppm")
    val p = Seq(
      (0L, 1L, 2L, 10000L), (0L, 2L, 1L, 950000L),
      (0L, 1L, 3L, 10000L), (0L, 3L, 1L, 10000L),
      (0L, 2L, 3L, 10000L), (0L, 3L, 2L, 10000L))
      .toDF("query_id", "a_id", "b_id", "sim_ppm")
    val out = Mmr.mmrSelect(c, p, 2).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1) === ((1L, 6300000L)))
    // item 2: 7*890000 - 3*950000 = 3380000; item 3: 7*600000 - 3*10000 =
    // 4170000 -> diversity promotes 3 BECAUSE the 2->1 direction was read
    assert(out(2) === ((3L, 4170000L)))
  }

  test("queries are isolated; k past the shortlist just exhausts it") {
    val c = Seq((0L, 1L, 900000L), (0L, 2L, 800000L), (5L, 7L, 600000L))
      .toDF("query_id", "item_id", "rel_ppm")
    val p = Seq((0L, 1L, 2L, 50000L), (0L, 2L, 1L, 50000L))
      .toDF("query_id", "a_id", "b_id", "sim_ppm")
    val rows = Mmr.mmrSelect(c, p, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSet === Set((0L, 1, 1L), (0L, 2, 2L), (5L, 1, 7L)))
  }
}
