package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SubstringDedup

/** Cross-snapshot window-novelty audit. */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val refText = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu"

  test("unchanged, appended, and disjoint docs score 0, partial, 1") {
    val ref = Seq((1L, refText)).toDF("doc_id", "text")
    val cand = Seq(
      (10L, refText),                                        // unchanged
      (11L, refText + " nu xi omicron pi rho sigma tau upsilon"), // appended
      (12L, "one two three four five six seven eight nine ten"),  // disjoint
      (13L, "too short"))                                    // < 8 tokens
      .toDF("doc_id", "text")
    val r = SubstringDedup.windowNovelty(cand, col("doc_id"), col("text"),
        ref, col("text"), n = 8)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), Option(x.get(3)).map(_.toString.toDouble)))
      .toMap
    // ref has 12 tokens -> 5 windows; unchanged doc: 5 windows, 0 novel
    assert(r(10L) === ((5L, 0L, Some(0.0))))
    // appended: 20 tokens -> 13 windows, the 5 pure-ref ones seen, 8 novel
    assert(r(11L)._1 === 13L && r(11L)._2 === 8L)
    assert(r(11L)._3.get === 0.615385) // round(8/13, 6)
    // disjoint: every window novel
    assert(r(12L) === ((3L, 3L, Some(1.0))))
    // short: no windows, null ratio
    assert(r(13L) === ((0L, 0L, None)))
  }
}
