package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis
import graft.web.CrawlSchedule

/** Politeness scheduling over a fetch log and the Flesch readability gate. */
class CrawlScheduleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("schedule: gaps, violations, next-allowed per host") {
    // host a (delay 2s): fetches at 0, 1.5s, 4.0s -> gaps 1.5s, 2.5s -> 1
    // violation; host b (delay 1s): single fetch -> no gap, no violation.
    val log = Seq(
      ("a", 0L, 1L, 2L), ("a", 1500000L, 2L, 2L), ("a", 4000000L, 3L, 2L),
      ("b", 9000000L, 4L, 1L))
      .toDF("h", "us", "id", "d")
    val r = CrawlSchedule.schedule(log, col("h"), col("us"), col("id"), col("d"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(6)))
      .toMap
    assert(r("a") === ((2L, 3L, 1L, 1500000L, 4000000L + 2000000L)))
    assert(r("b") === ((1L, 1L, 0L, -1L, 9000000L + 1000000L)))
  }

  test("schedule: equal timestamps break ties deterministically") {
    val log = Seq(("a", 100L, 2L, 1L), ("a", 100L, 1L, 1L)).toDF("h", "us", "id", "d")
    val r = CrawlSchedule.schedule(log, col("h"), col("us"), col("id"), col("d"))
      .collect()
    assert(r.length === 1)
    assert(r.head.getLong(2) === 2L)    // n_fetches
    assert(r.head.getLong(4) === 0L)    // min_gap_us: same-instant refetch
    assert(r.head.getLong(3) === 1L)    // one violation (0 < 1s)
  }

  test("schedule plan: ONE host-keyed exchange feeds window and aggregate") {
    val log = Seq(("a", 0L, 1L, 2L), ("b", 5L, 2L, 1L)).toDF("h", "us", "id", "d")
    val df = CrawlSchedule.schedule(log, col("h"), col("us"), col("id"), col("d"))
    val p = df.queryExecution.executedPlan.toString
    // the aggregate keys (host, delay_s) are a superset of the window's
    // hashpartitioning(host), so Catalyst may keep a second exchange behind
    // a map-side partial aggregate; what must NOT appear is a global sort
    // or more than two exchanges total.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges in:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"unexpected global sort:\n$p")
    assert(p.contains("partial"), s"expected map-side partial aggregate:\n$p")
  }

  test("fleschScore: published constants on a known sentence") {
    // "the cat sat." -> words 3, syllable groups e/a/a = 3, sentences 1:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    val df = Seq("the cat sat.").toDF("text")
      .select(TextAnalysis.fleschScore(col("text")).as("f"))
    assert(math.abs(df.head().getDouble(0) - 119.19) < 1e-9)
  }

  test("fleschScore: empty text floors at words=1, sentences=1") {
    val df = Seq("").toDF("text")
      .select(TextAnalysis.fleschScore(col("text")).as("f"))
    // 206.835 - 1.015*(1/1) - 84.6*(0/1)
    assert(math.abs(df.head().getDouble(0) - 205.82) < 1e-9)
  }

  test("fleschScore: long uniform prose scores lower than terse prose") {
    val terse = "go now. run far. be it."
    val dense = "the extraordinarily sophisticated implementation demonstrates " +
      "considerable architectural complexity throughout the system"
    val r = Seq(terse, dense).toDF("text")
      .select(TextAnalysis.fleschScore(col("text")).as("f"))
      .collect().map(_.getDouble(0))
    assert(r(0) > r(1))
  }
}
