package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.AsOf

/** Backward as-of join: tagged-union + window implementation. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("as-of join picks latest right at-or-before, left-outer on no prior") {
    val left = Seq((1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 5L, "p5"),
      (2L, 7L, "q7")).toDF("k", "ts", "l")
    val right = Seq((1L, 8L, "v8"), (1L, 20L, "v20"), (3L, 1L, "x"))
      .toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts")
      .select("k", "ts", "l", "r_ts", "r_v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          Option(r.getString(4)).getOrElse(""))).toMap
    assert(out((1L, 10L)) === (("p10", 8L, "v8")))   // strictly before
    assert(out((1L, 20L)) === (("p20", 20L, "v20"))) // equal ts is inclusive
    assert(out((1L, 5L)) === (("p5", -1L, "")))      // no prior -> nulls
    assert(out((2L, 7L)) === (("q7", -1L, "")))      // key with no right rows
    assert(out.size === 4)                            // exactly one row per left
  }

  test("range join: inclusive bounds, band-spanning intervals, key isolation") {
    val points = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 25L, "c"),
      (2L, 10L, "d")).toDF("k", "v", "p")
    // interval [5, 20] spans bands of size 8 (bands 0..2); [18, 26] bands 2..3
    val ivs = Seq((1L, 5L, 20L, "i1"), (1L, 18L, 26L, "i2"), (3L, 0L, 100L, "i3"))
      .toDF("k", "lo", "hi", "iv")
    val out = graft.engine.RangeJoin
      .rangeJoin(points, ivs, Seq("k"), "v", "lo", "hi", bandSize = 8L)
      .select("p", "iv").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a=5 hits i1's inclusive lower bound; b=10 in i1 only; c=25 in i2 only;
    // d has no interval for key 2; 20 would hit both (not present)
    assert(out === Set(("a", "i1"), ("b", "i1"), ("c", "i2")))
  }

  test("null event times: right NULLs never match, left NULLs keep their row") {
    val left = Seq((1L, Some(10L), "a"), (1L, None: Option[Long], "b"))
      .toDF("k", "ts", "l")
    val right = Seq((1L, None: Option[Long], "poison"), (1L, Some(3L), "v3"))
      .toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts")
      .select("l", "r_v").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") === Some("v3")) // not the NULL-ts "poison" row
    assert(out("b") === None)       // left-outer, matches nothing
    assert(out.size === 2)
  }

  test("range join fails loudly on an interval wider than maxBands") {
    val points = Seq((1L, 5L)).toDF("k", "v")
    val ivs = Seq((1L, 0L, Long.MaxValue)).toDF("k", "lo", "hi")
    val ex = intercept[Exception] {
      graft.engine.RangeJoin.rangeJoin(points, ivs, Seq("k"),
        "v", "lo", "hi", bandSize = 3600L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxBands")), msgs(ex).mkString(" | "))
  }

  test("NULL keys never equi-match: left kept with null payload, right dropped") {
    val left = Seq((Some(1L), 10L, "a"), (None: Option[Long], 10L, "nullkey"))
      .toDF("k", "ts", "l")
    val right = Seq((Some(1L), 5L, "v5"), (None: Option[Long], 5L, "poison"))
      .toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts")
      .select("l", "r_v").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") === Some("v5"))
    assert(out("nullkey") === None) // NOT the NULL-key right "poison" row
    assert(out.size === 2)
  }

  test("reserved scaffolding names and prefix collisions fail loudly") {
    val ok = Seq((1L, 1L, "x")).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(ok.withColumnRenamed("v", "__side"), ok, Seq("k"), "ts")
    }
    intercept[IllegalArgumentException] {
      // right column "v" with default prefix collides with left column "r_v"
      AsOf.asofJoin(ok.withColumnRenamed("v", "r_v"), ok, Seq("k"), "ts")
    }
  }

  test("range join bands exactly on negative values and values past 2^53") {
    // negative v: double-floor and integral-floor agree here, but the huge
    // magnitudes only band consistently under exact integral division
    val big = (1L << 60) + 12345L
    val points = Seq((1L, -7201L), (2L, big)).toDF("k", "v")
    val ivs = Seq((1L, -10800L, -7200L), (2L, big - 1L, big + 1L))
      .toDF("k", "lo", "hi")
    val out = graft.engine.RangeJoin.rangeJoin(points, ivs, Seq("k"),
        "v", "lo", "hi", bandSize = 3600L)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(1L, 2L)) // both true matches survive banding
  }

  test("right payload carried atomically when a payload column is null") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    // latest right row has a NULL b — the matched (a, b) must BOTH come from
    // it, not mix b from the earlier row
    val right = Seq((1L, 1L, Some("oldA"), Some("oldB")),
      (1L, 9L, Some("newA"), None: Option[String]))
      .toDF("k", "ts", "a", "b")
    val r = AsOf.asofJoin(left, right, Seq("k"), "ts")
      .select("r_a", "r_b").collect().head
    assert(r.getString(0) === "newA")
    assert(r.isNullAt(1))
  }
}
