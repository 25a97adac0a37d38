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
