package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Cross-snapshot incremental dedup: classify a new crawl against a base
  * corpus (exact_dup / near_dup / new). Near-dup texts are long enough that
  * the (16 perm, 4 band) LSH recall is reliable at their Jaccard (~0.97) —
  * recall of mid-similarity pairs is the band family's documented tradeoff. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val baseText = (1 to 60).map(i => s"word$i").mkString(" ")

  private def base = Seq(
    (1L, baseText),
    (2L, "completely different base content about spark query planning and shuffles"),
    (3L, "third base document with its own words entirely")
  ).toDF("doc_id", "text")

  test("statuses: byte-identical -> exact_dup, tail-append -> near_dup, fresh -> new") {
    val newSnap = Seq(
      (101L, baseText),                             // exact copy of base 1
      (102L, baseText + " extra tail"),             // near dup of base 1 (J ~ 0.97)
      (103L, "genuinely novel page about gardening tulips and watering cans zq")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalStatus(newSnap, base)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(101L -> "exact_dup", 102L -> "near_dup", 103L -> "new"))
  }

  test("exact wins precedence over near; every new doc gets exactly one row") {
    val newSnap = Seq(
      (201L, baseText),            // exact (and trivially near) of base 1
      (202L, baseText)             // second identical copy — also exact_dup
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalStatus(newSnap, base)
    assert(out.count() === 2L)
    assert(out.select("status").as[String].collect().toSeq === Seq("exact_dup", "exact_dup"))
  }

  test("near verify honors the jaccard threshold") {
    // same recalled candidate pair (J ~ 58/60), different thresholds
    val newSnap = Seq((301L, baseText + " extra tail")).toDF("doc_id", "text")
    val loose = Dedup.incrementalStatus(newSnap, base, threshold = 0.5)
      .collect().head.getString(1)
    val strict = Dedup.incrementalStatus(newSnap, base, threshold = 0.99)
      .collect().head.getString(1)
    assert(loose === "near_dup")
    assert(strict === "new")
  }

  test("empty base classifies everything new") {
    val newSnap = Seq((401L, baseText)).toDF("doc_id", "text")
    val out = Dedup.incrementalStatus(newSnap, base.filter(lit(false)))
      .collect().map(r => r.getString(1))
    assert(out.toSeq === Seq("new"))
  }
}
