package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join — the classic operator Spark's built-in joins lack:
 * for every left row, attach the right row with the LARGEST right.ts <=
 * left.ts within the same key (inclusive; left-outer semantics for rows with
 * no prior right).
 *
 * Implementation is the scale-correct single-shuffle shape: TAG both inputs,
 * UNION them, and run one window pass per key ordered by (ts, side) where
 * right rows sort before left rows at equal timestamps; `last(payload,
 * ignoreNulls)` over the unbounded-preceding frame carries the most recent
 * right payload forward onto each left row. One exchange on the key, no
 * range-condition join (a theta join on ts <= ts explodes quadratically in
 * hot keys), no per-key collect.
 *
 * Right rows should be unique per (key, ts) — as-of semantics are otherwise
 * ambiguous; pre-aggregate the right side (the contract query does).
 */
object AsOf {

  /** @param keyCols equi-join key columns present in both inputs
    * @param tsCol   event-time column present in both inputs
    * @param rightPrefix prefix applied to every non-key right column
    *                    (including its ts) in the output */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    val leftCols = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val rightCols = right.columns.filterNot(keyCols.contains)
    val rightOut = rightCols.map(c => s"$rightPrefix$c")
    // reserved scaffolding names and output-name collisions fail loudly —
    // a silent clash would corrupt the tagged union or shadow a left column
    val reserved = Set("__ts", "__side", "__r")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"asofJoin inputs must not contain ${reserved.mkString("/")}")
    val clashes = rightOut.toSet.intersect((keyCols ++ leftCols :+ tsCol).toSet)
    require(clashes.isEmpty,
      s"asofJoin rightPrefix '$rightPrefix' collides with left columns: " +
        clashes.mkString(", "))

    // identical wide schema for both sides: keys, __ts, left cols, the whole
    // right payload as ONE struct (carried atomically — per-column lastNonNull
    // could mix fields from different right rows when a payload column is
    // null), __side (right=0 sorts before left=1 at equal timestamps — the
    // inclusive bound)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    // SQL as-of semantics for NULLs: a NULL right timestamp can never be
    // "the latest at or before" anything (it would otherwise sort nulls-first
    // and leak onto every early left row); a NULL left timestamp matches
    // nothing but keeps its row (left-outer); and NULL KEYS never equi-match
    // in SQL — the window's partitionBy would group them together and let a
    // NULL-key left row pick up a NULL-key right payload, so NULL-key left
    // rows bypass the union (null payload) and NULL-key right rows drop.
    val keyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val matchableL = col(tsCol).isNotNull && !keyNull
    val l2 = left.filter(matchableL).select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) :+ lit(null).cast(rStructType).as("__r"): _*)
    val r2 = right.filter(col(tsCol).isNotNull && !keyNull).select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
    val lNull = left.filter(!matchableL).select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) :+ lit(null).cast(rStructType).as("__r"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l2.unionByName(r2)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .unionByName(lNull)
      .select(keyCols.map(col) ++ Seq(col("__ts").as(tsCol)) ++ leftCols.map(col) ++
        rightCols.zip(rightOut).map { case (c, o) => col(s"__r.$c").as(o) }: _*)
  }
}
