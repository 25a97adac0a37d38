package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join — the second classic operator family Spark's
 * equi-joins lack (with [[AsOf]]): match each left point row (key, v) to
 * every right interval row (key, lo, hi) with lo <= v <= hi, inclusive.
 *
 * Scale-correct shape: BAND the value domain. Each interval explodes to the
 * bands it covers, each point maps to exactly ONE band, and the join is an
 * equi-join on (key, band) plus a residual BETWEEN filter. No range/theta
 * join (quadratic per key), no duplicates to clean up (a point's single band
 * meets an interval's distinct band list at most once). `bandSize` trades
 * the interval explode factor (≈ interval_length / bandSize + 1 rows)
 * against bucket selectivity — size it near the typical interval length.
 */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                vCol: String, loCol: String, hiCol: String,
                bandSize: Long): DataFrame = {
    require(bandSize > 0, "bandSize must be positive")
    val p = points.withColumn("__band", floor(col(vCol) / lit(bandSize.toDouble)))
    val iv = intervals.withColumn("__band",
      explode(sequence(floor(col(loCol) / lit(bandSize.toDouble)).cast("long"),
        floor(col(hiCol) / lit(bandSize.toDouble)).cast("long"))))
    p.withColumn("__band", col("__band").cast("long"))
      .join(iv, keyCols :+ "__band")
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__band")
  }
}
