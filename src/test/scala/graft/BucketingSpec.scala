package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Gazetteer
import graft.functions.GeoFunctions

/**
 * §4.3 physical layout: cell-bucketed tables co-locate the world-scale
 * shuffle joins. When both sides are bucketed by `cell` into the same bucket
 * count, the join needs NO exchange on either side — the layout IS the
 * shuffle, paid once at write time. This is the scale path when the polygon
 * index outgrows broadcast.
 */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cell-bucketed tables join with zero exchanges") {
    // explicit per-table paths; warehouse dir is a static conf
    val wh = Files.createTempDirectory("graft-warehouse").toString

    val polys = Gazetteer.polygonsDF(spark)
    val cellIdx = Gazetteer.polygonCellIndex(polys)
    cellIdx.write.mode("overwrite")
      .bucketBy(8, "cell").sortBy("cell")
      .option("path", s"$wh/poly_cells_bucketed")
      .saveAsTable("poly_cells_bucketed")

    val points = Synthetic.points(spark, 2000)
    points.write.mode("overwrite")
      .bucketBy(8, "cell").sortBy("cell")
      .option("path", s"$wh/points_bucketed")
      .saveAsTable("points_bucketed")

    // force the sort-merge strategy (the tiny test tables would otherwise
    // broadcast); at world scale SMJ is what the bucketing serves
    val joined = spark.table("points_bucketed").hint("merge")
      .join(spark.table("poly_cells_bucketed"), Seq("cell"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(joined.count() > 0)

    spark.sql("DROP TABLE IF EXISTS poly_cells_bucketed")
    spark.sql("DROP TABLE IF EXISTS points_bucketed")
  }

  object Synthetic {
    def points(s: org.apache.spark.sql.SparkSession, n: Int) = {
      import s.implicits._
      s.range(n).select(col("id").as("query_id"),
        (lit(2.12) + col("id") / lit(50000.0)).as("lon"),
        (lit(41.40) + col("id") / lit(80000.0)).as("lat"))
        .withColumn("cell", GeoFunctions.cellId(col("lon"), col("lat"),
          lit(graft.geo.CellIndex.FineLevel)))
    }
  }
}
