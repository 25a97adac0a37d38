package graft

import org.apache.spark.sql.SparkSession

import graft.engine.{Gazetteer, Pipeline}
import graft.fixtures.Synth

/**
 * Single-measurement child for the two-cluster-size scaling evidence: runs
 * the flagship geocode pipeline at local[cpus] over n synthesized pages and
 * prints one line "GRAFT_BENCH_ONE <cpus> <pages> <hits> <bestSec>".
 *
 * Launched by Bench in its own JVM, pinned with `taskset` to exactly `cpus`
 * cores — so the N-core run really has N cores of compute, GC, and its share
 * of memory bandwidth, the honest sandbox proxy for an N-executor cluster
 * (local[8] inside a 32-core JVM would still enjoy 32 cores of GC threads).
 */
object BenchOne {

  def run(cpus: Int, n: Long, reps: Int): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-one-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val benchMode = sys.env.getOrElse("GRAFT_BENCH_MODE", "full")
    try {
      def pipeline(pages: Long, parts: Int): Long = {
        import org.apache.spark.sql.functions.{col, length, sum}
        val pagesDf = Synth.pages(spark, pages, parts).toDF()
        benchMode match {
          case "synth" =>
            pagesDf.select(sum(length(col("text")))).collect()(0).getLong(0)
          case "extract" =>
            graft.etl.Extract.mentions(spark, pagesDf, Gazetteer.scanner()).count()
          case _ =>
            val gaz = Gazetteer.gazetteerDF(spark)
            val idx = Gazetteer.nameIndex(gaz)
            val polys = Gazetteer.polygonsDF(spark)
            val cells = Gazetteer.polygonCellIndex(polys)
            Pipeline.geocode(spark, pagesDf, idx, polys, cells,
              Gazetteer.scanner()).count()
        }
      }
      pipeline(math.min(n / 4, 100000L), cpus) // JIT/codegen warm-up
      var best = Double.MaxValue
      var hits = 0L
      var r = 0
      spark.catalog.clearCache()
      val parts = sys.env.getOrElse("GRAFT_BENCH_PARTS_FACTOR", "2").toInt * cpus
      while (r < reps) {
        val t0 = System.nanoTime()
        hits = pipeline(n, parts)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"GRAFT_BENCH_REP $cpus $r $sec%.2f")
        best = math.min(best, sec)
        spark.catalog.clearCache() // drop this rep's persisted mentions
        r += 1
      }
      (best, hits)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 3
    val (best, hits) = run(cpus, n, reps)
    println(s"GRAFT_BENCH_ONE $cpus $n $hits $best")
  }
}
