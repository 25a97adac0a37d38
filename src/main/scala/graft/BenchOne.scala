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
    // Materialize the pages table once (NOT timed): the north-rule input is
    // an Iceberg-shaped TABLE of pages — the measured job must read a table
    // (with parquet column pruning: html is never read by the pipeline),
    // not pay page synthesis per run.
    val pagesDir = s"${sys.env.getOrElse("GRAFT_BENCH_TMP", "/tmp")}/graft_bench_pages_$n"
    if (sys.env.contains("GRAFT_BENCH_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = for {
            s <- si.submissionTime; e <- si.completionTime
          } yield e - s
          System.err.println(s"GRAFT_STAGE ${si.stageId} tasks=${si.numTasks} " +
            s"wall=${wall.getOrElse(-1L)}ms " +
            s"cpu=${si.taskMetrics.executorCpuTime / 1000000}ms " +
            s"run=${si.taskMetrics.executorRunTime}ms " +
            s"gc=${si.taskMetrics.jvmGCTime}ms " +
            s"shufW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1024}KB " +
            s"name=${si.name.take(60)}")
        }
      })
    }
    try {
      // reuse across sequential child JVMs (same n => identical table);
      // partition count fixed so the table is byte-identical either way
      if (!new java.io.File(s"$pagesDir/_SUCCESS").exists()) {
        Synth.pages(spark, n, 64).toDF()
          .write.mode("overwrite").parquet(pagesDir)
      }
      // Realistic broadcast sides: a 50k-name gazetteer and 200 polygons
      // (vs the 50-row fixture world) so the dictionary trie, top-1 index
      // aggregation, and packed cell index carry production-shaped weight.
      // Built ONCE per job, like a production run where the gazetteer
      // broadcast amortizes over the whole crawl; the cached DataFrames are
      // materialized by the warm-up run, so measured reps time the
      // pages-side work the cluster actually repeats.
      val gazRows = graft.fixtures.World.gazetteer(
        filler = sys.env.getOrElse("GRAFT_BENCH_GAZ", "50000").toInt)
      val polyRows = graft.fixtures.World.polygons(
        filler = sys.env.getOrElse("GRAFT_BENCH_POLYS", "200").toInt)
      val idx = Gazetteer.nameIndex(Gazetteer.gazetteerDF(spark, gazRows)).cache()
      val polys = Gazetteer.polygonsDF(spark, polyRows).cache()
      val cells = Gazetteer.polygonCellIndex(polys).cache()
      lazy val scanner = Gazetteer.scanner(gazRows)
      def pipeline(pagesDf: org.apache.spark.sql.DataFrame): Long = {
        import org.apache.spark.sql.functions.{col, length, sum}
        benchMode match {
          case "synth" =>
            pagesDf.select(sum(length(col("text")))).collect()(0).getLong(0)
          case "extract" =>
            graft.etl.Extract.mentions(spark, pagesDf, scanner).count()
          case _ =>
            Pipeline.geocode(spark, pagesDf, idx, polys, cells, scanner).count()
        }
      }
      def table() = spark.read.parquet(pagesDir)
      pipeline(table().limit(math.min(n / 4, 100000L).toInt)) // JIT warm-up
      var best = Double.MaxValue
      var hits = 0L
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        hits = pipeline(table())
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"GRAFT_BENCH_REP $cpus $r $sec%.2f")
        best = math.min(best, sec)
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
