package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev/measurement harness for the optimization rounds (guide §1) — NOT part
 * of the driver contract. Times a subset of [[SparkEntry.queries]] with the
 * same methodology as [[Bench]] (same session configs, `.count()` action,
 * cold rep then N warm reps) and optionally dumps `explain("formatted")`
 * plans for the committed plans/ evidence.
 *
 * Usage: runMain graft.BenchExtra <reps> [name1,name2,...|all]
 *   env SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
 *   env SPARK_GRAFT_CPUS     local[N] (default 32)
 *   env GRAFT_PLANS_DIR      if set, writes <dir>/<query>.txt plan dumps
 *   env GRAFT_NOOP_SINK      if "1", times df.write.format("noop") instead of
 *                            count() (guide §1.4 isolation; computes every
 *                            column so projection pruning can't hide work)
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.lift(0).map(_.toInt).getOrElse(2)
    val only = args.lift(1).filterNot(_ == "all").map(_.split(',').toSet)
    val plansDir = sys.env.get("GRAFT_PLANS_DIR")
    val useNoop = sys.env.get("GRAFT_NOOP_SINK").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment confs: GRAFT_BENCHX_CONF="k=v;k=v"
    sys.env.get("GRAFT_BENCHX_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // job/stage/task accounting between queries: attributes wall time to
    // scheduled work vs driver round-trips (guide §1 empirical loop)
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val nStages = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          nStages.incrementAndGet()
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          nTasks.incrementAndGet()
          if (t.taskMetrics != null)
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
        }
      })
    SparkEntry.prepareOracleInputs(spark, sfDir)
    plansDir.foreach(d => new java.io.File(d).mkdirs())
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    sel.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      var acct = ""
      val times = (0 until (reps + 1)).map { r =>
        val (j0, s0, t0n, tm0) = (nJobs.get, nStages.get, nTasks.get, taskMs.get)
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (useNoop) df.write.format("noop").mode("overwrite").save()
          else df.count()
        } catch {
          case e: Throwable =>
            System.err.println(s"[benchx] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        if (r == reps) acct = s"jobs=${nJobs.get - j0} stages=${nStages.get - s0} " +
          s"tasks=${nTasks.get - t0n} taskSec=${(taskMs.get - tm0) / 1000.0}"
        wall
      }
      plansDir.foreach { d =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/$name.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[benchx] plan dump $name failed: ${e.getMessage}")
        }
      }
      println(f"BENCHX $name cold=${times.head}%.3f warm=${times.tail.min}%.3f " +
        times.tail.map(t => f"$t%.3f").mkString("[", ",", "]") + s" $acct")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
