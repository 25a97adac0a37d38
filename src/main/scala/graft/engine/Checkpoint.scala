package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * E10 — resumable stage runner with per-partition lineage + metrics.
 *
 * Each stage writes its output as Parquet under `<ckptDir>/<stage>` and a
 * lineage record per output partition under `<ckptDir>/_lineage/<stage>`:
 * (stage, partition_id, rows, checksum, wall_ms, resumed, run_id). A rerun
 * finds `_SUCCESS` + lineage and returns the checkpointed output without
 * recomputing — idempotent resume is a driver-side directory probe, no state
 * store needed (north_rule: "resumable from checkpoint with per-partition
 * lineage + metrics").
 *
 * Checksums are order-insensitive (bit_xor of per-row xxhash64 over all
 * columns) so they are stable across shuffle nondeterminism within a
 * partition and never overflow.
 */
object Checkpoint {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir, "_SUCCESS"))

  /** Per-partition lineage for a materialized stage output.
    *
    * Default row hash is xxhash64 over ALL columns (fast, codegen). With
    * `portableKeyCols` set, the hash is instead the PORTABLE sha60 — the
    * first 60 bits of sha256 over a '|'-joined string projection of the
    * given identity-bearing columns — which an independent engine (the
    * driver's DuckDB oracle) can recompute from the materialized parquet:
    * resumability then isn't just deterministic, it's oracle-proven. Key
    * columns should be strings/ints (row identity), never floats whose
    * engine-specific rendering would diverge. */
  private def lineage(df: DataFrame, stage: String, wallMs: Long,
                      resumed: Boolean, runId: String,
                      portableKeyCols: Seq[String] = Nil): DataFrame = {
    val rowHash =
      if (portableKeyCols.isEmpty) xxhash64(df.columns.map(col): _*)
      else graft.functions.TextFunctions.sha60(
        concat_ws("|", portableKeyCols.map(c => col(c).cast("string")): _*))
    val hashed = df.select(spark_partition_id().as("partition_id"),
      rowHash.as("__h"))
    hashed.groupBy("partition_id")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(__h)").as("checksum"))
      .withColumn("stage", lit(stage))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("resumed", lit(resumed))
      .withColumn("run_id", lit(runId))
  }

  /** Read the stored fingerprint of a stage checkpoint, if any. */
  private def storedFingerprint(spark: SparkSession, outPath: String): Option[String] = {
    val f = fs(spark, outPath)
    val p = new Path(outPath, "_GRAFT_FINGERPRINT")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Public probe/write pair for other materialized layouts (e.g. the
    * world-scale packed bucketed tables) that reuse the same
    * _GRAFT_FINGERPRINT convention. */
  def pathFingerprint(spark: SparkSession, path: String): Option[String] =
    storedFingerprint(spark, path)

  def writePathFingerprint(spark: SparkSession, path: String, fp: String): Unit =
    writeFingerprint(spark, path, fp)

  private def writeFingerprint(spark: SparkSession, outPath: String, fp: String): Unit = {
    val out = fs(spark, outPath).create(new Path(outPath, "_GRAFT_FINGERPRINT"), true)
    try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /**
   * Run (or resume) one stage. On a cold run: materialize `build` to Parquet,
   * then write lineage from the *persisted* output (so checksums describe
   * exactly the bytes a resume will read). On resume: read the checkpoint,
   * append a lineage record marking resumed=true.
   *
   * `fingerprint` guards against stale resumes: it is stored next to the
   * checkpoint on a cold run, and a resume whose fingerprint differs (input
   * schema or job params changed since the checkpoint was written) recomputes
   * instead of silently returning stale output. Callers derive it from the
   * input schema + config (see Pipeline); content changes under an identical
   * schema+config are the caller's contract (documented limitation — a full
   * content scan would defeat the point of resuming).
   */
  def stage(spark: SparkSession, ckptDir: String, name: String, runId: String = "run",
            fingerprint: String = "", portableKeyCols: Seq[String] = Nil)
           (build: => DataFrame): DataFrame = {
    val outPath = s"$ckptDir/$name"
    val linPath = s"$ckptDir/_lineage/$name"
    // A MISSING stored fingerprint is NOT a match when the caller supplied
    // one: a checkpoint written before fingerprinting existed (or whose
    // fingerprint write failed after the parquet write) must recompute — the
    // exact stale-resume case the guard exists to prevent.
    val fpOk = fingerprint.isEmpty ||
      storedFingerprint(spark, outPath).contains(fingerprint)
    if (exists(spark, outPath) && fpOk) {
      val df = spark.read.parquet(outPath)
      lineage(df, name, 0L, resumed = true, runId, portableKeyCols)
        .write.mode("append").parquet(linPath)
      df
    } else {
      val t0 = System.nanoTime()
      build.write.mode("overwrite").parquet(outPath)
      val wallMs = (System.nanoTime() - t0) / 1000000
      if (fingerprint.nonEmpty) writeFingerprint(spark, outPath, fingerprint)
      val persisted = spark.read.parquet(outPath)
      lineage(persisted, name, wallMs, resumed = false, runId, portableKeyCols)
        .write.mode("append").parquet(linPath)
      persisted
    }
  }

  /** All lineage/metrics rows for a checkpoint dir (ops surface). Stage
    * directories are listed explicitly (no glob: a glob that resolves while a
    * listing is being refreshed can transiently match nothing). */
  def metrics(spark: SparkSession, ckptDir: String): DataFrame = {
    val base = new Path(s"$ckptDir/_lineage")
    val stageDirs = fs(spark, ckptDir).listStatus(base)
      .filter(_.isDirectory).map(_.getPath.toString).sorted
    require(stageDirs.nonEmpty, s"no lineage under $ckptDir")
    stageDirs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }
}
