package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Resumable synchronous iteration — the Checkpoint.stage integration for
 * iterative operators (PageRank / HITS / connected components / BPE).
 *
 * Persist + LogicalRDD plan-cuts keep an iterative job healthy while it is
 * RUNNING, but a killed job restarts from iteration 0. At crawl scale a
 * thousand-iteration fixed-point job must instead resume from the last
 * completed iteration the way the geocode pipeline resumes mid-stage
 * (north_rule: "resumable from checkpoint with per-partition lineage +
 * metrics"). This runner materializes the state vector through
 * [[Checkpoint.stage]] every `every` iterations, so:
 *
 *  - a rerun after a kill finds the last completed block on disk, appends
 *    `resumed=true` lineage for it, and continues from there — work done is
 *    never redone;
 *  - the plan is cut at every block boundary by construction (the state
 *    re-enters as a parquet scan leaf), subsuming the LogicalRDD cut;
 *  - per-block wall-time and per-partition row/checksum metrics land in the
 *    same `_lineage` surface as the pipeline's stages.
 *
 * The per-stage fingerprint carries the caller's input fingerprint AND the
 * iteration index, so a checkpoint from a different graph, different params,
 * or a different block layout recomputes instead of silently resuming stale
 * state (the [[Checkpoint.stage]] guard).
 *
 * Within a block the `every - 1` un-materialized steps chain in one Catalyst
 * plan — `every` bounds plan depth exactly like BPE's rewrite-stack
 * materialization cadence (BpeTrain.scala), trading parquet IO for plan
 * size; `every = 1` checkpoints every iteration (finest resume granularity).
 */
object Iterate {

  /**
   * Run `iters` iterations of `step` over the state produced by `init`,
   * checkpointing the state to `<ckptDir>/<name>_i<k>` at every block
   * boundary. Returns the iteration-`iters` state as a persisted-on-disk
   * DataFrame (a parquet scan — callers can reuse it for free).
   *
   * `step(state, i)` receives the state after iteration `i - 1` and must
   * return the state after iteration `i`; it runs lazily inside the block's
   * stage build, so fully-checkpointed prefixes never re-execute it.
   */
  def resumable(spark: SparkSession, ckptDir: String, name: String,
                fingerprint: String, iters: Int, every: Int = 1)
               (init: => DataFrame)
               (step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(every >= 1, s"every must be >= 1, got $every")
    var state = Checkpoint.stage(spark, ckptDir, s"${name}_i0",
      fingerprint = s"$fingerprint|i0")(init)
    var i = 0
    while (i < iters) {
      val hi = math.min(i + every, iters)
      val prev = state
      val from = i
      state = Checkpoint.stage(spark, ckptDir, s"${name}_i$hi",
        fingerprint = s"$fingerprint|i$hi") {
        var st = prev
        var j = from + 1
        while (j <= hi) { st = step(st, j); j += 1 }
        st
      }
      i = hi
    }
    state
  }
}
