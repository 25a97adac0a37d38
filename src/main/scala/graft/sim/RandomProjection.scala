package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.text.TextCore

/**
 * Signed random projection (the Johnson–Lindenstrauss transform with a
 * ±1 Achlioptas matrix) — the cheap dimensionality reduction an embedding
 * pipeline runs before LSH banding or sketch-level similarity when the
 * native dimension is too wide. The projection matrix is DETERMINISTIC:
 * entry (k, i) is ±1 by one bit of the portable 60-bit sha256 hash of
 * `"srp:k:i"` ([[TextCore.sha60]], the same definition every sketch oracle
 * replays), so the matrix is never stored — both engines re-derive it.
 *
 * Exactness: inputs are fixed-point longs, each output coordinate is an
 * exact ±1-weighted long sum (one codegen [[TextFunctions.longDot]] per
 * output dim with the sign row as an array literal) — no float anywhere.
 *
 * Scale shape: MAP-ONLY — outDims literal-array dots + one posexplode; the
 * matrix rides the plan (outDims × dim ≤ a few KB of literals), the corpus
 * never shuffles. The oracle computes the same values the opposite way
 * (explode × sign-table join × group) — two algorithms, one result.
 */
object RandomProjection {

  /** Fixed-point scale, shared with [[SemDedup.Scale]]. */
  val Scale: Long = SemDedup.Scale

  /** Deterministic ±1 matrix entry for output dim k, input dim i. */
  def sign(k: Int, i: Int): Long =
    if ((TextCore.sha60(s"srp:$k:$i") & 1L) == 0L) 1L else -1L

  /** @return (vec_id: long, k: int, y_scaled: long) — the projected
    *         coordinates at the input fixed-point scale */
  def project(emb: DataFrame, idCol: Column, vecCol: Column,
              outDims: Int = 16): DataFrame = {
    require(outDims >= 1 && outDims <= 256,
      s"outDims must be in [1,256], got $outDims")
    val sv = emb.select(idCol.cast("long").as("vec_id"),
      TextFunctions.scaleLongs(vecCol, lit(Scale.toDouble)).as("sv"))
    val dim = sv.select(size(col("sv"))).head().getInt(0)
    val dots = (0 until outDims).map { k =>
      TextFunctions.longDot(col("sv"),
        array((0 until dim).map(i => lit(sign(k, i))): _*))
    }
    sv.select(col("vec_id"),
      posexplode(array(dots: _*)).as(Seq("k", "y_scaled")))
  }
}
