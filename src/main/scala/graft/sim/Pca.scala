package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Dominant principal direction of an embedding corpus by POWER ITERATION —
 * the whitening/decorrelation primitive an embedding pipeline runs before
 * SemDeDup-style clustering or ANN index training (the top component of web
 * text embeddings is a well-known hubness axis worth projecting out).
 *
 * Every arithmetic step is exact: embeddings enter the shared fixed-point
 * representation ([[SemDedup.Scale]]), per-vector projections are exact long
 * dots (codegen [[TextFunctions.longDot]], same shim family as k-means'
 * longSqDist), the per-dimension matvec accumulates exact DECIMAL(38,0)
 * products, and re-normalization uses the INFINITY norm so it stays in
 * integer division (power iteration converges to the same dominant
 * eigenvector under any norm). Signs are split before every integral
 * division (`sign(x) * (abs(x) div k)`) so floor-vs-truncate can never
 * diverge between engines — the emb_pca_power oracle replays all rounds
 * bit-for-bit.
 *
 * Scale shape: one fixed-point pass, persisted; each round is a MAP-ONLY
 * projection (the direction rides the plan as a dim-length array literal —
 * no join on the corpus side) + ONE combinable (pos)-keyed aggregation to
 * `dim` rows; driver state is the dim-length direction vector — the same
 * bounded-collect role as the k-means centroid matrix. At 1000 executors
 * each round is one scan with map-side partials; nothing scales with n.
 * The DECIMAL(38,0) accumulator leaves ~18 orders of magnitude of headroom
 * over the per-term 6.4e19 bound. The re-entry of the compressed matvec
 * into BIGINT ([[UExpr]]: `abs(w) div 1e12`) is the tighter bound: it
 * requires `|w| < ~9.2e30`, i.e. ~10^11 rows at the worst-case per-term
 * magnitude — beyond that the ANSI cast fails LOUDLY (no silent wrap).
 * Driver-side renormalization is BigInt-exact ([[renorm]]), so the
 * direction vector cannot be corrupted by a wrapped Long product at any
 * matvec magnitude the BIGINT re-entry admits.
 */
object Pca {

  /** Fixed-point scale, shared with [[SemDedup.Scale]]/[[KMeans.Scale]]. */
  val Scale: Long = SemDedup.Scale

  /** `u = sign(w) * (abs(w) div 1e12)` — the matvec output compressed back
    * to a BIGINT working range with sign-split integral division. */
  private val UExpr =
    "CASE WHEN w < 0 THEN -1 ELSE 1 END * CAST(abs(w) div 1000000000000 AS BIGINT)"

  /**
   * @param rounds power-iteration rounds (3 separates the dominant
   *               direction clearly on embedding-scale spectra)
   * @return per-vector first-PC coordinates: (vec_id: long,
   *         pc1_scaled: long — exact fixed-point dot with the final
   *         direction, eig_u: long — the final round's un-normalized
   *         infinity norm, a growth-rate eigenvalue proxy)
   */
  def powerIteration(emb: DataFrame, idCol: Column, vecCol: Column,
                     rounds: Int = 3): DataFrame = {
    val sv = scaled(emb, idCol, vecCol).persist()
    val (v, eig) = fit(sv, rounds)
    val vLit = array(v.toIndexedSeq.map(lit): _*)
    sv.select(col("vec_id"),
        TextFunctions.longDot(col("sv"), vLit).as("pc1_scaled"))
      .withColumn("eig_u", lit(eig))
  }

  /**
   * PC1 REMOVAL (the whitening step that uses [[powerIteration]]'s output):
   * each vector's component along the dominant direction is projected out,
   * in EXACT integer arithmetic over the common denominator `den = v·v` —
   * `resid_num_ij = x_ij · den − v_j · (x_i·v)`, so the residual is the
   * rational `resid_num / den` with no rounding anywhere. The defining
   * invariant Σ_j resid_num_ij · v_j = 0 holds EXACTLY (integer zero, not
   * epsilon), which the spec and the DuckDB oracle both exploit.
   *
   * Scale shape: the direction and denominator ride the plan as literals,
   * the per-vector dot is one codegen longDot, and the explode emits the
   * (vec_id, pos) residual rows any per-dimension consumer needs anyway —
   * map-only, zero shuffle.
   *
   * @return (vec_id, pos, resid_num: decimal(38,0), den: long)
   */
  def removeDominant(emb: DataFrame, idCol: Column, vecCol: Column,
                     rounds: Int = 3): DataFrame = {
    val sv = scaled(emb, idCol, vecCol).persist()
    val (v, _) = fit(sv, rounds)
    val vLit = array(v.toIndexedSeq.map(lit): _*)
    val den = v.map(x => x * x).sum
    sv.select(col("vec_id"),
        TextFunctions.longDot(col("sv"), vLit).as("dot"), col("sv"))
      .select(col("vec_id"), col("dot"),
        posexplode(col("sv")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        (col("x").cast("decimal(19,0)") * lit(den).cast("decimal(19,0)") -
          element_at(vLit, col("pos") + 1).cast("decimal(19,0)") *
            col("dot").cast("decimal(19,0)")).as("resid_num"),
        lit(den).as("den"))
  }

  private def scaled(emb: DataFrame, idCol: Column, vecCol: Column): DataFrame =
    emb.select(idCol.cast("long").as("vec_id"),
      TextFunctions.scaleLongs(vecCol, lit(Scale.toDouble)).as("sv"))

  /** The shared power-iteration driver loop: returns the final direction at
    * fixed-point scale and the last round's un-normalized infinity norm. */
  private def fit(sv: DataFrame, rounds: Int): (Array[Long], Long) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val dim = sv.select(size(col("sv"))).head().getInt(0)
    // deterministic start: the all-ones direction at unit fixed-point scale
    var v = Array.fill(dim)(Scale)
    var eig = 0L
    for (_ <- 1 to rounds) {
      val vLit = array(v.toIndexedSeq.map(lit): _*)
      // dot materializes BELOW the generate so CollapseProject cannot
      // re-inline the 64-term chain once per exploded element
      val u = sv
        .select(TextFunctions.longDot(col("sv"), vLit).as("dot"), col("sv"))
        .select(col("dot"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("pos")
        .agg(sum(col("x").cast("decimal(19,0)") *
          col("dot").cast("decimal(19,0)")).as("w"))
        .select(col("pos"), expr(UExpr).as("u"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val uArr = Array.tabulate(dim)(j => u.getOrElse(j, 0L))
      val m = uArr.map(math.abs).max
      require(m > 0, "degenerate input: power iteration collapsed to zero")
      v = renorm(uArr, m)
      eig = m
    }
    (v, eig)
  }

  /** `v_j = sign(u_j) * (|u_j| * Scale / m)` computed through BigInt so the
    * `|u_j| * Scale` intermediate cannot wrap when `m > Long.MaxValue/Scale`
    * (~9.2e12, reachable once matvec sums align with the dominant direction
    * at ~1e7+ vectors). Identical to plain Long arithmetic wherever that
    * arithmetic does not overflow: both truncate the non-negative quotient,
    * and the result is bounded by Scale so the final toLong is always safe. */
  private[graft] def renorm(uArr: Array[Long], m: Long): Array[Long] =
    uArr.map { x =>
      val q = (BigInt(math.abs(x)) * Scale / m).toLong
      if (x < 0) -q else q
    }
}
