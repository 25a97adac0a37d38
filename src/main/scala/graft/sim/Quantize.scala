package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Int8 scalar quantization for embedding search — the memory-bandwidth
 * lever for ANN over 100 TB of embeddings.
 *
 * At that scale the corpus scan IS the cost: brute-force (and every
 * IVF-probed posting list) is bound by bytes moved, not FLOPs. Symmetric
 * per-vector int8 codes (1 byte/component + one float scale) cut the scan
 * 4x vs float32, and scoring becomes an exact integer dot (VecCore.int8Dot,
 * codegen StaticInvoke over packed binary — no per-element lambda) with ONE
 * double multiply per pair for the asymmetric-distance estimate:
 *
 *   score(q, c) = (qMaxAbs/127) * (cMaxAbs/127) * int8Dot(qCode, cCode)
 *
 * All arithmetic past quantization is exact integers, so the whole chain —
 * codes, dots, scores, ranks — is bit-reproducible at any cluster size and
 * replayable by an external engine (the DuckDB oracle re-derives the codes
 * from the same floats with identical op order and ties-away rounding).
 *
 * Composition at scale: quantizeCodes is a map-only pass persisted once
 * (the codes TABLE is the product — at 10^12 vectors it lives bucketed by
 * IVF list, cf. Similarity.ivfKnnBucketed); int8Knn scans codes instead of
 * floats; int8RerankKnn re-ranks a short int8 candidate list with exact
 * float cosine — the standard two-phase shape (SQ8 in FAISS terms) that
 * keeps recall while the full-precision table is touched only k'-deep
 * per query.
 */
object Quantize {

  /** Map-only quantization pass: (item_id, code: binary, mx: double).
    * `mx` is the per-vector scale numerator (largest |component|). */
  def quantizeCodes(emb: DataFrame, id: String = "vec_id",
                    vec: String = "embedding"): DataFrame =
    emb.select(col(id).as("item_id"), int8Pack(col(vec)).as("code"),
      vecMaxAbs(col(vec)).as("mx"))

  /** Approximate top-k by int8 asymmetric distance: queries are quantized
    * and broadcast, the corpus is scanned as packed codes (4x fewer bytes
    * than float32), ties break on item_id. Output: (query_id, knn_rank,
    * item_id, idot, score) — idot is the exact integer dot, score the
    * descaled double estimate. */
  def int8Knn(queries: DataFrame, corpus: DataFrame, k: Int,
              qId: String = "vec_id", qVec: String = "embedding",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val c = quantizeCodes(corpus, cId, cVec)
    val q = broadcast(queries.select(col(qId).as("query_id"),
      int8Pack(col(qVec)).as("qcode"), vecMaxAbs(col(qVec)).as("qmx")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("item_id"))
    c.crossJoin(q)
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("idot", int8Dot(col("qcode"), col("code")))
      // pinned op order: (qmx/127) * (mx/127) * idot — the oracle replays it
      .withColumn("score", (col("qmx") / lit(127.0)) * (col("mx") / lit(127.0))
        * col("idot").cast("double"))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "idot", "score")
  }

  /** Two-phase search: int8 shortlist of `shortlist` candidates, then exact
    * float cosine re-rank to top-k — full-precision vectors are read only
    * shortlist-deep per query. Output: (query_id, knn_rank, item_id, cos). */
  def int8RerankKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    shortlist: Int,
                    qId: String = "vec_id", qVec: String = "embedding",
                    cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cand = int8Knn(queries, corpus, shortlist, qId, qVec, cId, cVec)
      .select(col("query_id"), col("item_id"))
    val qv = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv")))
    val cv = corpus.select(col(cId).as("item_id"), col(cVec).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id"))
    cand.join(cv, Seq("item_id"))
      .join(qv, Seq("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "cos")
  }

  /** Product-quantization codebooks derived deterministically from the
    * corpus itself: the GLOBAL int8 scale (corpus max |component| — one
    * combinable agg) plus the `ks` lowest-id vectors quantized at that scale
    * and concatenated into one `ks*dim` blob (row t at offset t*dim). Seed-
    * sampled codebooks trade a little quantization error vs Lloyd-trained
    * ones for full external replayability: an oracle rebuilds the exact
    * codebooks with ORDER BY id LIMIT ks — no k-means replay needed. The two
    * collects are bounded by construction (1 scalar; ks rows — the same
    * documented role as the IVF trainer's nlist centroid means). */
  def pqTrainBooks(corpus: DataFrame, ks: Int,
                   id: String = "vec_id", vec: String = "embedding"): (Double, Array[Byte]) = {
    val scale = corpus.agg(max(vecMaxAbs(col(vec))).as("mx")).head.getDouble(0)
    val seeds = corpus.select(col(id).as("id"), col(vec).as("v"))
      .orderBy("id").limit(ks).collect()
      .map(r => VecCore.int8PackScaled(r.getSeq[Float](1).toArray, scale))
    require(seeds.length == ks, s"corpus has ${seeds.length} < ks=$ks vectors")
    (scale, seeds.flatten)
  }

  /** Approximate top-k by PQ asymmetric distance computation (ADC): the
    * corpus is scanned as m-byte PQ codes (dim/m-fold less bandwidth than
    * even SQ8 — at 10^12 vectors the codes table for dim=64, m=4 is 1/64th
    * the float32 corpus), each query carries a precomputed m*ks integer
    * lookup table, and scoring an item is an m-length gather-and-add
    * ([[VecCore.pqAdc]]). Every step past the float reads is exact integer
    * math — codes, assignments, LUTs, estimates, ranks are all
    * bit-reproducible and externally replayable. Ties: est desc, item_id.
    * Output: (query_id, knn_rank, item_id, est, score); est is the exact
    * integer ADC dot in code units, score = (scale/127)^2 * est. Recall
    * follows PQ's usual profile — pair with an exact re-rank
    * ([[int8RerankKnn]]'s shape) when the shortlist feeds training. */
  def pqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
            m: Int = 4, ks: Int = 16,
            qId: String = "vec_id", qVec: String = "embedding",
            cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val (scale, books) = pqTrainBooks(corpus, ks, cId, cVec)
    val bl = lit(books)
    val c = corpus.select(col(cId).as("item_id"),
      pqEncode(int8PackScaled(col(cVec), lit(scale)), bl, lit(m), lit(ks)).as("codes"))
    val q = broadcast(queries.select(col(qId).as("query_id"),
      pqLut(int8PackScaled(col(qVec), lit(scale)), bl, lit(m), lit(ks)).as("lut")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est").desc, col("item_id"))
    c.crossJoin(q)
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("est", pqAdc(col("lut"), col("codes"), lit(ks)))
      // pinned op order: (scale/127) * (scale/127) * est — the oracle replays it
      .withColumn("score", (lit(scale) / lit(127.0)) * (lit(scale) / lit(127.0))
        * col("est").cast("double"))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "est", "score")
  }

  /** IVF + PQ — the composed scale path (the FAISS IVFADC shape): the corpus
    * is routed ONCE into nlist posting lists by the Lloyd-trained coarse
    * quantizer ([[Similarity.trainIvfCentroids]]) and SCORED by PQ codes, so
    * a probe touches nprobe/nlist of the corpus and reads m bytes per
    * candidate instead of 4*dim. At 10^12 vectors the posting lists live as
    * a list-bucketed table ([[Similarity.writeIvfBucketed]]'s layout, codes
    * column added) — probe lists push down as an IN filter, the scan
    * bucket-prunes, and the per-candidate work is [[VecCore.pqAdc]]'s
    * m-length gather. Routing only selects WHICH candidates are scored —
    * with nprobe = nlist the result is bit-identical to [[pqKnn]] (the
    * contract proof); recall at nprobe < nlist follows the usual IVF
    * coverage profile (spec-tested). */
  def ivfPqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
               nlist: Int = 16, nprobe: Int = 4, m: Int = 4, ks: Int = 16,
               iters: Int = 5,
               qId: String = "vec_id", qVec: String = "embedding",
               cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cents = typedLit(
      Similarity.trainIvfCentroids(corpus, nlist, iters, cId, cVec).toSeq)
    val (scale, books) = pqTrainBooks(corpus, ks, cId, cVec)
    val bl = lit(books)
    val c = corpus.select(col(cId).as("item_id"),
      nearestCentroid(col(cVec), cents).as("list"),
      pqEncode(int8PackScaled(col(cVec), lit(scale)), bl, lit(m), lit(ks)).as("codes"))
    val q = broadcast(queries.select(col(qId).as("query_id"),
      pqLut(int8PackScaled(col(qVec), lit(scale)), bl, lit(m), lit(ks)).as("lut"),
      explode(nearestCentroids(col(qVec), cents, lit(nprobe))).as("list")))
    // a corpus vector lives in exactly one list -> (query, item) pairs are
    // unique by construction, and probing ALL lists yields exactly pqKnn's
    // pair set
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est").desc, col("item_id"))
    c.join(q, Seq("list"))
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("est", pqAdc(col("lut"), col("codes"), lit(ks)))
      .withColumn("score", (lit(scale) / lit(127.0)) * (lit(scale) / lit(127.0))
        * col("est").cast("double"))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "est", "score")
  }

  /** The PERSISTED world-scale IVF+PQ layout: coarse list assignment + PQ
    * codes written ONCE as a list-bucketed table — at 10^12 vectors this
    * table is the product (m bytes/vector vs 4*dim for the floats), and the
    * one-off encode pass amortizes over every query batch exactly like
    * [[Similarity.writeIvfBucketed]]'s float layout and the packed polygon
    * index. */
  def writeIvfPqBucketed(spark: org.apache.spark.sql.SparkSession,
                         corpus: DataFrame, centroids: Array[Float],
                         scale: Double, books: Array[Byte],
                         table: String, path: String, buckets: Int = 8,
                         m: Int = 4, ks: Int = 16,
                         cId: String = "vec_id", cVec: String = "embedding"): Unit = {
    val c = corpus.select(col(cId).as("item_id"),
      nearestCentroid(col(cVec), typedLit(centroids.toSeq)).as("list"),
      pqEncode(int8PackScaled(col(cVec), lit(scale)), lit(books),
        lit(m), lit(ks)).as("codes"))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    c.write.bucketBy(buckets, "list").sortBy("list")
      .option("path", path).mode("overwrite").saveAsTable(table)
  }

  /** Query batches over a [[writeIvfPqBucketed]] layout: probe lists resolve
    * driver-side and push down as an IN filter so the scan bucket-prunes to
    * the probed posting lists; queries broadcast with their precomputed
    * integer LUTs; the codes side has NO exchange anywhere in the plan
    * (plan-asserted in QuantizeSpec) — the IVFADC deployment shape where a
    * probe reads nprobe/nlist of an m-bytes-per-vector table. */
  def ivfPqKnnBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
                       queries: DataFrame, k: Int, nprobe: Int,
                       centroids: Array[Float], scale: Double, books: Array[Byte],
                       m: Int = 4, ks: Int = 16,
                       qId: String = "vec_id", qVec: String = "embedding"): DataFrame = {
    val cents = typedLit(centroids.toSeq)
    // cached: the LUT + probe-assignment work is paid once, not re-run by
    // the driver-side distinct-lists resolve AND the join (the query batch
    // is broadcast-sized by construction)
    val q0 = queries.select(col(qId).as("query_id"),
        pqLut(int8PackScaled(col(qVec), lit(scale)), lit(books),
          lit(m), lit(ks)).as("lut"),
        explode(nearestCentroids(col(qVec), cents, lit(nprobe))).as("list"))
      .cache()
    val lists = q0.select("list").distinct().collect().map(_.getInt(0)).sorted
    val c = spark.table(table)
      .filter(col("list").isin(lists.map(Int.box): _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est").desc, col("item_id"))
    c.join(broadcast(q0), Seq("list"))
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("est", pqAdc(col("lut"), col("codes"), lit(ks)))
      .withColumn("score", (lit(scale) / lit(127.0)) * (lit(scale) / lit(127.0))
        * col("est").cast("double"))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "est", "score")
  }
}
