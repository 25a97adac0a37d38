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
}
