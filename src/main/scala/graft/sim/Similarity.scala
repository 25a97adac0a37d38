package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Approximate-nearest-neighbour search over an embedding column
 * (Array[Float]).
 *
 *  - bruteForceKnn: exact cosine top-k — queries broadcast against the
 *    corpus scan; the baseline and the verifier for the ANN path. One pass
 *    over the corpus per query batch, no shuffle of the corpus.
 *  - lshKnn: random-hyperplane bucket join with multi-probe (1-bit flips) —
 *    the scale path: corpus is bucketed once (map-only signature), queries
 *    probe bits+1 buckets; only bucket collisions are scored.
 */
object Similarity {

  /** Exact top-k by cosine. queries/corpus: (id, vec) shaped via col names. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    qId: String = "vec_id", qVec: String = "embedding",
                    cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv")))
    val c = corpus.select(col(cId).as("item_id"), col(cVec).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "cos")
  }

  /** ANN top-k via MULTI-TABLE hyperplane LSH + per-table multi-probe
    * (1-bit flips). The corpus is bucketed once per table (map-only
    * signatures, corpus replicated `tables`x); queries probe
    * tables*(bits+1) buckets, i.e. a ~tables*(bits+1)/2^bits fraction of the
    * corpus at the defaults (~2% at 12 bits / 6 tables) — genuinely
    * sub-linear, unlike a few-bit single table that degenerates to
    * near-brute-force.
    *
    * Recall is defined over retrievable structure: neighbours at cos >= 0.9
    * are recalled with p > 0.95 at the defaults (TrainingOpsSpec asserts
    * >= 0.9 on planted clusters). Uniformly random directions (cos ~ 0.4
    * "neighbours") are NOT retrievable by any sub-linear method — that is
    * the regime where ANN legitimately falls back to bruteForceKnn. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 12,
             tables: Int = 6,
             qId: String = "vec_id", qVec: String = "embedding",
             cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val tableIdx = sequence(lit(0), lit(tables - 1))
    val c = corpus.select(col(cId).as("item_id"), col(cVec).as("cv"),
      posexplode(transform(tableIdx, t => lshSigBand(col(cVec), lit(bits), t)))
        .as(Seq("band_idx", "bucket")))
    // per table: the query's signature plus all 1-bit flips
    val probes = flatten(transform(tableIdx, t =>
      transform(multiProbe(lshSigBand(col(qVec), lit(bits), t), lit(bits)),
        p => struct(t.as("band_idx"), p.as("bucket")))))
    val q = broadcast(
      queries.select(col(qId).as("query_id"), col(qVec).as("qv"),
        explode(probes).as("pr"))
        .select(col("query_id"), col("qv"),
          col("pr.band_idx").as("band_idx"), col("pr.bucket").as("bucket")))
    val scored = c.join(q, Seq("band_idx", "bucket"))
      .filter(col("item_id") =!= col("query_id"))
      .dropDuplicates("query_id", "item_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "cos")
  }
}
