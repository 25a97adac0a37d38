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

  /** ANN top-k via hyperplane LSH + multi-probe. Recall tunable by bits
    * (fewer bits = bigger buckets = higher recall, more compute). */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 10,
             qId: String = "vec_id", qVec: String = "embedding",
             cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val c = corpus.select(col(cId).as("item_id"), col(cVec).as("cv"),
      lshSig(col(cVec), lit(bits)).as("bucket"))
    val q = broadcast(
      queries.select(col(qId).as("query_id"), col(qVec).as("qv"),
        explode(multiProbe(lshSig(col(qVec), lit(bits)), lit(bits))).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("item_id") =!= col("query_id"))
      .dropDuplicates("query_id", "item_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select("query_id", "knn_rank", "item_id", "cos")
  }
}
