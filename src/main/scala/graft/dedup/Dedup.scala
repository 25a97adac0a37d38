package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Deduplication operators for web-text corpora. Shapes chosen for 10^12-doc
 * scale:
 *
 *  - exact: one hash-shuffle groupBy on sha2(text) — never groupBy raw text
 *    at scale (wide shuffle rows); the digest is the shuffle key, min(doc_id)
 *    the survivor.
 *  - MinHash+LSH near-dup: signature is map-only (codegen shim), candidate
 *    generation is an equi-join on (band_idx, band_hash) — the classic
 *    shingle->minhash->band->bucket-join plan; only bucket collisions are
 *    verified. No pairwise n^2 anywhere.
 *  - SimHash: 64-bit signature, pigeonhole blocking on 4x16-bit segments
 *    (hamming<=3 guarantees >=1 equal segment), verify by popcount.
 *  - n-gram Jaccard: exact verification on LSH candidates only.
 *  - embedding cosine: random-hyperplane LSH buckets, verify by cosine.
 *
 * Every operator returns DataFrames keyed by doc ids — composable with
 * downstream keep/drop policies.
 */
object Dedup {

  /** Exact dedup: survivors + group stats. Output one row per distinct text:
    * (keep_id, dup_count). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Documents surviving exact dedup (min id per identical text). */
  def exactSurvivors(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signatures + LSH band keys, map-only. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", shingleN: Int = 3,
                        perms: Int = 64, bands: Int = 16): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      minhash(col(textCol), lit(shingleN), lit(perms)).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(bandHashes(col("sig"), lit(bands))).as(Seq("band_idx", "band_hash")))

  /** Near-duplicate pairs with estimated Jaccard >= threshold.
    * Output: (doc_a, doc_b, jaccard_est), doc_a < doc_b. */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      shingleN: Int = 3, perms: Int = 64, bands: Int = 16): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, perms, bands)
    val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("band_idx"), col("band_hash"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard_est", sigOverlap(col("sig_a"), col("sig_b")))
      .filter(col("jaccard_est") >= threshold)
      .select("doc_a", "doc_b", "jaccard_est")
  }

  /** Exact n-gram Jaccard on LSH candidates (two-phase: cheap recall join,
    * exact verify needs the texts back — joined by id, so text is carried
    * once per candidate pair, never in the bucket explosion). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.7,
                        idCol: String = "doc_id", textCol: String = "text",
                        shingleN: Int = 3): DataFrame = {
    val cand = minhashLshPairs(docs, threshold = threshold * 0.7, idCol, textCol, shingleN)
    val texts = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    cand.join(texts.withColumnRenamed("id", "doc_a").withColumnRenamed("t", "text_a"), "doc_a")
      .join(texts.withColumnRenamed("id", "doc_b").withColumnRenamed("t", "text_b"), "doc_b")
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b"), lit(shingleN)))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist (default 3).
    * Blocking: 4 x 16-bit segments — any pair within hamming 3 shares at
    * least one segment (pigeonhole), so the equi-join on (seg_idx, seg_val)
    * has full recall. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sh"))
    val segs = sigs.withColumn("seg_idx", explode(sequence(lit(0), lit(3))))
      .withColumn("seg_val",
        expr("shiftrightunsigned(sh, seg_idx * 16)").bitwiseAND(lit(0xffffL)))
    val a = segs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("seg_idx"), col("seg_val"))
    val b = segs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("seg_idx"), col("seg_val"))
    a.join(b, Seq("seg_idx", "seg_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming_dist", hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming_dist") <= maxDist)
      .select("doc_a", "doc_b", "hamming_dist")
  }

  /** Embedding near-dup: cosine >= threshold via hyperplane-LSH bucket join +
    * exact cosine verify. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            bits: Int = 12): DataFrame = {
    val sigs = embeddings.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      lshSig(col(vecCol), lit(bits)).as("bucket"))
    val a = sigs.select(col("vec_id").as("id_a"), col("v").as("v_a"), col("bucket"))
    val b = sigs.select(col("vec_id").as("id_b"), col("v").as("v_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
