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
 *  - embedding cosine: multi-band random-hyperplane LSH buckets, verify by
 *    exact cosine.
 *
 * Degenerate-bucket guards (the crawl-scale killers):
 *  - empty/near-empty texts all hash to the SAME signature (all-MaxValue
 *    minhash, simhash 0) — `minLen` drops them before any bucketing. Empty
 *    docs are exact duplicates of each other anyway; exact dedup owns them.
 *  - boilerplate-heavy corpora put millions of docs in one bucket, making the
 *    within-bucket self-join quadratic. `maxBucket` caps bucket size: buckets
 *    above the cap are excluded from candidate generation (counted via
 *    `droppedBuckets` for observability). A bucket that large is near-
 *    identical content — exact dedup (or a tighter signature) owns it; an
 *    n^2 join never does. Recall for genuine near-dups is unaffected at sane
 *    caps because a near-dup pair still collides in its other, smaller
 *    buckets.
 *  - candidate generation shuffles only (doc_id, band keys) — the 64-long
 *    signature arrays are re-joined BY ID after the bucket join, never
 *    carried through the bucket explosion.
 *
 * Every operator returns DataFrames keyed by doc ids — composable with
 * downstream keep/drop policies.
 */
object Dedup {

  /** Default minimum text length (chars) for near-dup sketching; shorter
    * texts degenerate to identical signatures. */
  val DefaultMinLen = 16

  /** Default bucket-size cap for LSH candidate generation. */
  val DefaultMaxBucket = 256

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

  /** MinHash signatures, map-only: (doc_id, sig). Empty/short texts are
    * dropped — they all share the all-MaxValue signature. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", shingleN: Int = 3,
                        perms: Int = 64, minLen: Int = DefaultMinLen): DataFrame =
    docs.filter(length(col(textCol)) >= minLen)
      .select(col(idCol).as("doc_id"),
        minhash(col(textCol), lit(shingleN), lit(perms)).as("sig"))

  /** Narrow LSH band rows: (doc_id, band_idx, band_hash) — the only columns
    * that ever flow through the bucket join. */
  private def bandRows(sigs: DataFrame, bands: Int): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(bandHashes(col("sig"), lit(bands))).as(Seq("band_idx", "band_hash")))

  /** Keys of buckets at or under the size cap. Same join key as the candidate
    * self-join, so the extra aggregation rides the same exchange. */
  private def cappedBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bc"))
      .filter(col("__bc") <= maxBucket).drop("__bc")

  /** Observability for the cap: one row per DROPPED bucket with its size.
    * At crawl scale, run this (cheap aggregation) and log/store the result —
    * silent truncation must never read as full coverage. */
  def droppedBuckets(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", shingleN: Int = 3,
                     perms: Int = 64, bands: Int = 16,
                     minLen: Int = DefaultMinLen,
                     maxBucket: Int = DefaultMaxBucket): DataFrame =
    bandRows(minhashSignatures(docs, idCol, textCol, shingleN, perms, minLen), bands)
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** Candidate pairs (doc_a < doc_b) from a capped bucket self-join over
    * narrow (id, key...) rows. */
  private def bucketPairs(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val pruned = rows.join(cappedBuckets(rows, keys, maxBucket), keys)
    val a = pruned.withColumnRenamed("doc_id", "doc_a")
    val b = pruned.withColumnRenamed("doc_id", "doc_b")
    a.join(b, keys)
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
  }

  /** Near-duplicate pairs with estimated Jaccard >= threshold.
    * Output: (doc_a, doc_b, jaccard_est), doc_a < doc_b. */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      shingleN: Int = 3, perms: Int = 64, bands: Int = 16,
                      minLen: Int = DefaultMinLen,
                      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, perms, minLen)
    val cand = bucketPairs(bandRows(sigs, bands), Seq("band_idx", "band_hash"), maxBucket)
    // signatures re-joined BY ID — one sig row per doc, never per candidate
    val sa = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard_est", sigOverlap(col("sig_a"), col("sig_b")))
      .filter(col("jaccard_est") >= threshold)
      .select("doc_a", "doc_b", "jaccard_est")
  }

  /** The exact-verify stage: shingle-set Jaccard over an EXPLICIT candidate
    * pair set (doc_a, doc_b). Texts are joined back by id — carried once per
    * candidate pair, never through any bucket explosion. Public so the verify
    * semantics are oracle-checkable over a deterministic candidate set
    * independent of the (non-ANSI) minhash recall stage. */
  def jaccardVerify(cand: DataFrame, docs: DataFrame, threshold: Double,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 3): DataFrame = {
    val texts = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    cand.join(texts.withColumnRenamed("id", "doc_a").withColumnRenamed("t", "text_a"), "doc_a")
      .join(texts.withColumnRenamed("id", "doc_b").withColumnRenamed("t", "text_b"), "doc_b")
      .withColumn("jaccard", jaccard(col("text_a"), col("text_b"), lit(shingleN)))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact n-gram Jaccard on LSH candidates (two-phase: cheap recall join,
    * exact verify needs the texts back — see jaccardVerify). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.7,
                        idCol: String = "doc_id", textCol: String = "text",
                        shingleN: Int = 3): DataFrame =
    jaccardVerify(
      minhashLshPairs(docs, threshold = threshold * 0.7, idCol, textCol, shingleN),
      docs, threshold, idCol, textCol, shingleN)

  /** SimHash near-dup pairs with hamming distance <= maxDist (default 3).
    * Blocking: 4 x 16-bit segments — any pair within hamming 3 shares at
    * least one segment (pigeonhole), so the equi-join on (seg_idx, seg_val)
    * has full recall among docs >= minLen and buckets <= maxBucket. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   minLen: Int = DefaultMinLen,
                   maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sigs = docs.filter(length(col(textCol)) >= minLen)
      .select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sh"))
    val segs = sigs.withColumn("seg_idx", explode(sequence(lit(0), lit(3))))
      .withColumn("seg_val",
        expr("shiftrightunsigned(sh, seg_idx * 16)").bitwiseAND(lit(0xffffL)))
      .select("doc_id", "seg_idx", "seg_val")
    val cand = bucketPairs(segs, Seq("seg_idx", "seg_val"), maxBucket)
    val sa = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("hamming_dist", hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming_dist") <= maxDist)
      .select("doc_a", "doc_b", "hamming_dist")
  }

  /** Embedding near-dup: cosine >= threshold via MULTI-BAND hyperplane-LSH
    * bucket join + exact cosine verify. `bands` independent hyperplane sets
    * of `bits` each: a pair is a candidate if ANY band collides — at the
    * defaults (12 bits x 6 bands), recall for cos >= 0.95 pairs is ~0.86 and
    * for cos >= 0.99 pairs > 0.999, vs ~0.3 for a single 12-bit table.
    * Scale note: `bits` should grow with corpus size (~log2(n) - 10); the
    * bucket cap keeps degenerate directions (zero vectors, dominant cluster
    * axes) from going quadratic regardless. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            bits: Int = 12, bands: Int = 6,
                            maxBucket: Int = 1024): DataFrame = {
    val base = embeddings.select(col(idCol).as("doc_id"), col(vecCol).as("v"))
    val bandCols = (0 until bands).map(t => lshSigBand(col("v"), lit(bits), lit(t)))
    val rows = base.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "bucket")))
    val cand = bucketPairs(rows, Seq("band_idx", "bucket"), maxBucket)
    val va = base.select(col("doc_id").as("doc_a"), col("v").as("v_a"))
    val vb = base.select(col("doc_id").as("doc_b"), col("v").as("v_b"))
    cand.join(va, "doc_a").join(vb, "doc_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("cos"))
  }
}
