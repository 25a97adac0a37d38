package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata. The container has no codec libraries, so the
 * decode step is STUBBED (deterministic content-seeded fake features via
 * TextInternal.fakeEmbed — clearly marked); everything Spark-side — schema,
 * batching, partition sizing, feature-column shape — is real and tested.
 *
 * At deployment the stub is replaced by a codec call inside the same batched
 * map (mapPartitions with fixed-size batches below, equivalent in shape to a
 * `mapInPandas` Arrow-batch UDF on the PySpark side: batch in, batch out,
 * one decoder init per batch, never per row).
 */
object Multimodal {

  /** Typed metadata for a binary payload: length, magic-byte mime sniff,
    * content hash. Pure codegen expressions — no decode needed. The hash is
    * sha256 (hex): content-addressing at corpus scale needs a collision-free
    * digest anyway, and it is independently recomputable by the oracle. */
  def withBinaryMeta(df: DataFrame, binCol: String = "html"): DataFrame =
    df.withColumn("bin_len", length(col(binCol)).cast("long"))
      .withColumn("mime", mimeSniff(col(binCol)))
      .withColumn("content_hash", sha2(col(binCol), 256))

  /** Feature extraction over the binary column. STUB decode (see object doc);
    * output column is a real Array[Float] feature vector with the schema the
    * downstream ANN/dedup operators consume. */
  def withFeatures(df: DataFrame, binCol: String = "html", dim: Int = 64): DataFrame =
    df.withColumn("features", fakeEmbed(col(binCol), lit(dim)))

  /** PORTABLE feature extraction: pseudo-features derived from the sha256
    * content digest — f_i = sha60(hex_digest ':' i) / 2^60 - 0.5, where
    * sha60 is the first 15 hex chars of sha256 parsed as a long. Unlike the
    * splitmix-seeded [[withFeatures]] stub, every value (and the norm) is
    * independently recomputable by an ANSI oracle; the decode step remains
    * the same documented substitution point. Division by 2^60 is exact and
    * the long->double cast rounds identically in both engines. */
  def withPortableFeatures(df: DataFrame, binCol: String = "html", dim: Int = 16): DataFrame =
    // one codegen StaticInvoke per row (an interpreted higher-order lambda
    // would pay ~70us/element for the nested sha256+hex-parse chain)
    df.withColumn("features", portableFeatures(col(binCol), lit(dim)))
      .withColumn("feat_norm",
        sqrt(aggregate(col("features"), lit(0.0), (acc, x) => acc + x * x)))

  /** "Frame sampling": N evenly spaced byte-range slices of the payload —
    * the partitioning/batch shape of video frame extraction with the codec
    * swapped out for substring slicing. Output: exploded (frame_idx, frame). */
  def sampleFrames(df: DataFrame, binCol: String = "html", frames: Int = 4): DataFrame = {
    val len = length(col(binCol))
    val idx = explode(sequence(lit(0), lit(frames - 1)))
    df.withColumn("frame_idx", idx)
      .withColumn("frame_off", (col("frame_idx") * len / frames).cast("int") + 1)
      .withColumn("frame", substring(col(binCol), lit(0), lit(0)))
      .withColumn("frame",
        expr(s"substring($binCol, frame_off, greatest(int(length($binCol)/$frames), 1))"))
      .drop("frame_off")
  }

  /** Batched decode skeleton: fixed-size batches inside each partition, one
    * "decoder" (here: none) per batch — the mapInPandas-equivalent contract.
    * Returns (url, batch_id, n_in_batch, features). */
  def batchedDecode(spark: SparkSession, df: DataFrame, binCol: String = "html",
                    batchSize: Int = 64, dim: Int = 16): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(String, Array[Byte])] =
      df.select(col("url"), col(binCol)).as[(String, Array[Byte])]
    pairs.mapPartitions { it =>
      it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bid) =>
        // real codec would init once here, decode the whole batch vectorized
        batch.map { case (url, bytes) =>
          val fv = new Array[Float](dim)
          var h = 0xcbf29ce484222325L
          bytes.foreach { b => h = (h ^ (b & 0xffL)) * 0x100000001b3L }
          var i = 0
          while (i < dim) {
            fv(i) = ((graft.text.TextCore.mix(h + i) >>> 40).toInt / 16777216.0f) - 0.5f
            i += 1
          }
          (url, bid, batch.size, fv)
        }
      }
    }.toDF("url", "batch_id", "n_in_batch", "features")
  }
}
