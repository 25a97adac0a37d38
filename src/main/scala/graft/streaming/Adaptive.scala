package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Scale-adaptive partitioning for STREAMING queries (optimization guide §2:
 * "make partitioning scale-adaptive — derive it from input size — rather
 * than a constant tuned for either local mode or the cluster").
 *
 * Batch plans get this from AQE's post-shuffle coalescing; streaming plans
 * do NOT — `spark.sql.shuffle.partitions` at the FIRST micro-batch fixes the
 * state-store partition count for the life of the checkpoint, and every
 * micro-batch thereafter pays one state-store commit (delta file + fsync)
 * per partition per stateful operator, plus one sink file per non-empty
 * partition. A constant tuned to the core count therefore hurts twice: a
 * small replay pays ~32x the state/commit overhead it needs, and a crawl
 * run gets state partitions far too coarse to hold per-partition state in
 * memory.
 *
 * Policy: one state partition per ~64 MB of source input, clamped to
 * [1, 4 x defaultParallelism] — small sources collapse to a handful of
 * state stores, crawl-scale sources scale out with the data (the same
 * bytes-per-partition sizing the guide recommends for shuffle partitions).
 * `GRAFT_STREAM_STATE_PARTITIONS` overrides for deployments that know their
 * key cardinality.
 */
object Adaptive {

  /** Derived state/shuffle partition count for a streaming query over the
    * given source paths. */
  def statePartitions(s: SparkSession, paths: String*): Int =
    sys.env.get("GRAFT_STREAM_STATE_PARTITIONS").map(_.toInt).getOrElse {
      val conf = s.sparkContext.hadoopConfiguration
      val bytes = paths.map { p =>
        val hp = new Path(p)
        val fs = hp.getFileSystem(conf)
        if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
      }.sum
      // ~16 MB of source per state partition: the keyed stream behind the
      // state op is typically a multiple of the source bytes (mention
      // fan-out), so 64 MB/partition under-parallelized the aggregation
      // (measured: geo_stream_forward 2.8 s -> 4.2 s at 1 partition, back
      // under 2.4 s at 4)
      val perPartition = 16L << 20
      val want = (bytes + perPartition - 1) / perPartition
      math.max(1L, math.min(4L * s.sparkContext.defaultParallelism, want)).toInt
    }

  /** Run `body` (start + await a streaming query) with
    * `spark.sql.shuffle.partitions` temporarily set to `n`; the session
    * value is restored afterwards so batch queries are unaffected. */
  def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }
}
