package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Gazetteer
import graft.fixtures.Synth
import graft.streaming.StreamGeocode

/** Streaming surface: the batch operators lifted onto readStream. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("forward geocoding runs as a structured stream with watermarked top-1") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // stage synthesized pages as the file-stream source
    Synth.pages(spark, 200, 4).toDF().write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val gaz = Gazetteer.gazetteerDF(spark)
    val idx = Gazetteer.nameIndex(gaz)
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val hits = StreamGeocode.geocodeStream(spark, stream, idx, Gazetteer.scanner())

    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("stream_hits")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // append-mode watermark holds the open window back until event time
      // advances; feed a second batch one hour later to flush the first
      Synth.pages(spark, 100, 2).toDF()
        .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 1 HOUR"))
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.sql("select * from stream_hits")
    assert(emitted.count() > 0, "watermark-advanced stream emitted no rows")
    // fixture page 0 (Schwabing mention) resolved to the golden point
    val schwabing = emitted.filter($"url" === "https://example.org/p/0").collect()
    assert(schwabing.nonEmpty)
    assert(schwabing.head.getAs[Double]("lon") === 11.5884858)
    assert(schwabing.head.getAs[Long]("tile_x") === 2179L)
  }
}
