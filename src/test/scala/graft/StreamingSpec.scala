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

  test("reverse geocoding streams STATELESS (no watermark, no state store)") {
    val dir = Files.createTempDirectory("graft-stream-rev").toString
    Synth.pages(spark, 200, 4).toDF().write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val polys = Gazetteer.polygonsDF(spark)
    val cells = Gazetteer.polygonCellIndex(polys)
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val hits = StreamGeocode.reverseStream(spark, stream, polys, cells,
      Gazetteer.scanner())
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("stream_rev")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val emitted = spark.sql("select * from stream_rev")
    // stateless: first micro-batch already emits (no watermark advance needed)
    assert(emitted.count() > 0)
    // fixture page 2 carries "41.40139, 2.12870" -> Calatrava 64 building
    val cal = emitted.filter($"url" === "https://example.org/p/2").collect()
    assert(cal.nonEmpty)
    assert(cal.head.getAs[Long]("polygon_id") === 5001L)
    assert(cal.head.getAs[String]("geocode_status") === "ok")
  }

  test("streaming exact dedup drops replays within the watermark horizon") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    val base = Synth.pages(spark, 100, 4).toDF()
    // replay 20 pages with fresh urls but identical text — same micro-batch
    val replay = base.filter(xxhash64($"url") % 5 === 0)
      .withColumn("url", concat($"url", lit("?replay")))
    base.unionByName(replay).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val out = StreamGeocode.dedupStream(stream)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val emitted = spark.sql("select * from stream_dedup")
    // exactly one survivor per distinct text
    val distinctTexts = base.select("text").distinct().count()
    assert(emitted.count() === distinctTexts)
    assert(emitted.select("text_sha").distinct().count() === emitted.count())
  }

  test("stateful sessionization via flatMapGroupsWithState (event-time timeout)") {
    val dir = Files.createTempDirectory("graft-stream-sess").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(plusMin: Long) = new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    Seq((7L, 1L, ts(0)), (7L, 2L, ts(5)), (7L, 3L, ts(120)))
      .toDF("user_id", "event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val sessions = StreamGeocode.sessionizeStream(spark, stream, gapMinutes = 30)
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("stream_sess")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // the in-batch gap jump closes session 1 immediately
      assert(spark.sql("select * from stream_sess").count() === 1)
      // advance the watermark far past session 2's gap deadline: the
      // event-time TIMEOUT must close it without any user-7 data arriving
      Seq((99L, 9L, ts(300))).toDF("user_id", "event_id", "ts")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("select * from stream_sess where user_id = 7")
      .orderBy($"sess_start").collect()
    assert(out.length === 2, out.mkString("; "))
    assert(out(0).getAs[Long]("n_events") === 2)
    assert(out(0).getAs[java.sql.Timestamp]("sess_start") === ts(0))
    assert(out(0).getAs[java.sql.Timestamp]("sess_end") === ts(5))
    assert(out(1).getAs[Long]("n_events") === 1)
    assert(out(1).getAs[java.sql.Timestamp]("sess_start") === ts(120))
  }

  test("sessionization merges a cross-batch out-of-order event by extending sess_start") {
    val dir = Files.createTempDirectory("graft-stream-ooo").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 02:00:00")
    def ts(plusMin: Long) = new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    // batch 1: the session opens at t=10
    Seq((7L, 1L, ts(10))).toDF("user_id", "event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamGeocode.sessionizeStream(spark, stream, gapMinutes = 30)
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("stream_sess_ooo")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      // batch 2: an EARLIER event (t=5), legal within the 1h watermark —
      // must extend the open session's start, not just its end
      Seq((7L, 2L, ts(5))).toDF("user_id", "event_id", "ts")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // batch 3: advance the watermark past the gap deadline to close it
      Seq((99L, 9L, ts(300))).toDF("user_id", "event_id", "ts")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("select * from stream_sess_ooo where user_id = 7").collect()
    assert(out.length === 1, out.mkString("; "))
    assert(out(0).getAs[Long]("n_events") === 2)
    assert(out(0).getAs[java.sql.Timestamp]("sess_start") === ts(5))
    assert(out(0).getAs[java.sql.Timestamp]("sess_end") === ts(10))
  }

  test("stream-stream interval join emits exactly the batch attribution pairs") {
    val dir = Files.createTempDirectory("graft-stream-join").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(plusMin: Long) = new java.sql.Timestamp(t0.getTime + plusMin * 60000L)
    val rows = Seq(
      // user 1: view at 0 -> clicks at 5 (in) and 20 (out of 10-min horizon)
      (1L, 10L, "view", ts(0)), (1L, 11L, "click", ts(5)), (1L, 12L, "click", ts(20)),
      // user 1: second view at 15 -> the t=20 click attributes HERE
      (1L, 13L, "view", ts(15)),
      // user 2: click BEFORE the view never attributes
      (2L, 20L, "click", ts(2)), (2L, 21L, "view", ts(4)),
      // user 3: boundary — click exactly at view + 10 min is IN
      (3L, 30L, "view", ts(30)), (3L, 31L, "click", ts(40)))
    // three files -> three micro-batches under maxFilesPerTrigger=1, so the
    // join state genuinely carries across batches
    rows.grouped(3).zipWithIndex.foreach { case (g, i) =>
      g.toDF("user_id", "event_id", "event_type", "ts")
        .coalesce(1).write.mode(if (i == 0) "overwrite" else "append")
        .parquet(s"$dir/in")
    }
    val schema = spark.read.parquet(s"$dir/in").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val out = StreamGeocode.attributionJoin(
      src.filter($"event_type" === "view"),
      src.filter($"event_type" === "click"),
      horizonMinutes = 10, watermark = "2 hours")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_join")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.sql("select user_id, view_id, click_id from stream_join")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 10L, 11L), (1L, 13L, 12L), (3L, 30L, 31L)))
  }

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

  test("streaming HLL partials max-merge to the batch registers exactly") {
    import graft.sketch.Hll
    import graft.streaming.StreamSketch
    val dir = Files.createTempDirectory("graft-stream-hll").toString
    val data = (0 until 300)
      .map(i => (s"k${i % 3}", s"v${i % (40 * (i % 3 + 1))}"))
      .toDF("k", "v")
    data.repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    StreamSketch.hllPartials(src, col("k"), col("v"),
      s"$dir/sink", s"$dir/ckpt").awaitTermination()
    val partials = spark.read.parquet(s"$dir/sink")
    // genuinely incremental: one partial register table per micro-batch
    assert(partials.select("batch_id").distinct().count() === 4)
    val streamed = StreamSketch.estimateFromPartials(partials).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    val batch = Hll.estimate(Hll.registers(data, col("k"), col("v")))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed === batch)
  }

  test("streaming Count-Min partials cell-sum to the batch sketch exactly") {
    import graft.sketch.CountMin
    import graft.streaming.StreamSketch
    val dir = Files.createTempDirectory("graft-stream-cm").toString
    val data = (0 until 400).map(i => s"item${i % 23}").toDF("it")
    data.repartition(4).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    StreamSketch.cmPartials(src, col("it"), 4, 128,
      s"$dir/sink", s"$dir/ckpt").awaitTermination()
    val partials = spark.read.parquet(s"$dir/sink")
    assert(partials.select("batch_id").distinct().count() === 4)
    // cell-for-cell: merged partials == one-shot whole-stream sketch
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)
    val streamed = CountMin.merge(
      partials.select("cm_row", "cm_col", "cm_cnt")).collect().map(key).toMap
    val oneShot = CountMin.sketch(data, col("it"), 4, 128)
      .collect().map(key).toMap
    assert(streamed === oneShot)
    // and estimates over the merged sketch never undercount
    val cand = Seq("item0", "item22", "absent").toDF("it")
    val est = CountMin.estimate(CountMin.merge(
        partials.select("cm_row", "cm_col", "cm_cnt")),
      cand, col("it"), 4, 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("item0") >= 18L)   // true count ceil(400/23)=18
    assert(est("item22") >= 17L)
  }

  test("SemDedup representative: centroid-closest member wins, ties to id") {
    import graft.sim.SemDedup
    val emb = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.0f, 0.0f)),
      (3L, 0, Seq(0.0f, 1.0f)),
      (10L, 1, Seq(-0.5f, -0.5f)), (11L, 1, Seq(-0.5f, -0.5f))
    ).toDF("vec_id", "label", "embedding")
    val r = SemDedup.representatives(emb, col("vec_id"), col("label"),
        col("embedding"), closeThreshold = 0.8).collect()
      .map(x => x.getInt(0) -> x).toMap
    val g0 = r(0)
    // centroid ~ (2/3, 1/3): members 1,2 at cos ~0.894 beat member 3
    // (~0.447); the 1-vs-2 tie goes to the smaller id
    assert(g0.getAs[Long]("rep_id") === 1L)
    assert(g0.getAs[Long]("n_members") === 3L)
    assert(g0.getAs[Long]("n_close") === 2L)
    assert(math.abs(g0.getAs[Double]("rep_cos6") - 0.894427) < 1e-6)
    // label 1: identical members, cosine exactly 1, smaller id kept
    assert(r(1).getAs[Long]("rep_id") === 10L)
    assert(r(1).getAs[Double]("rep_cos6") === 1.0)
    assert(r(1).getAs[Long]("n_close") === 2L)
  }
}
