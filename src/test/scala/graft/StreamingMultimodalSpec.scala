package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.operators.Multimodal
import graft.streaming.GraftStreaming

class StreamingMultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_st_").toString + "/t"

  test("readStream.format(graft): version-delta source streams appended rows") {
    val t = tmp()
    GraftTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val stream = spark.readStream.format("graft").load(t)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("graft_src_mem")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_mem").count() == 2)
      // appended rows arrive as the next micro-batch; the DV-only delete
      // commit below advances the version but adds no fragments, so it
      // contributes zero rows (append-feed semantics)
      GraftTable.write(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), t, "append")
      GraftTable.delete(spark, t, "id = 1")
      q.processAllAvailable()
      val got = spark.table("graft_src_mem").select("id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L, 4L))
    } finally q.stop()
    // startingVersion skips the initial snapshot
    val v1 = 1L
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", v1.toString).load(t)
      .writeStream.format("memory").queryName("graft_src_mem2")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .start()
    try {
      q2.processAllAvailable()
      val got2 = spark.table("graft_src_mem2").select("id").as[Long].collect().toSet
      assert(got2 == Set(3L, 4L)) // only rows appended after version 1
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger bounds each micro-batch against a backlog") {
    val t = tmp()
    // 6-version backlog before the stream starts (create + 5 appends)
    GraftTable.write(Seq((0L, "s")).toDF("id", "v"), t)
    for (i <- 1 to 5)
      GraftTable.write(Seq((i.toLong, "s")).toDF("id", "v"), t, "append")
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "2").load(t)
      .writeStream.format("memory").queryName("graft_rate_mem")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .start()
    try {
      q.processAllAvailable()
      // complete, exactly-once coverage of the backlog...
      val got = spark.table("graft_rate_mem").select("id").as[Long].collect().toSeq
      assert(got.sorted == (0L to 5L), got.toString)
      // ...but never in one gulp: 6 versions at ≤2 per trigger = ≥3 batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"backlog must be admitted over ≥3 micro-batches, got $batches")
    } finally q.stop()
  }

  test("writeStream.format(graft): first-class sink, append-only, replay-proof") {
    val t = tmp()
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft").option("path", t)
      .option("queryId", "dsv2q")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .outputMode("append")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val back = GraftTable.read(spark, t)
    assert(back.count() == 3)
    assert(back.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // each micro-batch committed atomically with its batch id high-water mark
    val m = GraftTable.loadManifest(spark, t)
    assert(m.config.get("streaming.dsv2q.lastBatchId").contains("1"), m.config.toString)
    // a replayed batch id is a no-op (restart-after-commit crash semantics)
    GraftStreaming.commitBatch(t, Seq((9L, "dup")).toDF("id", "v"), 1L, "dsv2q")
    assert(GraftTable.read(spark, t).count() == 3)
    // and the next batch id appends normally
    GraftStreaming.commitBatch(t, Seq((4L, "d")).toDF("id", "v"), 2L, "dsv2q")
    assert(GraftTable.read(spark, t).count() == 4)
  }

  test("plain sinks require explicit queryId; two streams at batch 0 never collide (VERDICT r13 #4)") {
    val t = tmp()
    GraftTable.write(Seq((0L, "seed")).toDF("id", "v"), t, "overwrite")
    // empty id refused — the walBatchSink contract, now on the plain sinks too
    intercept[IllegalArgumentException] {
      GraftStreaming.commitBatch(t, Seq((1L, "a")).toDF("id", "v"), 0L, "")
    }
    // the exact collision class the shared "default" id created: two
    // logical streams each committing batch 0 into one table — with one id
    // the second stream's batch is silently dropped as a replay; with
    // distinct ids both land and each keeps its own high-water mark
    GraftStreaming.commitBatch(t, Seq((1L, "a")).toDF("id", "v"), 0L, "sA")
    GraftStreaming.commitBatch(t, Seq((2L, "b")).toDF("id", "v"), 0L, "sB")
    assert(GraftTable.read(spark, t).count() == 3)
    val cfg = GraftTable.loadManifest(spark, t).config
    assert(cfg.get("streaming.sA.lastBatchId").contains("0") &&
      cfg.get("streaming.sB.lastBatchId").contains("0"), cfg.toString)
    // replay semantics stay per-stream: sA's batch 0 again is a no-op
    GraftStreaming.commitBatch(t, Seq((9L, "dup")).toDF("id", "v"), 0L, "sA")
    assert(GraftTable.read(spark, t).count() == 3)
  }

  test("DSv2 sink derives a stable queryId from the checkpoint when none is given") {
    val t = tmp()
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft").option("path", t)
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .outputMode("append")
      .start()
    try {
      mem.addData((1L, "a"))
      q.processAllAvailable()
    } finally q.stop()
    val keys = GraftTable.loadManifest(spark, t).config.keySet
      .filter(_.startsWith("streaming."))
    // one derived per-checkpoint id, not the old shared "default"
    assert(keys.size == 1 && keys.head.startsWith("streaming.cp-"), keys.toString)
  }

  test("streaming sink: micro-batches become append commits, exactly once") {
    val t = tmp()
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "payload")
      .writeStream
      .foreachBatch(GraftStreaming.foreachBatchSink(t, "q1"))
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      assert(GraftTable.read(spark, t).count() == 3)
      assert(GraftTable.versions(spark, t).length == 2)
      // replay batch 0 manually -> skipped, no duplicates
      GraftStreaming.foreachBatchSink(t, "q1")(Seq((1L, "a")).toDF("id", "payload"), 0L)
      assert(GraftTable.read(spark, t).count() == 3)
    } finally q.stop()
  }

  test("dedupStream drops duplicates within and across micro-batches") {
    val t = tmp()
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val deduped = GraftStreaming.dedupStream[String, (Long, String)](
      mem.toDS(), (r: (Long, String)) => r._2)
    val q = deduped.toDF("id", "text")
      .writeStream
      .foreachBatch(GraftStreaming.foreachBatchSink(t, "qdd"))
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .start()
    try {
      mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha")) // in-batch dup
      q.processAllAvailable()
      mem.addData((4L, "beta"), (5L, "gamma")) // cross-batch dup
      q.processAllAvailable()
      val rows = GraftTable.read(spark, t).orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(rows.map(_._2) == Seq("alpha", "beta", "gamma"))
      assert(rows.map(_._1) == Seq(1L, 2L, 5L)) // first occurrence kept
    } finally q.stop()
  }

  test("watermark + tumbling window aggregation streams into a graft table") {
    val t = tmp()
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val windowed = mem.toDF().toDF("ts", "kind", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"kind")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"window.start".as("win_start"), $"kind", $"n", $"total")
    val q = windowed.writeStream
      .outputMode("append")
      .foreachBatch(GraftStreaming.foreachBatchSink(t, "winq"))
      .option("checkpointLocation", Files.createTempDirectory("ckpt_").toString)
      .start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      mem.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(7), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the earlier windows
      mem.addData((ts(40), "click", 9.0))
      q.processAllAvailable()
      val out = GraftTable.read(spark, t)
        .select("win_start", "kind", "n", "total").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(out.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(out.contains(("2024-01-01 10:05:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("readChanges returns only rows appended in the version range") {
    val t = tmp()
    GraftTable.write(Seq((1L, "x")).toDF("id", "v"), t)
    GraftTable.write(Seq((2L, "y"), (3L, "z")).toDF("id", "v"), t, "append")
    GraftTable.write(Seq((4L, "w")).toDF("id", "v"), t, "append")
    val delta = GraftStreaming.readChanges(spark, t, fromVersion = 1L, toVersion = 3L)
      .select("id").as[Long].collect().toSet
    assert(delta == Set(2L, 3L, 4L))
    val one = GraftStreaming.readChanges(spark, t, 2L, 3L)
      .select("id").as[Long].collect().toSet
    assert(one == Set(4L))
  }

  test("multimodal: real PNG decode round-trips dimensions + pixel features") {
    // gray 80 fixture and a half-black/half-white fixture (PNG is lossless)
    val gray = Multimodal.encodePng(20, 10, (_, _) => 0x505050)
    val split = Multimodal.encodePng(16, 16, (x, _) => if (x < 8) 0x000000 else 0xffffff)
    val media = Seq(
      Multimodal.MediaRow(1L, gray),
      Multimodal.MediaRow(2L, split),
      Multimodal.MediaRow(3L, Array[Byte](1, 2, 3, 4, 5)) // not an image → dropped
    ).toDS().repartition(2)
    val out = Multimodal.decodeImages(media).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L)) // corrupt payload dropped
    assert(out(0).width == 20 && out(0).height == 10 && out(0).channels == 3)
    // constant-gray image: every grid cell's mean luminance is exactly 80/255
    assert(out(0).features.length == 16)
    assert(out(0).features.forall(f => math.abs(f - 80f / 255f) < 1e-4))
    // left half black, right half white: col-0/1 cells 0.0, col-2/3 cells 1.0
    val f2 = out(1).features
    for (row <- 0 until 4) {
      assert(math.abs(f2(row * 4)) < 1e-4 && math.abs(f2(row * 4 + 1)) < 1e-4)
      assert(math.abs(f2(row * 4 + 2) - 1f) < 1e-4 && math.abs(f2(row * 4 + 3) - 1f) < 1e-4)
    }
    val again = Multimodal.decodeImages(media).collect().sortBy(_.id)
    assert(out.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("multimodal: real WAV decode — rms, envelope, corrupt-row drop") {
    // constant +9000 clip, a half-silent clip, and garbage bytes
    val flat = Multimodal.encodeWav(8000, Array.fill(400)(9000.toShort))
    val halves = Multimodal.encodeWav(16000,
      Array.fill(200)(12000.toShort) ++ Array.fill(200)(0.toShort))
    val media = Seq(
      Multimodal.MediaRow(1L, flat),
      Multimodal.MediaRow(2L, halves),
      Multimodal.MediaRow(3L, Array[Byte](9, 9, 9, 9)) // not audio → dropped
    ).toDS().repartition(2)
    val out = Multimodal.decodeAudio(media, bins = 4).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L))
    assert(out(0).sampleRate == 8000 && out(0).channels == 1 && out(0).nSamples == 400L)
    // constant signal: rms and every envelope bin are exactly amp/32768
    assert(math.abs(out(0).rms - 9000f / 32768f) < 1e-4, out(0).rms.toString)
    assert(out(0).envelope.forall(e => math.abs(e - 9000f / 32768f) < 1e-4))
    // half-silent: energy in the first two bins only
    val env = out(1).envelope
    assert(out(1).nSamples == 400L && out(1).sampleRate == 16000)
    assert(math.abs(env(0) - 12000f / 32768f) < 1e-4 && math.abs(env(1) - 12000f / 32768f) < 1e-4)
    assert(math.abs(env(2)) < 1e-4 && math.abs(env(3)) < 1e-4)
    assert(math.abs(out(1).rms - 12000f / 32768f / math.sqrt(2).toFloat) < 1e-3)
  }

  test("multimodal: real MJPEG-in-AVI decode — frames, dims, luminance, drops") {
    // three uniform-gray frames at distinct levels
    val levels = Seq(40, 128, 220)
    val frames = levels.map(v =>
      Multimodal.encodeJpeg(24, 18, (_, _) => (v << 16) | (v << 8) | v))
    val avi = Multimodal.encodeAviMjpeg(frames, 24, 18)
    val media = Seq(
      Multimodal.MediaRow(1L, avi),
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3, 4)), // not RIFF → dropped
      Multimodal.MediaRow(3L, java.util.Arrays.copyOf(avi, avi.length / 2)) // truncated
    ).toDS().repartition(2)
    val out = Multimodal.decodeVideoFrames(media).collect()
      .sortBy(f => (f.id, f.frameIdx))
    val full = out.filter(_.id == 1L)
    assert(full.length == 3, out.map(f => (f.id, f.frameIdx)).toSeq.toString)
    assert(full.map(_.frameIdx).toSeq == Seq(0, 1, 2))
    assert(full.forall(f => f.width == 24 && f.height == 18))
    // uniform-gray frames survive the lossy codec within JPEG tolerance
    full.zip(levels).foreach { case (f, v) =>
      f.features.foreach(x => assert(math.abs(x - v / 255f) < 0.02,
        s"level $v decoded to $x"))
    }
    assert(!out.exists(_.id == 2L)) // non-AVI dropped row-wise
    // the truncated copy yields at most a prefix of frames, never garbage
    val trunc = out.filter(_.id == 3L)
    assert(trunc.length <= 3 && trunc.forall(f => f.width == 24 && f.height == 18))
    // maxFrames caps the fan-out
    assert(Multimodal.decodeVideoFrames(media, maxFrames = 1).collect()
      .count(_.id == 1L) == 1)
  }

  test("multimodal: frame sampling fans out byte ranges") {
    val media = Seq(Multimodal.MediaRow(1L, (0 until 100).map(_.toByte).toArray)).toDS()
    val frames = Multimodal.sampleFrames(media, 4).collect().sortBy(_.frameIdx)
    assert(frames.length == 4)
    assert(frames.map(_.payload.length).sum == 100)
    assert(frames(0).payload.head == 0.toByte && frames(3).payload.head == 75.toByte)
  }

  test("multimodal: bilinear resize emits fixed-size RGB with exact colors") {
    import graft.operators.Multimodal
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodePng(64, 32, (_, _) => 0x204060)),
      Multimodal.MediaRow(2L, Multimodal.encodePng(5, 5, (_, _) => 0x204060)),
      Multimodal.MediaRow(3L, Array.empty[Byte]) // undecodable → dropped
    ).toDS()
    val out = Multimodal.resizeImages(media, 8, 8).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.payload.length == 8 * 8 * 3 && r.width == 8 && r.height == 8))
    // constant-color source → every resampled pixel is exactly the source color
    for (r <- out; p <- 0 until 64) {
      assert(r.payload(p * 3) == 0x20.toByte && r.payload(p * 3 + 1) == 0x40.toByte &&
        r.payload(p * 3 + 2) == 0x60.toByte)
    }
    // gradient: downsample of a horizontal ramp stays monotonically increasing
    val ramp = Seq(Multimodal.MediaRow(9L,
      Multimodal.encodePng(256, 4, (x, _) => x << 16))).toDS()
    val rr = Multimodal.resizeImages(ramp, 8, 2).collect().head
    val reds = (0 until 8).map(x => rr.payload(x * 3) & 0xff)
    assert(reds == reds.sorted && reds.head < reds.last, reds)
  }

  test("multimodal: payload meta + embedding feature flows into Knn") {
    val imgA = Multimodal.encodePng(8, 8, (_, _) => 0x101010)
    val imgB = Multimodal.encodePng(8, 8, (_, _) => 0xe0e0e0)
    val media = Seq(
      Multimodal.MediaRow(1L, imgA),
      Multimodal.MediaRow(2L, imgA),
      Multimodal.MediaRow(3L, imgB)
    ).toDS()
    val meta = Multimodal.withPayloadMeta(media.toDF(), "content")
    val hashes = meta.select("content_hash").as[Long].collect()
    assert(hashes(0) == hashes(1) && hashes(0) != hashes(2)) // dedup-by-content works
    val decoded = Multimodal.decodeImages(media)
    val knn = graft.operators.Knn.flatSearch(decoded.toDF(), "features",
      decoded.filter($"id" === 1L).head().features, 2, "l2", Seq(col("id")))
    assert(knn.select("id").as[Long].collect().toSeq == Seq(1L, 2L)) // identical content nearest
  }
}
