package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{GraftTable, WalIngest}

/** Commit-batched WAL ingest (the MemWAL capability): appends with no
  * manifest commit, one CAS per flush, owner fencing, crash-safe resume. */
class WalIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_wal_").toString + "/t"

  private def seed(t: String): Unit =
    GraftTable.write((0L until 100L).toDF("id")
      .withColumn("v", col("id") * 2).coalesce(1), t, "overwrite")

  test("append N batches = zero commits; flush = ONE commit with all rows") {
    val t = tmp(); seed(t)
    val v0 = GraftTable.loadManifest(spark, t).version
    WalIngest.open(spark, t, "ingest", "w1")
    for (b <- 0 until 5)
      WalIngest.append(spark, t, "ingest", "w1",
        (100L + b * 10 until 110L + b * 10).toDF("id").withColumn("v", col("id") * 2)
          .coalesce(1))
    // no manifest movement during appends
    assert(GraftTable.loadManifest(spark, t).version == v0)
    // un-flushed rows visible through the WAL union
    assert(WalIngest.readWithWal(spark, t, Seq("ingest")).count() == 150)
    assert(GraftTable.read(spark, t).count() == 100)
    val flushed = WalIngest.flush(spark, t, "ingest", "w1")
    assert(flushed == 50L)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.version == v0 + 1, "five appends must fold into ONE commit")
    assert(m.operation == "import_files")
    assert(GraftTable.read(spark, t).count() == 150)
    assert(GraftTable.read(spark, t).agg(sum("v")).head().getLong(0)
      == (0L until 150L).map(_ * 2).sum)
    // flushed generation is terminal for appends
    intercept[Exception] {
      WalIngest.append(spark, t, "ingest", "w1", Seq((1L, 1L)).toDF("id", "v"))
    }
  }

  test("owner fencing: open is exclusive; append/seal/flush verify owner") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "r", "alice")
    // a second open (any owner) is refused while Open
    intercept[IllegalStateException] { WalIngest.open(spark, t, "r", "bob") }
    intercept[IllegalArgumentException] {
      WalIngest.append(spark, t, "r", "bob", Seq((1L, 2L)).toDF("id", "v"))
    }
    WalIngest.append(spark, t, "r", "alice", Seq((200L, 400L)).toDF("id", "v"))
    intercept[IllegalArgumentException] { WalIngest.seal(spark, t, "r", "bob") }
    WalIngest.seal(spark, t, "r", "alice")
    // sealed: appends stop, flush (by owner) proceeds
    intercept[Exception] {
      WalIngest.append(spark, t, "r", "alice", Seq((1L, 2L)).toDF("id", "v"))
    }
    intercept[IllegalArgumentException] { WalIngest.flush(spark, t, "r", "bob") }
    assert(WalIngest.flush(spark, t, "r", "alice") == 1L)
    // next generation opens after flush; generations advance
    assert(WalIngest.open(spark, t, "r", "bob") == 1L)
    val gens = WalIngest.generations(spark, t, "r")
    assert(gens.map(g => (g.generation, g.state)) ==
      Seq((0L, "Flushed"), (1L, "Open")))
  }

  test("schema mismatch fails at append, not at flush") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "r2", "w")
    intercept[IllegalArgumentException] {
      WalIngest.append(spark, t, "r2", "w", Seq((1L, "x")).toDF("id", "name"))
    }
  }

  test("crashed flush resumes without duplicates") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "cr", "w")
    WalIngest.append(spark, t, "cr", "w",
      (100L until 120L).toDF("id").withColumn("v", col("id") * 2).coalesce(1))
    // simulate the crash window: commitFiles frag-renamed + committed, but
    // the state file never advanced to Flushed (process died) — OR renamed
    // but never committed. Model the second (harder) case: hand-rename a
    // batch to frag naming without committing.
    val genDir = new Path(s"$t/_wal/cr/gen-0")
    val fs = genDir.getFileSystem(spark.sessionState.newHadoopConf())
    val batch = fs.listStatus(genDir)
      .map(_.getPath).filter(p => p.getName.startsWith("batch-") ||
        p.getName.startsWith("adhoc-")).head
    assert(fs.rename(batch, new Path(genDir, "frag-99999.parquet")))
    // flush must sweep BOTH the frag-renamed orphan and remaining batches
    val flushed = WalIngest.flush(spark, t, "cr", "w")
    assert(flushed == 20L)
    assert(GraftTable.read(spark, t).count() == 120)
    // a second flush re-checks the Flushed generation for stragglers —
    // finds none, imports nothing (the idempotent-converge contract)
    assert(WalIngest.flush(spark, t, "cr", "w") == 0L)
    assert(GraftTable.read(spark, t).count() == 120)
    GraftTable.validate(spark, t)
  }

  test("compaction moves flushed fragments out of the WAL; cleanupMerged reclaims") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "m", "w")
    WalIngest.append(spark, t, "m", "w",
      (100L until 150L).toDF("id").withColumn("v", col("id") * 2).coalesce(1))
    WalIngest.flush(spark, t, "m", "w")
    // still live in the WAL dir (zero-copy flush): not yet merged
    assert(WalIngest.cleanupMerged(spark, t, "m") == 0)
    assert(WalIngest.generations(spark, t, "m").head.state == "Flushed")
    GraftTable.compactFiles(spark, t, targetRows = 1 << 20)
    // the window between compaction and cleanup: gen-0's frag copies are
    // now dead (unreferenced) — a flush of a LATER generation's straggler
    // sweep must NOT re-import them (that would duplicate every row)
    WalIngest.open(spark, t, "m", "w")
    WalIngest.append(spark, t, "m", "w", Seq((999L, 0L)).toDF("id", "v"))
    assert(WalIngest.flush(spark, t, "m", "w") == 1L,
      "only the new batch may flush — dead gen-0 copies are not imports")
    assert(GraftTable.read(spark, t).count() == 151)
    assert(WalIngest.cleanupMerged(spark, t, "m") == 1)
    // the merged generation's markers compact into the high water: it
    // leaves the listing entirely, the Flushed successor remains
    assert(WalIngest.generations(spark, t, "m").map(_.generation) == Seq(1L))
    assert(!new java.io.File(s"$t/_wal/m/gen-0").exists)
    assert(GraftTable.read(spark, t).count() == 151)
    // ownership is enforced even when only Flushed generations remain
    intercept[Exception] { WalIngest.flush(spark, t, "m", "intruder") }
  }

  test("a table OVERWRITE fences un-flushed generations: flush refuses, reads skip, discard clears") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "f", "w")
    WalIngest.append(spark, t, "f", "w",
      (100L until 120L).toDF("id").withColumn("v", col("id") * 2).coalesce(1))
    // the truncation the WAL rows must NOT survive
    GraftTable.write((0L until 10L).toDF("id")
      .withColumn("v", lit(0L)).coalesce(1), t, "overwrite")
    // flushing would resurrect pre-truncation rows — refused
    val e = intercept[IllegalStateException] { WalIngest.flush(spark, t, "f", "w") }
    assert(e.getMessage.contains("OVERWRITTEN"), e.getMessage)
    // reads skip the fenced tail: only the overwritten contents serve
    assert(WalIngest.readWithWal(spark, t, Seq("f")).count() == 10)
    // discard is the explicit escape hatch; the region then reopens
    WalIngest.discard(spark, t, "f", "w")
    assert(WalIngest.generations(spark, t, "f").head.state == "Merged")
    assert(WalIngest.open(spark, t, "f", "w") == 1L)
    WalIngest.append(spark, t, "f", "w", Seq((11L, 22L)).toDF("id", "v"))
    assert(WalIngest.flush(spark, t, "f", "w") == 1L)
    assert(GraftTable.read(spark, t).count() == 11)
  }

  test("state transitions never lose the generation: markers only accrete") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "s", "w")
    WalIngest.seal(spark, t, "s", "w")
    // every prior marker still exists alongside the current one
    val dir = new java.io.File(s"$t/_wal/s")
    val markers = dir.listFiles().map(_.getName).filter(_.endsWith(".json")).sorted
    assert(markers.toSeq == Seq("gen-0.s0.json", "gen-0.s1.json"), markers.toSeq)
    WalIngest.flush(spark, t, "s", "w")
    val after = dir.listFiles().map(_.getName).filter(_.endsWith(".json")).sorted
    assert(after.toSeq == Seq("gen-0.s0.json", "gen-0.s1.json", "gen-0.s2.json"))
    // generation numbers never recycle even across the full lifecycle
    assert(WalIngest.open(spark, t, "s", "w") == 1L)
  }

  test("walBatchSink: commit-free micro-batches, one commit per flushEvery, replay-proof") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.GraftStreaming
    val t = tmp()
    GraftTable.write(Seq.empty[(Long, Long)].toDF("id", "v").coalesce(1), t, "overwrite")
    val v0 = GraftTable.loadManifest(spark, t).version
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", Files.createTempDirectory("walck_").toString)
      .foreachBatch(GraftStreaming.walBatchSink(t, "stream", flushEvery = 3, queryId = "wq"))
      .start()
    try {
      for (b <- 0 until 6) { mem.addData((b.toLong, b.toLong * 2)); q.processAllAvailable() }
    } finally q.stop()
    // 6 micro-batches, flushEvery=3 → exactly TWO flush commits
    val m = GraftTable.loadManifest(spark, t)
    assert(m.version == v0 + 2, s"want 2 flush commits, got v${m.version} from v$v0")
    assert(GraftTable.read(spark, t).count() == 6)
    // a replayed micro-batch (same queryId+batchId tag) is a no-op
    val sink = GraftStreaming.walBatchSink(t, "stream", flushEvery = 3, queryId = "wq")
    sink(Seq((0L, 0L)).toDF("id", "v"), 0L)
    assert(GraftTable.read(spark, t).count() == 6)
    assert(WalIngest.readWithWal(spark, t, Seq("stream")).count() == 6,
      "the replay must not even reach the WAL tail")
    // new batches keep flowing into the auto-reopened generation
    sink(Seq((100L, 1L)).toDF("id", "v"), 6L)
    assert(WalIngest.readWithWal(spark, t, Seq("stream")).count() == 7)
    assert(GraftTable.read(spark, t).count() == 6) // un-flushed until the boundary
  }

  test("chaos: concurrent writers and mid-stream flushes never lose or duplicate a row") {
    val t = tmp(); seed(t)
    val writers = 4
    val batchesPerWriter = 10
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers + 1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def task(body: => Unit) = pool.submit(new Runnable {
      def run(): Unit = {
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
        try body catch { case e: Throwable => failures.add(e) }
      }
    })
    // each writer owns its region; a mid-stream flusher seals generations
    // under the writers' feet — they must reopen and carry on (the same
    // dance the SQL route's retry loop performs)
    val futs = (0 until writers).map { w =>
      task {
        val region = s"w$w"
        WalIngest.open(spark, t, region, region)
        for (b <- 0 until batchesPerWriter) {
          val df = Seq((1000L + w * 100 + b, w.toLong)).toDF("id", "v")
          var ok = false
          while (!ok) {
            try { WalIngest.append(spark, t, region, region, df); ok = true }
            catch {
              case e: IllegalArgumentException
                  if e.getMessage != null && e.getMessage.contains("need Open") =>
                try WalIngest.open(spark, t, region, region)
                catch { case _: IllegalStateException => } // racer reopened
            }
          }
        }
      }
    }
    val flusher = task {
      for (_ <- 0 until 6) {
        Thread.sleep(150)
        for (w <- 0 until writers) {
          try WalIngest.flush(spark, t, s"w$w", s"w$w")
          catch { case _: IllegalStateException => } // nothing open yet — fine
        }
      }
    }
    (futs :+ flusher).foreach(_.get())
    pool.shutdown()
    assert(failures.isEmpty, failures.toArray.mkString("\n"))
    // drain whatever is still un-flushed
    for (w <- 0 until writers) {
      try WalIngest.flush(spark, t, s"w$w", s"w$w")
      catch { case _: IllegalStateException => }
    }
    // exact accounting: the seed + every appended row exactly once
    val got = GraftTable.read(spark, t).select("id").as[Long].collect().sorted
    val want = ((0L until 100L) ++ (for {
      w <- 0 until writers; b <- 0 until batchesPerWriter
    } yield 1000L + w * 100 + b)).sorted
    assert(got.toSeq == want.toSeq,
      s"got ${got.length} rows, want ${want.length}")
    GraftTable.validate(spark, t)
  }

  test("cleanup retains a live generation's OVERWRITE fence: flush still refuses") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "fr", "w")
    WalIngest.append(spark, t, "fr", "w",
      (100L until 110L).toDF("id").withColumn("v", col("id") * 2).coalesce(1))
    // truncation the WAL rows must not survive, then enough commits to
    // push the overwrite manifest out of any keepLast window
    GraftTable.write((0L until 10L).toDF("id")
      .withColumn("v", lit(0L)).coalesce(1), t, "overwrite")
    val fenceV = GraftTable.latestVersion(spark, t).get
    for (i <- 0 until 4)
      GraftTable.write(Seq((50L + i, 0L)).toDF("id", "v"), t, "append")
    GraftTable.cleanupOldVersions(spark, t, keepLast = 2)
    // the fence manifest survived the cleanup (WAL retention) ...
    assert(GraftTable.versions(spark, t).contains(fenceV),
      "cleanup dropped the overwrite fence of a live WAL generation")
    // ... so the flush still sees the truncation and refuses
    val e = intercept[IllegalStateException] { WalIngest.flush(spark, t, "fr", "w") }
    assert(e.getMessage.contains("OVERWRITTEN"), e.getMessage)
    assert(GraftTable.read(spark, t).count() == 14)
    // discarding the generation releases the retention
    WalIngest.discard(spark, t, "fr", "w")
    GraftTable.cleanupOldVersions(spark, t, keepLast = 2)
    assert(!GraftTable.versions(spark, t).contains(fenceV))
  }

  test("Sealed re-flush after crash+compaction: dead copies are never re-imported") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "dc", "w")
    WalIngest.append(spark, t, "dc", "w",
      (100L until 120L).toDF("id").withColumn("v", col("id") * 2).coalesce(1))
    WalIngest.seal(spark, t, "dc", "w")
    // crash window: drain's commitFiles landed, but the process died
    // before the .s2 marker — mimic by committing the batch files by hand
    val genDir = new Path(s"$t/_wal/dc/gen-0")
    val fs = genDir.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(genDir).filter(_.isDirectory).flatMap(d =>
      fs.listStatus(d.getPath)).map(_.getPath.toString)
      .filter(_.endsWith(".parquet")).toSeq
    GraftTable.commitFiles(spark, t, parts, "append")
    assert(GraftTable.read(spark, t).count() == 120)
    assert(WalIngest.generations(spark, t, "dc").head.state == "Sealed")
    // a compaction now supersedes the committed fragments: the gen dir
    // holds frag-named DEAD copies whose rows live on in data/
    GraftTable.compactFiles(spark, t, targetRows = 1 << 20)
    // the retry flush must import NOTHING — re-importing the dead copies
    // would duplicate every row of the generation
    assert(WalIngest.flush(spark, t, "dc", "w") == 0L,
      "retry flush re-imported compaction-superseded dead copies")
    assert(GraftTable.read(spark, t).count() == 120)
    assert(WalIngest.generations(spark, t, "dc").head.state == "Flushed")
    assert(GraftTable.validate(spark, t).isEmpty)
    // while a crashed-pre-COMMIT rename (never referenced) still imports:
    // see "crashed flush resumes without duplicates"
  }

  test("untagged appends leave no permanent markers; custom tags age out") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "mk", "w")
    WalIngest.append(spark, t, "mk", "w", Seq((500L, 0L)).toDF("id", "v"))
    WalIngest.append(spark, t, "mk", "w", Seq((501L, 0L)).toDF("id", "v"),
      batchTag = Some("mytag"))
    val dir = new java.io.File(s"$t/_wal/mk")
    val genDir = new java.io.File(s"$t/_wal/mk/gen-0")
    // taggedness is recorded in the batch dir name
    assert(genDir.listFiles().count(_.getName.startsWith("adhoc-")) == 1)
    assert(genDir.listFiles().count(_.getName.startsWith("batch-")) == 1)
    WalIngest.flush(spark, t, "mk", "w")
    // flush stamped no marker for the adhoc batch — only the tagged one
    assert(dir.listFiles().map(_.getName).filter(_.startsWith("done-")).toSeq
      == Seq("done-mytag"))
    // custom (non-sink-shaped) markers expire by age
    val mk = new Path(s"$t/_wal/mk/done-mytag")
    val fs = mk.getFileSystem(spark.sessionState.newHadoopConf())
    val old = System.currentTimeMillis() - 8L * 24 * 3600 * 1000
    fs.setTimes(mk, old, old)
    WalIngest.open(spark, t, "mk", "w")
    WalIngest.append(spark, t, "mk", "w", Seq((502L, 0L)).toDF("id", "v"))
    WalIngest.flush(spark, t, "mk", "w")
    assert(!dir.listFiles().map(_.getName).exists(_ == "done-mytag"),
      "aged-out custom marker survived the prune")
    assert(GraftTable.read(spark, t).count() == 103)
  }

  test("merged generations compact to a high water: listings stay O(live)") {
    val t = tmp(); seed(t)
    for (g <- 0 until 3) {
      WalIngest.open(spark, t, "hw", "w")
      WalIngest.append(spark, t, "hw", "w",
        Seq((900L + g, 0L)).toDF("id", "v"))
      WalIngest.flush(spark, t, "hw", "w")
      GraftTable.compactFiles(spark, t, targetRows = 1 << 20)
      assert(WalIngest.cleanupMerged(spark, t, "hw") == 1)
    }
    val names = new java.io.File(s"$t/_wal/hw").listFiles().map(_.getName)
    assert(names.contains("hw-2.json"), names.toSeq)
    assert(!names.exists(_.startsWith("gen-")),
      s"markers of compacted generations linger: ${names.toSeq}")
    // generation numbers still never recycle
    assert(WalIngest.open(spark, t, "hw", "w") == 3L)
    WalIngest.append(spark, t, "hw", "w", Seq((999L, 0L)).toDF("id", "v"))
    assert(WalIngest.flush(spark, t, "hw", "w") == 1L)
    assert(GraftTable.read(spark, t).count() == 104)
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("torn append is invisible until its ready marker; retry lands it once") {
    val t = tmp(); seed(t)
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    WalIngest.open(spark, t, "rm", "w")
    WalIngest.append(spark, t, "rm", "w", Seq((200L, 0L)).toDF("id", "v"))
    // simulate a crashed append: part files durable, ready marker never
    // committed (delete it plus the replay marker the append left)
    WalIngest.append(spark, t, "rm", "w", Seq((300L, 0L)).toDF("id", "v"),
      batchTag = Some("torn"))
    fs.delete(new Path(s"$t/_wal/rm/gen-0/batch-torn/_BATCH_READY"), false)
    fs.delete(new Path(s"$t/_wal/rm/done-torn"), false)
    // unready = invisible: reads, batch count
    assert(WalIngest.readWithWal(spark, t, Seq("rm")).count() == 101)
    assert(WalIngest.batchCount(spark, t, "rm", 0) == 1)
    // the retry overwrites the torn files and lands exactly once
    assert(WalIngest.append(spark, t, "rm", "w", Seq((300L, 0L)).toDF("id", "v"),
      batchTag = Some("torn")) == 1)
    assert(WalIngest.readWithWal(spark, t, Seq("rm")).count() == 102)
    assert(WalIngest.flush(spark, t, "rm", "w") == 2L)
    assert(GraftTable.read(spark, t).count() == 102)
    // a generation holding ONLY a torn dir still flushes empty-handed and
    // is reclaimable after compaction (the torn debris never strands it)
    WalIngest.open(spark, t, "rm", "w")
    WalIngest.append(spark, t, "rm", "w", Seq((400L, 0L)).toDF("id", "v"),
      batchTag = Some("t2"))
    fs.delete(new Path(s"$t/_wal/rm/gen-1/batch-t2/_BATCH_READY"), false)
    fs.delete(new Path(s"$t/_wal/rm/done-t2"), false)
    assert(WalIngest.flush(spark, t, "rm", "w") == 0L)
    GraftTable.compactFiles(spark, t, targetRows = 1 << 20)
    assert(WalIngest.cleanupMerged(spark, t, "rm") == 2)
    assert(!new java.io.File(s"$t/_wal/rm/gen-1").exists,
      "torn debris must not strand a merged generation")
    assert(GraftTable.read(spark, t).count() == 102)
    assert(GraftTable.validate(spark, t).isEmpty)
  }

  test("multiple regions are independent; readWithWal unions all requested") {
    val t = tmp(); seed(t)
    WalIngest.open(spark, t, "a", "w1")
    WalIngest.open(spark, t, "b", "w2")
    WalIngest.append(spark, t, "a", "w1", Seq((500L, 0L)).toDF("id", "v"))
    WalIngest.append(spark, t, "b", "w2", Seq((501L, 0L)).toDF("id", "v"))
    assert(WalIngest.readWithWal(spark, t, Seq("a")).count() == 101)
    assert(WalIngest.readWithWal(spark, t, Seq("a", "b")).count() == 102)
    WalIngest.flush(spark, t, "a", "w1")
    assert(GraftTable.read(spark, t).count() == 101)
    assert(WalIngest.readWithWal(spark, t, Seq("a", "b")).count() == 102)
  }
}
