package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{BlobStore, GraftTable}

/** Lazy blob handles (reference `take_blobs` + `BlobFile`,
  * `rust/lance/src/dataset/blob.rs:42-168`): descriptors resolve without
  * touching payload bytes, and a ranged read of a multi-MB blob costs the
  * range, not the payload.
  */
class BlobStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val MB = 1 << 20

  private def pat(i: Int, j: Long): Byte = ((i * 31 + j * 7) & 0xFF).toByte

  private def bytesReadLocal(): Long = {
    val s = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.get("file")
    if (s == null) 0L else s.getLong("bytesRead")
  }

  test("pack, take refs, and range-read a 4KB slice without full-payload IO") {
    val t = Files.createTempDirectory("graft_blob_").toString + "/t"
    val rows = (0 until 4).map { i =>
      val b = new Array[Byte](4 * MB)
      var j = 0
      while (j < b.length) { b(j) = pat(i, j); j += 1 }
      (i.toLong, b)
    }
    val packed = BlobStore.packBlobs(
      spark.createDataFrame(rows).toDF("id", "payload").repartition(2), t, "payload")
    GraftTable.write(packed, t, "overwrite")

    // the table's fragment files hold 3-field descriptors, not payloads
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.map(_.sizeBytes).sum < 1L * MB,
      s"fragments must store descriptors (got ${m.fragments.map(_.sizeBytes).sum} bytes)")

    val addr = GraftTable.read(spark, t, withRowAddr = true)
      .filter(col("id") === 2L).select(col(GraftTable.RowAddrCol)).head().getLong(0)
    val refs = BlobStore.takeBlobRefs(spark, t, Seq(addr), "payload")
    assert(refs.size == 1 && refs.head.length == 4L * MB, refs.toString)
    val ref = refs.head

    // 4 KB slice mid-blob: exact bytes, bounded IO
    val off = 1L * MB + 123
    val before = bytesReadLocal()
    val slice = BlobStore.readRange(spark, t, ref, off, 4096)
    val delta = bytesReadLocal() - before
    val exp = Array.tabulate(4096)(k => pat(2, off + k))
    assert(java.util.Arrays.equals(slice, exp), "slice bytes must match the payload span")
    assert(delta < 512L * 1024,
      s"a 4 KB slice must never read the 4 MB payload (read $delta bytes)")

    // full read round-trips; end-of-blob requests clamp
    val full = BlobStore.readBlob(spark, t, ref)
    assert(full.length == 4 * MB)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(full, off.toInt, off.toInt + 4096), exp))
    assert(BlobStore.readRange(spark, t, ref, 4L * MB - 100, 4096).length == 100)
  }

  test("null payloads carry null descriptors; non-binary columns rejected") {
    val t = Files.createTempDirectory("graft_blob_").toString + "/t"
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    GraftTable.write(BlobStore.packBlobs(df, t, "payload"), t, "overwrite")
    val got = GraftTable.read(spark, t).orderBy("id").collect()
    assert(got(0).getStruct(1).getLong(2) == 3L) // length
    assert(got(1).isNullAt(1), "null payload → null descriptor")
    intercept[IllegalArgumentException] {
      BlobStore.packBlobs(df.withColumn("payload", lit("s")), t, "payload")
    }
  }

  test("blob slices resolve through a shallow clone (and a clone of the clone)") {
    val dir = Files.createTempDirectory("graft_blob_clone_").toString
    val t = s"$dir/t"
    val rows = (0 until 3).map { i =>
      (i.toLong, Array.tabulate(8192)(j => pat(i, j.toLong)))
    }
    GraftTable.write(BlobStore.packBlobs(
      spark.createDataFrame(rows).toDF("id", "payload"), t, "payload"),
      t, "overwrite")
    // descriptors are ROW DATA: the clone's metadata-only path rewrite
    // can't touch them, so resolution must fall back to the recorded
    // source root(s)
    for ((src, dst) <- Seq(t -> s"$dir/c1", s"$dir/c1" -> s"$dir/c2")) {
      GraftTable.shallowClone(spark, src, dst)
      val addr = GraftTable.read(spark, dst, withRowAddr = true)
        .filter(col("id") === 1L).select(col(GraftTable.RowAddrCol))
        .head().getLong(0)
      val ref = BlobStore.takeBlobRefs(spark, dst, Seq(addr), "payload").head
      val slice = BlobStore.readRange(spark, dst, ref, 100L, 64)
      assert(slice.length == 64)
      assert(slice.zipWithIndex.forall { case (b, k) => b == pat(1, 100L + k) })
    }
  }

  test("take_blobs by stable id and by dataset index agree with by-address") {
    val t = Files.createTempDirectory("graft_blob_take_").toString + "/t"
    val rows = (0 until 6).map { i =>
      (i.toLong, Array.tabulate(2048)(j => pat(i, j.toLong)))
    }
    GraftTable.write(BlobStore.packBlobs(
      spark.createDataFrame(rows).toDF("id", "payload").repartition(3),
      t, "payload"), t, "overwrite")
    val addr = GraftTable.read(spark, t, withRowAddr = true)
      .filter(col("id") === 4L).select(col(GraftTable.RowAddrCol))
      .head().getLong(0)
    val byAddr = BlobStore.takeBlobRefs(spark, t, Seq(addr), "payload").head
    // stable-id variant: ids == _rowid here (fresh write, contiguous)
    val rid = GraftTable.read(spark, t, withRowId = true)
      .filter(col("id") === 4L).select(col(GraftTable.RowIdCol))
      .head().getLong(0)
    val byId = BlobStore.takeBlobRefsById(spark, t, Seq(rid), "payload").head
    assert(byId == byAddr, s"$byId vs $byAddr")
    // index variant: find id 4's scan offset, resolve metadata-only
    val m = GraftTable.loadManifest(spark, t)
    val all = BlobStore.takeBlobRefsByIndex(spark, t,
      0L until m.fragments.map(_.rows).sum, "payload")
    assert(all.size == 6)
    assert(all.map(_.addr).contains(byAddr.addr))
    intercept[IllegalArgumentException] {
      BlobStore.takeBlobRefsByIndex(spark, t, Seq(99L), "payload")
    }
    // DV tables reject the physical-offset variant
    GraftTable.delete(spark, t, "id = 1")
    intercept[IllegalArgumentException] {
      BlobStore.takeBlobRefsByIndex(spark, t, Seq(0L), "payload")
    }
    // ...but the id variant still resolves and reads correctly
    val slice = BlobStore.readRange(spark, t, byId, 10L, 16)
    assert(slice.zipWithIndex.forall { case (b, k) => b == pat(4, 10L + k) })
  }

  test("root cache invalidates on commit: re-clone at the same path re-resolves") {
    val dir = Files.createTempDirectory("graft_blob_inval_").toString
    def mkSource(path: String, fill: Int): Unit = {
      val rows = Seq((0L, Array.fill[Byte](4096)(fill.toByte)))
      GraftTable.write(BlobStore.packBlobs(
        spark.createDataFrame(rows).toDF("id", "payload"), path, "payload"),
        path, "overwrite")
    }
    mkSource(s"$dir/a", 0x11)
    mkSource(s"$dir/b", 0x22)
    val c = s"$dir/c"
    def sliceAt(path: String): Byte = {
      val addr = GraftTable.read(spark, path, withRowAddr = true)
        .select(col(GraftTable.RowAddrCol)).head().getLong(0)
      val ref = BlobStore.takeBlobRefs(spark, path, Seq(addr), "payload").head
      BlobStore.readRange(spark, path, ref, 0L, 1).head
    }
    GraftTable.shallowClone(spark, s"$dir/a", c)
    assert(sliceAt(c) == 0x11.toByte) // caches c's root chain (→ a)
    // drop + re-clone the SAME path from a different source: the cached
    // chain is stale the moment the new clone's commit lands
    val fs = new org.apache.hadoop.fs.Path(c)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(c), true)
    GraftTable.shallowClone(spark, s"$dir/b", c)
    assert(sliceAt(c) == 0x22.toByte,
      "re-clone at the same path must serve the NEW source's bytes")
  }
}
