package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Round-2 format features: no-rewrite add_columns (supplemental column
  * files) and debt-proportional partial compaction. */
class SchemaEvolutionCompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_evo_").toString + "/t"

  private def people = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0),
    (4L, "dave", 40.0), (5L, "erin", 50.0)
  ).toDF("id", "name", "score")

  test("addColumnsFiles adds columns without touching fragment files") {
    val t = tmp()
    GraftTable.write(people.repartition(2), t)
    val before = GraftTable.loadManifest(spark, t).fragments.map(f => f.id -> f.path).toSet
    GraftTable.addColumnsFiles(spark, t, Seq("score2" -> "score * 2", "tag" -> "upper(name)"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.map(f => f.id -> f.path).toSet == before, "fragments untouched")
    assert(m.columnFiles.map(_.columns) == Seq(Seq("score2", "tag")))
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score", "score2", "tag"))
    assert(back.select("score2").as[Double].collect().toSeq == Seq(20.0, 40.0, 60.0, 80.0, 100.0))
    assert(back.select("tag").as[String].collect().toSeq ==
      Seq("ALICE", "BOB", "CAROL", "DAVE", "ERIN"))
  }

  test("rows appended after addColumnsFiles carry values in their own fragments") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.addColumnsFiles(spark, t, Seq("score2" -> "score * 2"))
    GraftTable.write(Seq((6L, "fred", 60.0, 120.0)).toDF("id", "name", "score", "score2"),
      t, "append")
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.count() == 6)
    assert(back.select("score2").as[Double].collect().toSeq ==
      Seq(20.0, 40.0, 60.0, 80.0, 100.0, 120.0))
    // take sees supplemental values too
    val addr = GraftTable.read(spark, t, withRowAddr = true)
      .filter($"id" === 3L).select("_rowaddr").as[Long].head()
    assert(GraftTable.take(spark, t, Seq(addr)).select("score2").as[Double].head() == 60.0)
  }

  test("mergeColumns: left-join column merge, unmatched rows null, no rewrite") {
    val t = tmp()
    GraftTable.write(people.repartition(2), t)
    val before = GraftTable.loadManifest(spark, t).fragments.map(f => f.id -> f.path).toSet
    // ids 4,5 have no match → null grade
    val grades = Seq((1L, "A"), (2L, "B"), (3L, "C"), (99L, "Z"))
      .toDF("pid", "grade")
    GraftTable.mergeColumns(spark, t, grades, "id", Some("pid"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.map(f => f.id -> f.path).toSet == before, "fragments untouched")
    assert(m.columnFiles.map(_.columns) == Seq(Seq("grade")))
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score", "grade"))
    assert(back.select("grade").collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("A"), Some("B"), Some("C"), None, None))
    // take resolves merged values too
    val addr = GraftTable.read(spark, t, withRowAddr = true)
      .filter($"id" === 2L).select("_rowaddr").as[Long].head()
    assert(GraftTable.take(spark, t, Seq(addr)).select("grade").as[String].head() == "B")
  }

  test("mergeColumns fails fast: duplicate right keys, colliding names") {
    val t = tmp()
    GraftTable.write(people, t)
    val dup = Seq((1L, "A"), (1L, "B")).toDF("pid", "grade")
    assertThrows[IllegalArgumentException] {
      GraftTable.mergeColumns(spark, t, dup, "id", Some("pid"))
    }
    val collide = Seq((1L, "x")).toDF("pid", "name")
    assertThrows[IllegalArgumentException] {
      GraftTable.mergeColumns(spark, t, collide, "id", Some("pid"))
    }
    // "addr" is the column-file key: a source column named that would
    // misbind into the supplemental dataset
    val reserved = Seq((1L, 5L)).toDF("pid", "addr")
    assertThrows[IllegalArgumentException] {
      GraftTable.mergeColumns(spark, t, reserved, "id", Some("pid"))
    }
    // nothing committed by the failed attempts
    assert(GraftTable.loadManifest(spark, t).columnFiles.isEmpty)
  }

  test("addColumnsFiles composes with delete + update; compact materializes") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.addColumnsFiles(spark, t, Seq("score2" -> "score * 2"))
    GraftTable.delete(spark, t, "id = 2")
    GraftTable.update(spark, t, Map("score" -> "score + 1"), Some("id = 1"))
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.select("id").as[Long].collect().toSeq == Seq(1L, 3L, 4L, 5L))
    // updated row was rewritten into a new fragment carrying score2 natively
    assert(back.select("score2").as[Double].collect().toSeq == Seq(20.0, 60.0, 80.0, 100.0))
    GraftTable.compact(spark, t)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.columnFiles.isEmpty && m.dvFiles.isEmpty)
    assert(GraftTable.read(spark, t).orderBy("id")
      .select("score2").as[Double].collect().toSeq == Seq(20.0, 60.0, 80.0, 100.0))
  }

  test("dropColumns prunes supplemental column metadata") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.addColumnsFiles(spark, t, Seq("score2" -> "score * 2", "tag" -> "upper(name)"))
    GraftTable.dropColumns(spark, t, Seq("score2"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.columnFiles.map(_.columns) == Seq(Seq("tag")))
    val back = GraftTable.read(spark, t)
    assert(!back.schema.fieldNames.contains("score2"))
    assert(back.schema.fieldNames.contains("tag"))
  }

  test("compactFiles rewrites only small/deleted fragments, keeps the rest") {
    val t = tmp()
    val big = spark.range(0, 10000).select($"id", ($"id" % 7).as("k"))
    GraftTable.write(big.repartition(1), t) // one big fragment
    GraftTable.write(Seq((10001L, 1L), (10002L, 2L)).toDF("id", "k").coalesce(1), t, "append")
    GraftTable.write(Seq((10003L, 3L)).toDF("id", "k").coalesce(1), t, "append")
    val before = GraftTable.loadManifest(spark, t)
    assert(before.fragments.length == 3)
    val bigId = before.fragments.maxBy(_.rows).id
    // target 8k: the 10k fragment is not small; the two tiny ones are
    GraftTable.compactFiles(spark, t, targetRows = 8000)
    val after = GraftTable.loadManifest(spark, t)
    assert(after.fragments.map(_.id).contains(bigId), "big fragment kept")
    assert(after.fragments.length == 2, "two small fragments binned into one")
    assert(GraftTable.read(spark, t).count() == 10003)
  }

  test("compactFiles materializes deletion-heavy fragments, carries other DVs") {
    val t = tmp()
    val a = spark.range(0, 10000).select($"id")        // fragment 0
    val b = spark.range(10000, 20000).select($"id")    // fragment 1
    GraftTable.write(a.repartition(1), t)
    GraftTable.write(b.repartition(1), t, "append")
    // 50% of fragment 0 deleted; 1 row of fragment 1 deleted (0.01%)
    GraftTable.delete(spark, t, "id < 5000 OR id = 15000")
    val m0 = GraftTable.loadManifest(spark, t)
    assert(m0.numDeleted == 5001)
    val frag1 = m0.fragments.maxBy(_.id)
    // target 10k: neither fragment is "small"; only fragment 0 crosses the
    // 10% deleted threshold and is rewritten
    GraftTable.compactFiles(spark, t, targetRows = 10000, materializeDeletions = 0.1)
    val after = GraftTable.loadManifest(spark, t)
    assert(after.fragments.exists(f => f.id == frag1.id && f.path == frag1.path),
      "lightly-deleted fragment kept as-is")
    assert(after.numDeleted == 1, "its DV entry carried forward")
    assert(GraftTable.read(spark, t).count() == 14999)
    assert(GraftTable.countRows(spark, t) == 14999)
    val ids = GraftTable.read(spark, t).select("id").as[Long].collect().toSet
    assert(!ids.contains(15000L) && !ids.contains(4999L) && ids.contains(5000L))
  }

  test("branches: create, append, read — isolated from main, shared data") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.createBranch(spark, t, "dev")
    assert(GraftTable.branches(spark, t) == Seq("dev"))
    // branch append does not affect main
    GraftTable.writeBranch(Seq((10L, "zoe", 99.0)).toDF("id", "name", "score"), t, "dev")
    assert(GraftTable.read(spark, t).count() == 5)
    assert(GraftTable.readBranch(spark, t, "dev").count() == 6)
    // main append does not affect the branch
    GraftTable.write(Seq((11L, "yan", 1.0)).toDF("id", "name", "score"), t, "append")
    assert(GraftTable.read(spark, t).count() == 6)
    assert(GraftTable.readBranch(spark, t, "dev").count() == 6)
    assert(GraftTable.readBranch(spark, t, "dev")
      .filter(col("id") === 10L).count() == 1)
    // branch time travel: the branch's first version is the fork point
    val forkV = GraftTable.versions(spark, t, Some("dev")).head
    assert(GraftTable.readBranch(spark, t, "dev", Some(forkV)).count() == 5)
    // format("graft") branch read option
    assert(spark.read.format("graft").option("branch", "dev").load(t).count() == 6)
    // cleanup keeps branch-referenced files
    GraftTable.cleanupOldVersions(spark, t, keepLast = 1)
    assert(GraftTable.readBranch(spark, t, "dev").count() == 6)
    GraftTable.dropBranch(spark, t, "dev")
    assert(GraftTable.branches(spark, t).isEmpty)
  }

  test("createBranch from an old version forks history") {
    val t = tmp()
    GraftTable.write(people, t)                       // v1
    GraftTable.write(people.limit(2), t, "append")    // v2
    GraftTable.createBranch(spark, t, "hotfix", fromVersion = Some(1L))
    assert(GraftTable.readBranch(spark, t, "hotfix").count() == 5)
    assert(GraftTable.read(spark, t).count() == 7)
  }

  test("compactFiles no-op when there is no debt") {
    val t = tmp()
    GraftTable.write(spark.range(0, 5000).toDF("id").repartition(1), t)
    val v0 = GraftTable.loadManifest(spark, t).version
    GraftTable.compactFiles(spark, t, targetRows = 8000)
    assert(GraftTable.loadManifest(spark, t).version == v0, "no new commit")
  }
}
