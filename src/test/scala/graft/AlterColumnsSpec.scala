package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{GraftExtensions, GraftTable}
import graft.index.ScalarIndex

/** `alter_columns` (reference `schema_evolution.rs:451`): metadata-only
  * rename that keeps data files AND existing indices valid, and type casts
  * that rewrite while preserving stable row ids. */
class AlterColumnsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_alter_").toString + "/t"

  private def people = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0),
    (4L, "dave", 40.0), (5L, "erin", 50.0)
  ).toDF("id", "name", "score")

  test("rename is metadata-only: fragment files untouched, reads show new name") {
    val t = tmp()
    GraftTable.write(people.repartition(2), t)
    val before = GraftTable.loadManifest(spark, t).fragments.map(f => f.id -> f.path).toSet
    GraftTable.alterColumns(spark, t, renames = Map("name" -> "person_name"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.map(f => f.id -> f.path).toSet == before, "no data rewrite")
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.schema.fieldNames.toSeq == Seq("id", "person_name", "score"))
    assert(back.select("person_name").as[String].collect().toSeq ==
      Seq("alice", "bob", "carol", "dave", "erin"))
    // filter on the NEW name pushes down to the physically-named parquet
    assert(GraftTable.read(spark, t).filter($"person_name" === "carol")
      .select("id").as[Long].head() == 3L)
  }

  test("rename survives append, delete, update, and compaction") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.alterColumns(spark, t, renames = Map("score" -> "points"))
    GraftTable.write(Seq((6L, "fred", 60.0)).toDF("id", "name", "points"), t, "append")
    GraftTable.delete(spark, t, "id = 2")
    GraftTable.update(spark, t, Map("points" -> "points + 1"), Some("id = 1"))
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.select("points").as[Double].collect().toSeq ==
      Seq(11.0, 30.0, 40.0, 50.0, 60.0))
    GraftTable.compact(spark, t)
    assert(GraftTable.read(spark, t).orderBy("id")
      .select("points").as[Double].collect().toSeq == Seq(11.0, 30.0, 40.0, 50.0, 60.0))
  }

  test("rename composes with supplemental column files (rename the added col)") {
    val t = tmp()
    GraftTable.write(people, t)
    GraftTable.addColumnsFiles(spark, t, Seq("score2" -> "score * 2"))
    GraftTable.alterColumns(spark, t, renames = Map("score2" -> "double_score"))
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.schema.fieldNames.contains("double_score"))
    assert(back.select("double_score").as[Double].collect().toSeq ==
      Seq(20.0, 40.0, 60.0, 80.0, 100.0))
  }

  test("pre-rename BTREE index keeps serving the renamed column (rule hit)") {
    val t = tmp()
    val s: SparkSession = {
      TestSpark.spark
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val x = SparkSession.builder().master("local[4]")
        .appName("graft-alter-ext").config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions).getOrCreate()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
      x
    }
    GraftTable.write(people, t)
    ScalarIndex.buildBtree(s, t, "id", s"$t/_indices")
    GraftTable.alterColumns(s, t, renames = Map("id" -> "pk"))
    val q = s.read.format("graft").load(t).filter(col("pk") === 4L)
    assert(q.select("name").collect().map(_.getString(0)).toSeq == Seq("dave"))
    // the index mask semi-join is in the optimized plan (index dir is keyed
    // by the physical name "id", looked up via the rename mapping)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected index semi-join in:\n$plan")
  }

  test("cast rewrites data, preserves stable row ids, updates the schema") {
    val t = tmp()
    GraftTable.write(people, t)
    val idsBefore = GraftTable.read(spark, t, withRowId = true)
      .select("id", "_rowid").as[(Long, Long)].collect().toMap
    GraftTable.alterColumns(spark, t, casts = Map("score" -> "int", "id" -> "string"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.schema("score").dataType.typeName == "integer")
    assert(m.schema("id").dataType.typeName == "string")
    val back = GraftTable.read(spark, t, withRowId = true)
    val idsAfter = back.select("id", "_rowid").collect()
      .map(r => r.getString(0).toLong -> r.getLong(1)).toMap
    assert(idsAfter == idsBefore, "stable row ids preserved through cast rewrite")
    assert(back.orderBy("id").select("score").as[Int].collect().toSeq ==
      Seq(10, 20, 30, 40, 50))
  }

  test("rename then cast in one call; take-by-id still resolves") {
    val t = tmp()
    GraftTable.write(people, t)
    val rid = GraftTable.read(spark, t, withRowId = true)
      .filter($"id" === 3L).select("_rowid").as[Long].head()
    GraftTable.alterColumns(spark, t,
      renames = Map("score" -> "points"), casts = Map("points" -> "long"))
    val got = GraftTable.takeRows(spark, t, Seq(rid))
    assert(got.select("points").as[Long].head() == 30L)
    // rename metadata dropped out after the rewrite (files carry logical names)
    assert(GraftTable.loadManifest(spark, t).renames.isEmpty)
  }

  test("nullability: relax is metadata-only, tighten proves no nulls first") {
    val t = tmp()
    GraftTable.write(people, t)
    val before = GraftTable.loadManifest(spark, t)
    // relax: metadata-only commit, fragments untouched
    val relaxed = GraftTable.alterNullability(spark, t, Map("name" -> true))
    assert(relaxed.schema("name").nullable)
    assert(relaxed.fragments == before.fragments, "metadata-only")
    // tighten back: no nulls exist → succeeds, still metadata-only; a
    // multi-column tighten proves all constraints in ONE combined scan
    val tight = GraftTable.alterNullability(spark, t,
      Map("name" -> false, "score" -> false))
    assert(!tight.schema("name").nullable && !tight.schema("score").nullable)
    assert(tight.fragments == before.fragments)
    // tighten a column WITH nulls → refused
    GraftTable.alterNullability(spark, t, Map("name" -> true))
    GraftTable.write(Seq((6L, null.asInstanceOf[String], 60.0))
      .toDF("id", "name", "score"), t, "append")
    val e = intercept[IllegalArgumentException] {
      GraftTable.alterNullability(spark, t, Map("name" -> false))
    }
    assert(e.getMessage.contains("null values exist"))
    // reads keep working across the toggles
    assert(GraftTable.read(spark, t).count() == 6)
  }

  test("createEmpty: DDL-style empty table accepts appends") {
    val t = tmp()
    GraftTable.createEmpty(spark, t,
      people.schema)
    assert(GraftTable.read(spark, t).count() == 0)
    assert(GraftTable.read(spark, t).schema.fieldNames.toSeq == Seq("id", "name", "score"))
    GraftTable.write(people, t, "append")
    assert(GraftTable.read(spark, t).count() == 5)
    intercept[IllegalStateException] {
      GraftTable.createEmpty(spark, t, people.schema)
    }
  }
}
