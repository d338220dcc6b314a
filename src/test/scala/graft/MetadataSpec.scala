package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.{GraftManifest, GraftTable}

/** Schema/field metadata updates (reference `dataset/metadata.rs`:
  * `replace_schema_metadata`, UpdateMap merge/remove semantics, field
  * metadata updates) — metadata-only commits. */
class MetadataSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_meta_").toString + "/t"

  private def seed(t: String): Unit =
    GraftTable.write(spark.range(0, 50).toDF("id")
      .withColumn("v", col("id") * 2).repartition(1), t, "overwrite")

  test("schema metadata: merge, remove, replace; survives data commits") {
    val t = tmp(); seed(t)
    GraftTable.updateSchemaMetadata(spark, t, Map("owner" -> "ml-team", "tier" -> "gold"))
    assert(GraftTable.loadManifest(spark, t).schemaMetadata ==
      Map("owner" -> "ml-team", "tier" -> "gold"))
    // merge + remove in one commit
    GraftTable.updateSchemaMetadata(spark, t, Map("tier" -> "silver"), remove = Seq("owner"))
    assert(GraftTable.loadManifest(spark, t).schemaMetadata == Map("tier" -> "silver"))
    // survives unrelated commits
    GraftTable.write(spark.range(50, 60).toDF("id")
      .withColumn("v", col("id") * 2), t, "append")
    GraftTable.delete(spark, t, "id = 3")
    assert(GraftTable.loadManifest(spark, t).schemaMetadata == Map("tier" -> "silver"))
    // replace swaps wholesale
    GraftTable.updateSchemaMetadata(spark, t, Map("k" -> "v"), replace = true)
    assert(GraftTable.loadManifest(spark, t).schemaMetadata == Map("k" -> "v"))
    assert(GraftTable.loadManifest(spark, t).operation == "update_metadata")
  }

  test("field metadata lands on the read schema; merge and remove; reserved key rejected") {
    val t = tmp(); seed(t)
    GraftTable.updateFieldMetadata(spark, t, "v",
      Map("description" -> "doubled id", "unit" -> "count"))
    val md1 = GraftTable.read(spark, t).schema("v").metadata
    assert(md1.getString("description") == "doubled id" && md1.getString("unit") == "count")
    // merge a new key, remove one
    GraftTable.updateFieldMetadata(spark, t, "v",
      Map("source" -> "derived"), remove = Seq("unit"))
    val md2 = GraftTable.read(spark, t).schema("v").metadata
    assert(md2.getString("description") == "doubled id" &&
      md2.getString("source") == "derived" && !md2.contains("unit"))
    // untouched column carries none
    assert(GraftTable.read(spark, t).schema("id").metadata ==
      org.apache.spark.sql.types.Metadata.empty)
    // unknown column / reserved key fail fast
    intercept[IllegalArgumentException] {
      GraftTable.updateFieldMetadata(spark, t, "nope", Map("a" -> "b"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.updateFieldMetadata(spark, t, "v",
        Map(GraftManifest.PhysicalKey -> "x"))
    }
  }

  test("field metadata composes with rename indirection") {
    val t = tmp(); seed(t)
    GraftTable.updateFieldMetadata(spark, t, "v", Map("note" -> "keep me"))
    GraftTable.alterColumns(spark, t, renames = Map("v" -> "value"))
    // metadata follows the renamed field; data still reads through the
    // physical-name indirection
    val md = GraftTable.read(spark, t).schema("value").metadata
    assert(md.getString("note") == "keep me")
    assert(GraftTable.read(spark, t).agg(sum(col("value"))).head().getLong(0) ==
      (0L until 50L).map(_ * 2).sum)
    // replace clears user keys but PRESERVES the rename indirection
    GraftTable.updateFieldMetadata(spark, t, "value", Map("only" -> "this"), replace = true)
    val m = GraftTable.loadManifest(spark, t)
    assert(m.renames == Seq(("value", "v")), s"rename indirection lost: ${m.renames}")
    val md2 = GraftTable.read(spark, t).schema("value").metadata
    assert(md2.getString("only") == "this" && !md2.contains("note"))
    assert(GraftTable.read(spark, t).filter(col("value") > 90).count() == 4)
  }
}
