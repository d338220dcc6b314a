package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** NESTED schema evolution (reference `schema_evolution.rs` — nested
  * `ColumnAlteration` renames like `"b.c"` and nested `drop_columns`,
  * metadata-only thanks to field-id indirection; graft's equivalent is the
  * `graft.physical` field metadata at any depth). */
class NestedSchemaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_nested_").toString + "/t"

  /** id, s: struct(a long, b string), tags: array(struct(k string, v long)) */
  private def nestedDf = spark.range(1, 6).toDF("id")
    .withColumn("s", struct((col("id") * 10).as("a"),
      concat(lit("x"), col("id")).as("b")))
    .withColumn("tags", array(
      struct(lit("t").as("k"), col("id").as("v")),
      struct(lit("u").as("k"), (col("id") * 2).as("v"))))

  test("nested rename is metadata-only; values and filters survive") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    val before = GraftTable.loadManifest(spark, t).fragments.map(f => f.id -> f.path).toSet
    GraftTable.alterColumns(spark, t, renames = Map("s.a" -> "alpha"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.fragments.map(f => f.id -> f.path).toSet == before, "no data rewrite")
    assert(m.indirectionPairs == Seq("s.alpha" -> "a"))
    val back = GraftTable.read(spark, t)
    assert(back.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("alpha", "b"))
    assert(back.orderBy("id").select("s.alpha").as[Long].collect().toSeq ==
      Seq(10L, 20L, 30L, 40L, 50L))
    assert(back.filter(col("s.alpha") === 30L).select("id").as[Long].head() == 3L)
  }

  test("nested rename survives append (logical input lands physically)") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    GraftTable.alterColumns(spark, t, renames = Map("s.b" -> "label"))
    // append with the NEW logical nested name
    val extra = spark.range(6, 8).toDF("id")
      .withColumn("s", struct((col("id") * 10).as("alpha_no"),
        concat(lit("x"), col("id")).as("label")))
      .withColumn("tags", array(struct(lit("t").as("k"), col("id").as("v"))))
      // keep subfield names in the logical shape: a stays a
      .withColumn("s", struct(col("s.alpha_no").as("a"), col("s.label").as("label")))
    GraftTable.write(extra, t, "append")
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.select("s.label").as[String].collect().toSeq ==
      (1 to 7).map(i => s"x$i"))
    // physical on-file name inside both old and new fragments is still "b"
    val frag = GraftTable.loadManifest(spark, t).fragments.last
    val raw = spark.read.parquet(t + "/" + frag.path)
    assert(raw.schema("s").dataType.asInstanceOf[StructType].fieldNames.contains("b"))
  }

  test("append with reordered-but-correctly-named struct fields binds by name") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    GraftTable.alterColumns(spark, t, renames = Map("s.b" -> "label"))
    // struct built with fields in the WRONG order but right logical names:
    // must land in the right physical columns (by-name, not positional)
    val extra = spark.range(6, 8).toDF("id")
      .withColumn("s", struct(concat(lit("x"), col("id")).as("label"),
        (col("id") * 10).as("a")))
      .withColumn("tags", array(struct(lit("t").as("k"), col("id").as("v"))))
    GraftTable.write(extra, t, "append")
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.select("s.a").as[Long].collect().toSeq ==
      (1 to 7).map(_ * 10L))
    assert(back.select("s.label").as[String].collect().toSeq ==
      (1 to 7).map(i => s"x$i"))
  }

  test("nested swap-rename at one level applies atomically") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    GraftTable.alterColumns(spark, t, renames = Map("s.a" -> "b", "s.b" -> "a"))
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.select("s.b").as[Long].collect().toSeq == Seq(10L, 20L, 30L, 40L, 50L))
    assert(back.select("s.a").as[String].head() == "x1")
  }

  test("rename inside array-of-struct elements") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    GraftTable.alterColumns(spark, t, renames = Map("tags.v" -> "value"))
    val back = GraftTable.read(spark, t).orderBy("id")
    val elemT = back.schema("tags").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(elemT.fieldNames.toSeq == Seq("k", "value"))
    assert(back.select(element_at(col("tags"), 2).getField("value"))
      .as[Long].collect().toSeq == Seq(2L, 4L, 6L, 8L, 10L))
  }

  test("nested drop is metadata-only and prunes the subfield") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    val before = GraftTable.loadManifest(spark, t).fragments.map(_.path).toSet
    GraftTable.dropColumns(spark, t, Seq("s.b"))
    assert(GraftTable.loadManifest(spark, t).fragments.map(_.path).toSet == before)
    val back = GraftTable.read(spark, t)
    assert(back.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("a"))
    assert(back.orderBy("id").select("s.a").as[Long].collect().toSeq ==
      Seq(10L, 20L, 30L, 40L, 50L))
    // dropping the LAST subfield of a struct is refused
    intercept[IllegalArgumentException] {
      GraftTable.dropColumns(spark, t, Seq("s.a"))
    }
  }

  test("nested drop composes with a prior nested rename") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    GraftTable.alterColumns(spark, t, renames = Map("s.a" -> "alpha"))
    GraftTable.dropColumns(spark, t, Seq("s.alpha"))
    val back = GraftTable.read(spark, t)
    assert(back.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("b"))
    assert(back.orderBy("id").select("s.b").as[String].head() == "x1")
  }

  test("nested cast rewrites data and materializes logical names") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    GraftTable.alterColumns(spark, t, renames = Map("s.a" -> "alpha"))
    GraftTable.alterColumns(spark, t, casts = Map("s.alpha" -> "double"))
    val m = GraftTable.loadManifest(spark, t)
    assert(m.indirectionPairs.isEmpty, "cast rewrite materializes logical names")
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.schema("s").dataType.asInstanceOf[StructType]("alpha").dataType ==
      DoubleType)
    assert(back.select("s.alpha").as[Double].collect().toSeq ==
      Seq(10.0, 20.0, 30.0, 40.0, 50.0))
  }

  test("null structs stay null through rename and append") {
    val t = tmp()
    val df = Seq((1L, Some(("a", 1L))), (2L, None))
      .toDF("id", "s")
      .select(col("id"), when(col("s").isNotNull,
        struct(col("s._1").as("k"), col("s._2").as("v"))).as("s"))
    GraftTable.write(df, t)
    GraftTable.alterColumns(spark, t, renames = Map("s.k" -> "key"))
    val back = GraftTable.read(spark, t).orderBy("id")
    assert(back.filter(col("s").isNull).select("id").as[Long].collect().toSeq == Seq(2L))
    assert(back.filter(col("s").isNotNull).select("s.key").as[String].head() == "a")
    // append a null struct under the renamed logical schema
    val extra = Seq((3L, None: Option[(String, Long)])).toDF("id", "s")
      .select(col("id"), when(col("s").isNotNull,
        struct(col("s._1").as("key"), col("s._2").as("v"))).as("s"))
    GraftTable.write(extra, t, "append")
    assert(GraftTable.read(spark, t).filter(col("s").isNull)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("rename validation: sibling clash, physical shadow, missing path") {
    val t = tmp()
    GraftTable.write(nestedDf, t)
    intercept[IllegalArgumentException] {
      GraftTable.alterColumns(spark, t, renames = Map("s.a" -> "b"))
    }
    GraftTable.alterColumns(spark, t, renames = Map("s.a" -> "alpha"))
    // "a" is still the on-file name of alpha — a sibling may not take it
    intercept[IllegalArgumentException] {
      GraftTable.alterColumns(spark, t, renames = Map("s.b" -> "a"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.alterColumns(spark, t, renames = Map("s.zzz" -> "w"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.alterColumns(spark, t, renames = Map("id.x" -> "w"))
    }
  }
}
