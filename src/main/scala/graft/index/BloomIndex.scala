package graft.index

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

import graft.format.GraftTable

/** BLOOMFILTER scalar index (SURVEY §2.7; reference
  * `rust/lance-index/src/scalar/bloomfilter.rs`): one Bloom filter PER
  * FRAGMENT over a column's values, for equality/IN predicates on
  * high-cardinality columns that are not sorted (where BTREE row-group
  * pruning and zonemap min/max both degenerate).
  *
  * The index is an *inexact at-most* fragment mask (the reference's
  * `AtMost` result): a fragment whose bloom rejects the probe value
  * definitively does not contain it; positives need the refine filter.
  * [[graft.format.GraftScalarIndexRule]] wires lookups in automatically —
  * the scan's fragment list shrinks to bloom-positive fragments, the
  * original filter stays on top for exactness.
  *
  * Scale shape: the build is one distributed aggregation (map-side combine
  * per fragment — no row shuffle, only per-fragment bloom bytes move);
  * lookups run a one-row-per-fragment job and collect only matching
  * fragment IDs. Bloom bytes never aggregate on the driver, so a 100k
  * fragment table costs the driver a list of longs, not gigabytes of
  * bitmaps.
  */
object BloomIndex {
  private val A = GraftTable.RowAddrCol

  private[graft] def dirName(column: String): String = s"bloom_$column"

  /** Values are hashed through their string form so build (Spark
    * cast-to-string) and probe (Scala literal toString) agree. They agree
    * unambiguously only for integral and string types — the auto-rewrite
    * rule restricts itself to those; fractional/temporal renderings differ
    * between the two paths and MUST NOT be wired in without a canonical
    * encoding. */
  private def canonical(v: Any): String = v match {
    case null => ""
    case s: java.lang.CharSequence => s.toString
    case other => other.toString
  }

  /** Build per-fragment blooms for `column` at `indexPath/bloom_<column>`.
    * `fpp` is the per-fragment false-positive rate (reference default
    * probability; false positives cost extra fragment scans, never
    * correctness). */
  def build(spark: SparkSession, tablePath: String, column: String,
            indexPath: String, fpp: Double = 0.01): Unit = {
    val m = GraftTable.loadManifest(spark, tablePath)
    val maxRows = math.max(1L, m.fragments.map(_.rows).maxOption.getOrElse(1L))
    val dir = s"$indexPath/${dirName(column)}"
    val rows = GraftTable.read(spark, tablePath, withRowAddr = true)
      .select(col(column).cast("string").as("v"),
        shiftrightunsigned(col(A), 32).as("frag"))
      .where(col("v").isNotNull)
      .rdd.map(r => (r.getLong(1), r.getString(0)))
      // per-key zero is deserialized per fragment; putString/merge happen
      // map-side (combiner), so only bloom bytes cross the wire
      .aggregateByKey(BloomFilter.create(maxRows, fpp))(
        (bf, v) => { bf.putString(v); bf },
        (a, b) => { a.mergeInPlace(b); a })
      .map { case (frag, bf) =>
        val bos = new ByteArrayOutputStream()
        bf.writeTo(bos)
        Row(frag, bos.toByteArray)
      }
    val schema = StructType(Seq(
      StructField("frag", LongType, nullable = false),
      StructField("bloom", BinaryType, nullable = false)))
    spark.createDataFrame(rows, schema)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    ScalarIndex.finishBuild(spark, tablePath, indexPath, dirName(column), "BLOOMFILTER",
      m.schema.fields.find(_.name == column).map(m.physicalName).getOrElse(column),
      m, freshUuid = true)
  }

  /** Bloom fragments added since the build (O(delta) IO), moving the marker
    * to the current version like [[ScalarIndex.optimizeBtree]]. */
  def optimize(spark: SparkSession, tablePath: String, column: String,
               indexPath: String, fpp: Double = 0.01): Long = {
    val dir = s"$indexPath/${dirName(column)}"
    val vi = ScalarIndex.indexedVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"$dir has no version marker — build first"))
    val m = GraftTable.loadManifest(spark, tablePath)
    val freshFrags = m.fragments.filter(_.addedVersion > vi)
    if (freshFrags.nonEmpty) {
      val maxRows = math.max(1L, freshFrags.map(_.rows).max)
      val rows = GraftTable.readFragments(spark, tablePath, m, freshFrags, withRowAddr = true)
        .select(col(column).cast("string").as("v"),
          shiftrightunsigned(col(A), 32).as("frag"))
        .where(col("v").isNotNull)
        .rdd.map(r => (r.getLong(1), r.getString(0)))
        .aggregateByKey(BloomFilter.create(maxRows, fpp))(
          (bf, v) => { bf.putString(v); bf },
          (a, b) => { a.mergeInPlace(b); a })
        .map { case (frag, bf) =>
          val bos = new ByteArrayOutputStream()
          bf.writeTo(bos)
          Row(frag, bos.toByteArray)
        }
      val schema = StructType(Seq(
        StructField("frag", LongType, nullable = false),
        StructField("bloom", BinaryType, nullable = false)))
      spark.createDataFrame(rows, schema)
        .write.mode(SaveMode.Append).parquet(dir)
    }
    ScalarIndex.finishBuild(spark, tablePath, indexPath, dirName(column), "BLOOMFILTER",
      m.schema.fields.find(_.name == column).map(m.physicalName).getOrElse(column),
      m, freshUuid = false)
    freshFrags.map(_.rows).sum
  }

  /** Fragment ids whose bloom might contain ANY of `values` (at-most mask:
    * the complement is definitively value-free). One row-per-fragment job;
    * only matching ids reach the driver. */
  def candidateFragments(spark: SparkSession, indexDir: String,
                         values: Seq[Any]): Set[Long] = {
    val probes = values.map(canonical).distinct
    val mightContain = udf((bytes: Array[Byte]) => {
      val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      probes.exists(bf.mightContainString)
    })
    spark.read.parquet(indexDir)
      .filter(mightContain(col("bloom")))
      .select(col("frag"))
      .collect().map(_.getLong(0)).toSet
  }
}
