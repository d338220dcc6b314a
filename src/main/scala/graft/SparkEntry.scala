package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => qp}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-family packs under [[graft.queries]]; each
  * pack pairs a Spark implementation with DuckDB oracle SQL (when the op is
  * SQL-expressible) for the driver's hash-compare gate.
  */
object SparkEntry {
  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (qp.Relational.queries, qp.Relational.oracleSql),
      (qp.Vector.queries, qp.Vector.oracleSql),
      (qp.Text.queries, qp.Text.oracleSql),
      (qp.Format.queries, qp.Format.oracleSql),
      (qp.FtsQueries.queries, qp.FtsQueries.oracleSql),
      (qp.Curation.queries, qp.Curation.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.iterator.flatMap(_._2).toMap
}
