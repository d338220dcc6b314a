package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet tables.
  *
  * One parquet file per table under `sfDir` (see TESTDATA.md). These are the
  * *inputs*; the graft table format (graft.format) is the library's own
  * storage layer.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet timestamp[ns] (early testdata
    * drops — Spark's reader rejects ns, so we read nanos-as-long and
    * truncate to micros, matching DuckDB's ns→us cast) and timestamp[us]
    * (current drops — a native timestamp, usable as-is). Branch on the
    * physical type actually loaded instead of assuming either.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = s.conf.getOption(key)
    def restore(): Unit = prior match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
    s.conf.set(key, "true")
    // restore on EVERY path except legacy ns data (a failed load must not
    // leave the session flag mutated either); the ns path is the one case
    // where execution re-reads the flag while materializing the column
    var keepFlag = false
    try {
      val df = load(s, d, "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          keepFlag = true
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
        case _ => df // native TIMESTAMP: the flag was never needed
      }
    } finally if (!keepFlag) restore()
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql paths / tests).
    * `events` goes through its schema-adaptive loader so views see the
    * same micros timestamp regardless of the parquet physical type.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
