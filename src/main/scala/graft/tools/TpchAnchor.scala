package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.format.GraftTable

/** Absolute TPC-H anchor at SF1 (reference `benchmarks/tpch/README.md`,
  * `benchmark.py:48-74`: Q1/Q6 at SF1, repeated, best-of): measures graft
  * Q1/Q6 over a graft TABLE built from `benchdata/sf1/lineitem.parquet`
  * (6M rows — tools/gen_tpch_sf1.py) so BASELINE.md can carry a measured
  * graft-vs-DuckDB ratio on identical data instead of a relative
  * inference. The DuckDB side is tools/duckdb_tpch_anchor.py with the
  * same date literals (shifted into the synthetic data's 1995-2001
  * shipdate range at dbgen's selectivities: Q1 96.2%, Q6 2.0%).
  *
  * Usage: SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.TpchAnchor"
  * Prints one JSON line; builds the graft table on first run (cached at
  * benchdata/sf1_graft/lineitem).
  */
object TpchAnchor {
  val SrcDir = "/root/repo/benchdata/sf1"
  val TableDir = "/root/repo/benchdata/sf1_graft/lineitem"

  /** TPC-H Q1 over a graft lineitem table (date literal shifted; see
    * object doc). */
  def q1(spark: SparkSession, table: String): DataFrame =
    q1df(GraftTable.read(spark, table))

  def q1df(src: DataFrame): DataFrame =
    src
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-08-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6 over a graft lineitem table. */
  def q6(spark: SparkSession, table: String): DataFrame =
    q6df(GraftTable.read(spark, table))

  def q6df(src: DataFrame): DataFrame =
    src
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** Build the graft table once: 128 fragments (r14 — the r13 choice of
    * 16 was a straggler trap: 16 tasks on 16 threads leaves zero
    * work-stealing slack, so one slow task IS the wall-clock; the r14
    * sweep measured 16→128 fragments cutting Q1 0.64→0.37 s and Q6
    * 0.16→0.106 s at 16 threads, flat beyond 128). Finer fragments also
    * tighten the range-clustered shipdate zonemaps, which is what pushed
    * Q6 to DuckDB parity. On a cluster, fragments ARE the scan split
    * unit — size them for several task waves per core, not one. */
  def ensureTable(spark: SparkSession): Unit = {
    // rebuild when the cached table predates the current layout — a box
    // carrying the old 16-fragment table must not report its straggler
    // numbers under the 128-fragment label
    val current = scala.util.Try(GraftTable.latestVersion(spark, TableDir))
      .toOption.flatten
      .map(_ => GraftTable.loadManifest(spark, TableDir).fragments.length)
    if (current.contains(128)) return
    current.foreach { n =>
      System.err.println(s"[TpchAnchor] rebuilding: cached table has $n fragments, layout wants 128")
      val t = new org.apache.hadoop.fs.Path(TableDir)
      t.getFileSystem(spark.sessionState.newHadoopConf()).delete(t, true)
    }
    val src = spark.read.parquet(s"$SrcDir/lineitem.parquet")
    // RANGE partitioning, not hash: hash-by-date scatters every date range
    // across all fragments (zonemap min/max ≈ the full corpus range — zero
    // pruning); range clustering gives each fragment a tight shipdate
    // window, so Q6's one-year predicate prunes ~5/6 of the fragments from
    // the manifest alone and Q1's tail cutoff drops the newest ones
    GraftTable.write(src.repartitionByRange(128, col("l_shipdate")),
      TableDir, "overwrite")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureTable(spark)
    // warmup (JIT + codegen + footer caches), then best-of-7 like the
    // DuckDB side's best-of. Three warmup passes, not one: C2 needs a few
    // thousand invocations of the generated agg-update loop before the
    // steady-state code is in place, and a single pass leaves the
    // "best-of" measuring tier-1 JIT, not the engine (r14: the same table
    // in a hot JVM measured 0.37 s where a 1-warmup JVM measured 0.45-0.52)
    for (_ <- 1 to 3) { q1(spark, TableDir).collect(); q6(spark, TableDir).collect() }
    def best(fn: () => Unit): Double =
      (1 to 7).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.min
    val t1 = best(() => { q1(spark, TableDir).collect(); () })
    val t6 = best(() => { q6(spark, TableDir).collect(); () })
    // raw-parquet control: isolates the graft format's read overhead from
    // Spark-vs-native engine differences
    val raw = spark.read.parquet(s"$SrcDir/lineitem.parquet")
    def q1raw = q1df(raw)
    def q6raw = q6df(raw)
    for (_ <- 1 to 3) { q1raw.collect(); q6raw.collect() }
    val r1 = best(() => { q1raw.collect(); () })
    val r6 = best(() => { q6raw.collect(); () })
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      q1(spark, TableDir).explain("formatted")
      q6(spark, TableDir).explain("formatted")
    }
    println(f"""{"tpch_sf1_q1":$t1%.4f,"tpch_sf1_q6":$t6%.4f,"raw_parquet_q1":$r1%.4f,"raw_parquet_q6":$r6%.4f,"cpus":$cpus}""")
    spark.stop()
  }
}
