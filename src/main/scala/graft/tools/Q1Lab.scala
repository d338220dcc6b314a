package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.format.GraftTable

/** Q1 anchor decomposition harness (r14, backing BASELINE.md's pinned
  * residual analysis): times, in one JVM, (a) full TPC-H Q1, (b) the same
  * scan+filter with a count-only group-by (grouping machinery without the
  * aggregate expressions), (c) all eight aggregate expressions WITHOUT
  * grouping (the scan/decode/expression floor), and (d) the same
  * aggregates grouped on a packed numeric key (isolating UTF8String
  * group-key handling). `Q1_CONFS=k=v;k=v` A/Bs session confs;
  * `Q1_CODEGEN=1` dumps whole-stage codegen method sizes.
  *
  * Usage: SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.Q1Lab" */
object Q1Lab {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("Q1_CONFS").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val parts = kv.split("=", 2)
      require(parts.length == 2, s"Q1_CONFS entry must be key=value, got '$kv'")
      b.config(parts(0), parts(1))
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = TpchAnchor.TableDir
    def best(n: Int)(fn: () => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.min
    // full Q1
    TpchAnchor.q1(spark, t).collect()
    val full = best(5)(() => { TpchAnchor.q1(spark, t).collect(); () })
    // scan+filter only (count of the filtered rows, no agg exprs)
    val src = GraftTable.read(spark, t)
    def scanOnly() = src
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-08-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1))).collect()
    scanOnly()
    val scanAgg = best(5)(() => { scanOnly(); () })
    // no group-by: aggregates without keys
    def noKeys() = src
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-08-01 00:00:00")))
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))),
        avg(col("l_quantity")), avg(col("l_extendedprice")), avg(col("l_discount")),
        count(lit(1))).collect()
    noKeys()
    val noKey = best(5)(() => { noKeys(); () })
    // same aggregates grouped by a PACKED NUMERIC key (returnflag/linestatus
    // are single ASCII chars): isolates UTF8String group-key handling cost
    def intKey() = src
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-08-01 00:00:00")))
      .groupBy((ascii(col("l_returnflag")) * 256 + ascii(col("l_linestatus"))).as("k"))
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))),
        avg(col("l_quantity")), avg(col("l_extendedprice")), avg(col("l_discount")),
        count(lit(1))).collect()
    intKey()
    val intK = best(5)(() => { intKey(); () })
    println(f"""{"q1_full":$full%.4f,"count_only_grouped":$scanAgg%.4f,"agg_no_keys":$noKey%.4f,"agg_int_key":$intK%.4f,"confs":"${sys.env.getOrElse("Q1_CONFS","").replace("\"","'")}"}""")
    if (sys.env.contains("Q1_CODEGEN")) {
      import org.apache.spark.sql.execution.debug._
      TpchAnchor.q1(spark, t).debugCodegen()
    }
    spark.stop()
  }
}
