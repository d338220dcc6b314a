package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot correctness check for the Q3 anchor: prints graft's Q3 rows
  * in a stable format for diffing against tools/duckdb_tpch_anchor.py's
  * result (the anchor measures speed; this pins that both engines agree
  * on the answer). */
object AnchorQ3Check {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TpchAnchor.ensureTable(spark)
    TpchAnchor.ensureJoinTables(spark)
    TpchAnchor.q3(spark).collect().foreach { r =>
      println(s"Q3ROW|${r.getLong(0)}|${"%.4f".format(r.getDouble(3))}|${r.get(1).toString.replace('T', ' ')}|${r.getString(2)}")
    }
    spark.stop()
  }
}
