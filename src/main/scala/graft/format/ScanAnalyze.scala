package graft.format

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, expr}

/** EXPLAIN ANALYZE-equivalent for graft scans (reference `analyze_plan`,
  * Python `dataset.py`; per-scan metrics `rust/lance/src/io/exec/
  * filtered_read.rs:208-230`, surfaced through EXPLAIN ANALYZE in
  * `rust/lance/src/dataset/sql.rs:226-281`): run a query against a table
  * and report what the scan actually did — how many fragments pruning
  * skipped, the rows/bytes behind the surviving fragments, DV masking, and
  * rows returned.
  *
  * Spark-first split of responsibilities: the EXECUTION-side counters
  * (files read, bytes read, rows produced per operator) are already
  * first-class on `FileSourceScanExec`'s SQLMetrics in the Spark UI /
  * `EXPLAIN ANALYZE`-style listeners — we do not reinvent them. What Spark
  * cannot know is the FRAGMENT-level planning story (manifest fragments vs
  * zonemap-surviving fragments, DV row masking), because those decisions
  * live in [[GraftFileIndex]] and the manifest. This module reports both
  * sides from one execution.
  */
object ScanAnalyze {

  /** Run `SELECT columns FROM table WHERE predicate` over the snapshot and
    * report scan metrics, in reference `filtered_read` naming. The query
    * EXECUTES (counts are measured, not estimated). */
  def analyze(spark: SparkSession, tablePath: String,
              predicate: Option[String] = None,
              columns: Seq[String] = Nil,
              version: Option[Long] = None): Seq[(String, Long)] = {
    val m = GraftTable.loadManifest(spark, tablePath, version)
    val df0 = GraftTable.read(spark, tablePath, version)
    val df1 = predicate.map(p => df0.filter(expr(p))).getOrElse(df0)
    val df = if (columns.nonEmpty) df1.select(columns.map(col): _*) else df1
    // resolve the scan's GraftFileIndex AFTER optimization — extension rules
    // (addr-prune, scalar-index mask) may replace the index instance
    val qe = df.queryExecution
    val idx = qe.optimizedPlan.collectFirst {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[HadoopFsRelation] &&
            lr.relation.asInstanceOf[HadoopFsRelation]
              .location.isInstanceOf[GraftFileIndex] =>
        lr.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[GraftFileIndex]
    }
    // a constant-false predicate folds the scan away entirely (PruneFilters
    // → empty LocalRelation): the perfect prune — report zero scanned, not
    // an error from the debugging tool itself.
    // execute THIS QueryExecution (not a derived count() plan) so the
    // pruning observability read below belongs to the plan that ran
    val rowsReturned = qe.toRdd.count()
    val kept = idx.map(_.lastKept).getOrElse(Seq.empty)
    Seq(
      "fragments_total" -> m.fragments.length.toLong,
      "fragments_scanned" -> kept.length.toLong,
      "fragments_pruned" -> (m.fragments.length - kept.length).toLong,
      "rows_in_scanned_fragments" -> kept.map(_.rows).sum,
      "bytes_in_scanned_fragments" -> kept.map(_.sizeBytes).sum,
      "dv_rows_masked" -> m.numDeleted,
      "rows_returned" -> rowsReturned)
  }
}
