package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, the single right row with the largest
  * `rightTs` ≤ `leftTs` (strictly < when `strict`) within the same
  * equality-key group — the standard "state as of this event" join
  * (market data, CDC snapshots, feature lookups). Spark has no native
  * as-of join; the reference has no joins at all (Python `join` raises
  * NotImplementedError, `dataset.py:1589`), so this is part of the
  * relational superset the engine ships on top of the format.
  *
  * Shape — the sort-merge formulation, NEVER a range join:
  *  1. tag both sides and union them (schemas aligned, payloads boxed
  *     into one struct per side);
  *  2. one window partitioned by the keys, ordered by (ts, side): the
  *     running `last(right_payload, ignoreNulls)` at each left row IS
  *     the as-of match;
  *  3. keep the left rows, unbox both payloads.
  *
  * Cost is ONE shuffle keyed by the join keys + a per-key sort — the
  * same plan a sort-merge join pays, with no candidate-pair expansion:
  * a naive `l.ts >= r.ts` range join explodes to |L|·|R| per key before
  * its top-1 cut, which is the 100 TB failure mode this formulation
  * exists to avoid. The window is always key-partitioned (audited like
  * every window in this repo — no single-partition stage at any size).
  *
  * Inclusive ties (`strict = false`): a right row at exactly `leftTs`
  * matches. Among multiple right rows with the SAME (key, ts), the
  * greatest payload struct wins (deterministic lexicographic tiebreak,
  * documented rather than arbitrary).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String], suffix: String = "_asof",
               strict: Boolean = false): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one equality key")
    require(rightCols.nonEmpty, "asofJoin needs right columns to carry over")
    val lType = left.schema
    val rType = right.select(rightCols.map(col): _*).schema
    // side ordering encodes the bound: inclusive puts right rows BEFORE
    // the left row at an equal ts (visible to it); strict flips them
    val (lSide, rSide) = if (strict) (0, 1) else (1, 0)
    val l2 = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(lSide).as("__side"),
        struct(left.columns.map(col).toSeq: _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val r2 = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(rSide).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(rightCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lSide)
      .select(left.columns.map(c => col(s"__l.`$c`").as(c)).toSeq ++
        rightCols.map(c => col(s"__m.`$c`").as(s"$c$suffix")): _*)
  }
}
