package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: pair every left POINT row with the
  * right INTERVAL rows that contain it (`start <= pt <= end`), optionally
  * within equality-key groups. Spark OSS has no range join — the naive
  * `l.pt BETWEEN r.start AND r.end` plan is a broadcast-nested-loop (or,
  * keyed, a per-key cross product): |L|·|R| candidate pairs before the
  * filter, the classic 100 TB blow-up.
  *
  * Shape — the leveled binned equi-join formulation; nothing is ever
  * driver-sized or quadratic:
  *  1. pick a fine bin width (default: the p95 interval length, from ONE
  *     single-row aggregate over the right side) — so a typical interval
  *     overlaps ~1–2 fine bins;
  *  2. assign each interval the smallest bin LEVEL k (width = fine ×
  *     `binsCap`^k) at which it spans ≤ ~`binsCap` bins — level 0 for
  *     all but degenerate outliers, so replication is capped per
  *     interval at EVERY level, and ≥ 4 levels cover any physical
  *     domain;
  *  3. per level present in the data (a metadata-sized driver list, ≤ 5
  *     values): explode intervals to their covered bins — the bin key is
  *     the bin's aligned START value `v - pmod(v, width)`, pure integer
  *     arithmetic, no division-exactness hazard — and equi-join points
  *     on (keys..., bin). A point's single bin per level meets each
  *     interval's replica AT MOST ONCE and every interval lives in
  *     exactly one level — containment pairs appear exactly once, NO
  *     dedup stage;
  *  4. filter each leg to true containment, union.
  *
  * Cost: one (keys, bin)-keyed shuffle per populated level (one, absent
  * outliers) + two metadata-sized aggregates on the interval side.
  * Candidate pairs are bounded by per-bin occupancy, never |L|·|R|;
  * skewed bins are ordinary equi-join skew (AQE splits them). The same
  * plan holds at any scale.
  */
object IntervalJoin {

  /** @param leftPt   left timestamp/numeric point column
    * @param rStart   right interval start column (inclusive)
    * @param rEnd     right interval end column (inclusive; rows with
    *                 end < start are dropped as empty)
    * @param on       equality keys present on BOTH sides (may be empty
    *                 for a pure range join)
    * @param binWidthMicros fine bin width; <= 0 auto-sizes to the p95
    *                 interval length (min 1)
    * @param suffix   appended to right column names that collide with
    *                 left ones (join keys excepted)
    */
  def intervalJoin(left: DataFrame, right: DataFrame, leftPt: String,
                   rStart: String, rEnd: String, on: Seq[String] = Nil,
                   binWidthMicros: Long = -1L,
                   suffix: String = "_r"): DataFrame = {
    // NTZ pins to UTC (see TimeMicros): the session zone is not a fixed
    // offset under DST, and bin arithmetic needs monotonicity
    def micros(df: DataFrame, c: String): Column =
      TimeMicros.micros(col(c), df.schema(c).dataType)
    // aligned bin start: exact floor alignment for any sign (pmod >= 0)
    def binOf(c: Column, w: Long): Column = c - pmod(c, lit(w))

    // rename right-side collisions FIRST so every later expression
    // resolves against one consistent set of names
    val lCols = left.columns.toSet
    def rename(c: String) = if (lCols.contains(c) && !on.contains(c)) s"$c$suffix" else c
    val rRen = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, rename(c)))
    val rs = rename(rStart); val re = rename(rEnd)
    val r1 = rRen.filter(col(re) >= col(rs))

    // ONE aggregate over the interval side supplies everything the
    // planner needs: the p95 width (fine bin sizing) and the span range
    // (populated-level bounds) — previously two full passes (a p95 job +
    // a levelsPresent distinct().collect()); at 100 TB the second pass
    // was a whole extra scan of the interval table per join call.
    val span = micros(r1, re) - micros(r1, rs)
    val stats = r1.select(
      percentile_approx(span, lit(0.95), lit(1000)).as("w"),
      min(span).as("mn"), max(span).as("mx")).head()
    val empty = stats.isNullAt(0)
    val fine: Long =
      if (binWidthMicros > 0) binWidthMicros
      else math.max(1L, if (empty) 1L else stats.getLong(0))
    val binsCap = 4096L
    // width per level, saturating long multiplication
    val maxLevel = 4
    val widths: IndexedSeq[Long] = (0 to maxLevel).scanLeft(fine) { (w, _) =>
      if (w > Long.MaxValue / binsCap) Long.MaxValue else w * binsCap
    }.take(maxLevel + 1).toIndexedSeq

    // smallest level k with span/width(k) <= binsCap, i.e. the largest k
    // such that span > binsCap * width(k-1) (= width(k)), else 0
    def levelOf(s: Long): Int =
      (1 to maxLevel).foldLeft(0)((acc, k) => if (s > widths(k)) k else acc)
    val levelCol = (1 to maxLevel).foldLeft(lit(0)) { (acc, k) =>
      when(span > widths(k), lit(k)).otherwise(acc)
    }
    val rl = r1.withColumn("__lvl", levelCol)
    // level assignment is monotone in span, so the populated levels lie
    // in [levelOf(min), levelOf(max)]; a leg whose level holds no
    // intervals explodes to zero rows and AQE's empty-relation
    // propagation eliminates the join at runtime — hashes unchanged
    val levels: Seq[Int] =
      if (empty) Seq(0)
      else levelOf(stats.getLong(1)) to levelOf(stats.getLong(2))

    val legs = levels.map { k =>
      val w = widths(k)
      val r = rl.filter(col("__lvl") === k).drop("__lvl")
      val exploded = r.withColumn("__bin",
        explode(sequence(binOf(micros(r, rs), w), binOf(micros(r, re), w),
          lit(w))))
      val l2 = left.withColumn("__bin", binOf(micros(left, leftPt), w))
      l2.join(exploded, (on :+ "__bin").toSeq, "inner")
        .filter(col(leftPt) >= col(rs) && col(leftPt) <= col(re))
        .drop("__bin")
    }
    legs.reduce(_ unionByName _)
  }

  /** Interval-OVERLAP join: pair left intervals `[lStart, lEnd]` with
    * right intervals `[rStart, rEnd]` that overlap them
    * (`lStart <= rEnd && rStart <= lEnd`), optionally within equality-key
    * groups — the interval×interval twin of [[intervalJoin]] (log-window
    * correlation, feature-window alignment).
    *
    * Decomposition instead of two-sided explosion: every overlapping pair
    * falls in exactly one of
    *  - `lStart` inside the right interval (`rStart <= lStart <= rEnd`) —
    *    a point-in-interval join probing with the left STARTS;
    *  - `rStart` STRICTLY inside the left interval
    *    (`lStart < rStart <= lEnd`) — the mirrored point-in-interval join.
    * The two legs are disjoint (the strict bound) and complete, so the
    * union is exactly-once with NO dedup stage — and each leg is the
    * leveled [[intervalJoin]], whose replication is capped on the INTERVAL
    * side only; points never explode, so a degenerate-long interval on
    * EITHER side stays bounded.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String, on: Seq[String] = Nil,
                  binWidthMicros: Long = -1L,
                  suffix: String = "_r"): DataFrame = {
    // rename right collisions ONCE; both legs then operate on disjoint
    // names and neither nested call renames anything further
    val lCols = left.columns.toSet
    def rename(c: String) = if (lCols.contains(c) && !on.contains(c)) s"$c$suffix" else c
    val rRen = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, rename(c)))
    val rs = rename(rStart); val re = rename(rEnd)
    val l1 = left.filter(col(lEnd) >= col(lStart))
    val r1 = rRen.filter(col(re) >= col(rs))
    val legA = intervalJoin(l1, r1, lStart, rs, re, on, binWidthMicros, suffix)
    val legB = intervalJoin(r1, l1, rs, lStart, lEnd, on, binWidthMicros, suffix)
      .filter(col(lStart) < col(rs))
    legA.unionByName(legB)
  }
}
