package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage: scans, filters, aggregates, joins, windows,
  * set ops, limits — the SURVEY §2.2/2.3/2.4/2.8 surface that maps to
  * built-in Catalyst operators (reference routes these through DataFusion:
  * `rust/lance/src/dataset/sql.rs:66-80`).
  *
  * Determinism rules (driver hash-compares vs DuckDB):
  *  - every float aggregate is round()ed; every query fully ORDER BY'd with a
  *    unique tie-breaker;
  *  - aggregate/computed columns aliased identically in Spark and oracle SQL.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String) = to_timestamp(lit(s))

  val queries: Map[String, Q] = Map(
    // TPC-H Q1: the flagship pipeline — filter → partial/final hash agg.
    // Reference: full-SQL aggregate path, rust/lance/src/dataset/sql.rs:119-210.
    "q1_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q6: tight filter → global agg; predicate fully pushed to parquet.
    "q6_filter_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

    // TPC-H Q3 shape: 3-way join + agg + top-k.
    "q3_join_topk" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-03-15 00:00:00"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1998-03-15 00:00:00"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // Broadcast-dim star join: region → nation → supplier rollup.
    "q_star_join" -> { (s, d) =>
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val su = Tables.supplier(s, d)
      su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"), round(sum(col("s_acctbal")), 2).as("total_bal"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // count_rows metadata fast path (reference scanner.rs:1496-1554).
    "q_count_rows" -> { (s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))
    },

    "q_count_filtered" -> { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_quantity") > 25)
        .agg(count(lit(1)).as("n"))
    },

    // DISTINCT (shuffle dedup).
    "q_distinct" -> { (s, d) =>
      Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },

    // Multi-column order_by w/ nulls + limit pushdown (TakeOrderedAndProject).
    "q_orderby_limit" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    // offset + limit.
    "q_offset_limit" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .offset(100).limit(10)
    },

    // Window: rank-per-group + running aggregate.
    "q_window_topk_per_group" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rk"))
    },

    "q_window_running_sum" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 50)
        .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Semi/anti joins (EXISTS / NOT EXISTS).
    "q_semi_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    "q_anti_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers_without_orders"))
    },

    // Outer join + null handling.
    "q_outer_join" -> { (s, d) =>
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"))
        .orderBy(col("n_name"))
    },

    // HAVING + expression predicates (LIKE / IN / CASE).
    "q_having" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").isin("PROMO", "ECONOMY") && col("p_name").like("%a%"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), round(avg(col("p_retailprice")), 2).as("avg_price"))
        .filter(col("n") > 5)
        .orderBy(col("p_brand"))
    },

    "q_case_expr" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 300000, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("bucket"))
    },

    // Set ops: UNION ALL / INTERSECT / EXCEPT.
    "q_union" -> { (s, d) =>
      val hi = Tables.customer(s, d).filter(col("c_acctbal") > 9000).select(col("c_custkey"))
      val lo = Tables.customer(s, d).filter(col("c_acctbal") < -900).select(col("c_custkey"))
      hi.union(lo).orderBy(col("c_custkey"))
    },

    "q_intersect" -> { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    },

    // ROLLUP grouping sets.
    "q_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "q_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Exact interpolated percentiles (Spark `percentile` == DuckDB
    // quantile_cont; percentile_approx is the approximate variant).
    "q_percentile" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
        .orderBy(col("l_returnflag"))
    },

    // Correlated-style subquery via join: customers spending above nation avg.
    "q_subquery_agg" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val natAvg = c.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      c.join(broadcast(natAvg), c("c_nationkey") === natAvg("nk"))
        .filter(col("c_acctbal") > col("nation_avg") * 1.8)
        .agg(count(lit(1)).as("n_rich"))
    },

    // Events: time-bucketed aggregation (hourly tumbling window, batch form).
    "q_events_hourly" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    },

    // Events: JSON extraction from props (§2.7 JSON surface).
    "q_events_json" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("k")), 4).as("avg_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },

    // AS-OF join (graft.operators.AsofJoin): each click's latest
    // prior-or-equal purchase by the same user — one key-partitioned
    // window, never a range join. DuckDB's native ASOF JOIN is the oracle.
    "q_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      // Pre-aggregate purchases to one row per (user_id, ts), keeping the
      // max event_id — DuckDB's native ASOF JOIN leaves the choice among
      // equal-ts right rows unspecified, so the gate pins the tie rule
      // explicitly on BOTH sides instead of relying on testdata having no
      // (user_id, ts) duplicates.
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_event_id"),
          round(max_by(col("value"), col("event_id")), 2).as("purchase_value"))
      graft.operators.AsofJoin.asofJoin(clicks, purchases, Seq("user_id"),
          "ts", "ts", Seq("purchase_event_id", "purchase_value"), suffix = "")
        .select(col("event_id"), col("user_id"),
          col("purchase_event_id"), col("purchase_value"))
        .orderBy(col("event_id"))
    },

    // Gap-based sessionization (graft.operators.Sessionize): per-user
    // sessions split at >6h gaps — one key-partitioned window (lag +
    // running sum), the batch twin of session_window. Oracle replays the
    // same lag/cumsum in DuckDB window SQL.
    "q_sessionize" -> { (s, d) =>
      val ev = Tables.events(s, d)
      // Session bounds emitted as BIGINT micros: the driver's hasher
      // renders raw-microsecond timestamps differently across engines,
      // so hash-proof them the same way the packs round() doubles.
      val tsType = ev.schema("ts").dataType
      graft.operators.Sessionize.sessions(ev, Seq("user_id"), "ts",
          gapSeconds = 21600L, tiebreak = Seq("event_id"))
        .select(col("user_id"), col("session_idx"),
          graft.operators.TimeMicros.micros(col("session_start"), tsType)
            .as("session_start_us"),
          graft.operators.TimeMicros.micros(col("session_end"), tsType)
            .as("session_end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_idx"))
    },

    // Interval containment join (graft.operators.IntervalJoin): clicks
    // inside a 5-minute window after an error by the same user — the
    // leveled binned equi-join, never a per-key cross product. DuckDB
    // runs the naive range join as the oracle.
    "q_interval_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts").as("win_start"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("win_end"))
      graft.operators.IntervalJoin.intervalJoin(clicks, errors, "ts",
          "win_start", "win_end", Seq("user_id"))
        .select(col("click_id"), col("error_id"))
        .orderBy(col("click_id"), col("error_id"))
    },

    // Interval-overlap join (graft.operators.IntervalJoin.overlapJoin):
    // 10-min windows after an error overlapping 5-min windows after a
    // purchase by the same user — decomposed into two disjoint
    // point-in-interval legs, never a per-key cross product.
    "q_overlap_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts").as("es"), (col("ts") + expr("INTERVAL 10 MINUTES")).as("ee"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("ps"), (col("ts") + expr("INTERVAL 5 MINUTES")).as("pe"))
      graft.operators.IntervalJoin.overlapJoin(errors, purchases,
          "es", "ee", "ps", "pe", Seq("user_id"))
        .select(col("error_id"), col("purchase_id"))
        .orderBy(col("error_id"), col("purchase_id"))
    },

    // Random access / take by id list (reference take.rs; §2.1).
    "q_take_by_id" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id").isin(3L, 17L, 42L, 99L, 123L, 250L, 499L))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey, o_orderdate,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_suppliers,
        | round(sum(s_acctbal),2) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_count_rows" -> "SELECT count(*) AS n FROM lineitem",
    "q_count_filtered" -> "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 25",
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_orderby_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_offset_limit" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey OFFSET 100 LIMIT 10""".stripMargin,
    "q_window_topk_per_group" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT count(*) AS n_customers_without_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_outer_join" ->
      """SELECT n_name, count(c_custkey) AS n_customers
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_having" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice),2) AS avg_price
        |FROM part
        |WHERE p_type IN ('PROMO','ECONOMY') AND p_name LIKE '%a%'
        |GROUP BY p_brand HAVING count(*) > 5 ORDER BY p_brand""".stripMargin,
    "q_case_expr" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |            WHEN o_totalprice < 300000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        | count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT c_custkey FROM customer WHERE c_acctbal < -900
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_extendedprice),2) AS rev
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.95),4) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_subquery_agg" ->
      """SELECT count(*) AS n_rich FROM customer c
        |JOIN (SELECT c_nationkey AS nk, avg(c_acctbal) AS nation_avg
        |      FROM customer GROUP BY c_nationkey) a ON c.c_nationkey = a.nk
        |WHERE c.c_acctbal > a.nation_avg * 1.8""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n, round(sum(value),2) AS total_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        | round(avg(CAST(json_extract_string(props,'$.k') AS BIGINT)),4) AS avg_k,
        | max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_take_by_id" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (3,17,42,99,123,250,499) ORDER BY doc_id""".stripMargin,
    // DuckDB's native ASOF JOIN validates the window-based formulation
    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, r.event_id AS purchase_event_id,
        |  round(r.value, 2) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(event_id) AS event_id,
        |    arg_max(value, event_id) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |) r ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY l.event_id""".stripMargin,
    // DuckDB replays the same lag/cumsum window formulation
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id, session_idx,
        |  epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts)) AS session_end_us, count(*) AS n_events
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    // DuckDB runs the naive overlap join the decomposition replaces
    "q_overlap_join" ->
      """SELECT l.event_id AS error_id, r.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'error') l
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id
        | AND l.ts <= r.ts + INTERVAL 5 MINUTE
        | AND r.ts <= l.ts + INTERVAL 10 MINUTE
        |ORDER BY error_id, purchase_id""".stripMargin,
    // DuckDB runs the naive range join the binned formulation replaces
    "q_interval_join" ->
      """SELECT l.event_id AS click_id, r.event_id AS error_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |JOIN (SELECT * FROM events WHERE event_type = 'error') r
        |  ON l.user_id = r.user_id
        | AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 5 MINUTE
        |ORDER BY click_id, error_id""".stripMargin
  )
}
