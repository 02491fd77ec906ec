package graft.operators

import graft.G
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational analytics over the TPC-H-ish star schema — additive beyond the
  * reference surface (SURVEY §2.11: the reference has no joins; a complete
  * engine needs them, and the 100 TB design notes live here).
  *
  * Join strategy at scale:
  *  - dimension tables (region/nation/part/supplier/customer) are broadcast —
  *    no shuffle of the fact table; `broadcast()` hints make it explicit
  *    rather than relying on the 10 MB autoBroadcast threshold.
  *  - fact-to-fact (lineitem ⋈ orders) shuffles on the join key once; AQE
  *    (enabled in Bench/Verify sessions) handles skew splitting at runtime.
  *  - aggregations go partial→final, so the shuffle carries pre-aggregated
  *    rows, not raw lineitems.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: the canonical scan→hash-agg. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        G.dsum(col("l_quantity")).as("sum_qty"),
        G.dsum(col("l_extendedprice")).as("sum_base_price"),
        G.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        G.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        (G.dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        (G.dsum(col("l_extendedprice")) / count(col("l_extendedprice")))
          .as("avg_price"),
        (G.dsum(col("l_discount")) / count(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Broadcast join: revenue per part brand. `part` is a dimension — the
    * broadcast hint keeps the lineitem scan shuffle-free. */
  def revenueByBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = G.table(spark, dir, "lineitem")
    val part = G.table(spark, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        G.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  val revenueByBrandSql: String =
    """SELECT p_brand,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Shuffle join + top-N: top 10 customers by order revenue. The orders
    * aggregation happens BEFORE the customer join, so only ~|customers| rows
    * reach the join — at 100 TB the pre-aggregation is the difference between
    * shuffling the fact table and shuffling a rollup. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val perCust = G.table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(G.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
    perCust
      .join(broadcast(G.table(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  val topCustomersSql: String =
    """SELECT c_custkey, c_name, revenue, n_orders
      |FROM (SELECT o_custkey,
      |        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |        count(*) AS n_orders
      |      FROM orders GROUP BY o_custkey) o
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin

  /** Multiway star join (TPC-H Q5 shape): revenue by nation for one region.
    * All dimensions broadcast; lineitem⋈orders is the only shuffle. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = G.table(spark, dir, "lineitem")
    val ord = G.table(spark, dir, "orders")
    val cust = G.table(spark, dir, "customer")
    val nat = G.table(spark, dir, "nation")
    val reg = G.table(spark, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(G.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val revenueByNationSql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Anti join: customers with no large order (> 400k), counted per nation.
    * `left_anti` = NOT EXISTS without a subquery re-scan; the filter lands on
    * the orders scan before the join. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = G.table(spark, dir, "customer")
    val bigOrders = G.table(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey"))
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_nationkey, count(*) AS n_customers
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 400000)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** As-of join — the canonical time-series operator Spark lacks natively
    * (spark_guide custom-op example). For each purchase event: the most
    * recent strictly-prior signup of the same user.
    *
    * Implementation is the scalable sort-merge union trick, not a range
    * join: tag both sides, union, one shuffle on the key, window
    * `last(_, ignoreNulls) over (rows unbounded preceding .. -1)` carries
    * the latest right-side row forward. O(n log n) per key vs the O(n·m)
    * of a range-condition join; at 100 TB this is one Exchange + one
    * spill-backed sort — the same shape as the detector fold.
    * Ordering (ts, is_right, id) makes equal-timestamp rows non-matching
    * (strict inequality) and deterministic. Oracle: DuckDB's native
    * ASOF JOIN over a deduped right side. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = G.eventsRaw(spark, dir)
      .withColumn("ms", expr("ts_ns DIV 1000000"))
    // right side: one signup per (user, ms) — max event_id breaks ties
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id"), col("ms"), col("signup_id"), lit(1).as("is_right"),
        lit(null).cast("long").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"),
        lit(null).cast("long").as("signup_id"), lit(0).as("is_right"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("is_right"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    signups.union(purchases)
      .withColumn("prior_signup", last(col("signup_id"), ignoreNulls = true).over(w))
      .withColumn("prior_ms", last(when(col("is_right") === 1, col("ms")),
        ignoreNulls = true).over(w))
      .filter(col("is_right") === 0 && col("prior_signup").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("prior_signup"), (col("ms") - col("prior_ms")).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |s AS (SELECT user_id, ms, max(event_id) AS signup_id
      |      FROM e WHERE event_type = 'signup' GROUP BY user_id, ms),
      |p AS (SELECT event_id, user_id, ms FROM e WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, s.signup_id AS prior_signup,
      |  p.ms - s.ms AS gap_ms
      |FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ms > s.ms
      |ORDER BY p.event_id""".stripMargin

  /** As-of join via the NATIVE custom operator (graft.plans.AsOfJoin:
    * LogicalPlan → Strategy → merge-join SparkPlan) — same semantics and
    * same DuckDB ASOF oracle as [[asofJoin]] (the compositional
    * union-window encoding, kept as the equivalence baseline). The native
    * plan shuffles each side once on the key and streams a single forward
    * merge per partition with one buffered right row — no union
    * materialization, no null-padded window carry. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = G.eventsRaw(spark, dir)
      .withColumn("ms", expr("ts_ns DIV 1000000"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id").as("s_user"), col("ms").as("s_ms"),
        col("signup_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    graft.plans.AsOfJoin.asof(purchases, signups,
        leftKey = "user_id", rightKey = "s_user",
        leftTime = "ms", rightTime = "s_ms")
      .select(col("event_id"), col("user_id"),
        col("signup_id").as("prior_signup"),
        (col("ms") - col("s_ms")).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  /** FORWARD as-of join — "next signup strictly AFTER each purchase" —
    * run through the SAME native backward-strict merge operator
    * ([[graft.plans.AsOfJoin]]) by time negation: backward-strict on
    * (−t) is exactly forward-strict on t (largest −s < −p ⟺ smallest
    * s > p). One extra projection on each side, zero new operator code,
    * and the merge-join scale shape (one keyed exchange per side, one
    * buffered right row per partition stream) is inherited unchanged.
    * Oracle: DuckDB's native `ASOF JOIN ... ON p.ms < s.ms` — an
    * independent implementation of the forward direction. */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = G.eventsRaw(spark, dir)
      .withColumn("ms", expr("ts_ns DIV 1000000"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id").as("s_user"), (-col("ms")).as("s_neg"),
        col("ms").as("s_ms"), col("signup_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"),
        (-col("ms")).as("p_neg"))
    graft.plans.AsOfJoin.asof(purchases, signups,
        leftKey = "user_id", rightKey = "s_user",
        leftTime = "p_neg", rightTime = "s_neg")
      .select(col("event_id"), col("user_id"),
        col("signup_id").as("next_signup"),
        (col("s_ms") - col("ms")).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  val asofJoinForwardSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |s AS (SELECT user_id, ms, max(event_id) AS signup_id
      |      FROM e WHERE event_type = 'signup' GROUP BY user_id, ms),
      |p AS (SELECT event_id, user_id, ms FROM e WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, s.signup_id AS next_signup,
      |  s.ms - p.ms AS gap_ms
      |FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ms < s.ms
      |ORDER BY p.event_id""".stripMargin

  /** MERGE INTO semantics as a batch operator (q_r25) — the lakehouse
    * upsert every CDC consumer ships (Delta/Iceberg `MERGE INTO target
    * USING delta ON key WHEN MATCHED [AND del] THEN DELETE / THEN UPDATE
    * WHEN NOT MATCHED THEN INSERT`). Spark's SQL MERGE needs a DSv2
    * row-level-operation table, so over plain parquet the operator IS
    * this plan: ONE full-outer keyed join of target and delta and a
    * per-row clause resolution — which is also exactly what Delta's MERGE
    * executes underneath. Complements q_p7 (latest-version-per-key apply
    * of a whole changelog): MERGE is the two-frame batch form with
    * explicit clause semantics.
    *
    * The delta is synthesized deterministically from the target (updates
    * for key%7=0, deletes for key%13=0 taking precedence, inserts as
    * fresh key+1000000 for key%11=0), so both engines construct the
    * identical merge input.
    *
    * Scale shape: one hash-keyed exchange per side (broadcast when the
    * delta is small — AQE decides); no window, no second pass. The
    * `action` column makes the clause chosen for every row part of the
    * hash-checked contract. */
  /** The snapshot the MERGE targets: (key, bal) off `customer`. */
  private[graft] def mergeTarget(spark: SparkSession, dir: String): DataFrame =
    G.table(spark, dir, "customer")
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))

  /** The deterministic merge input: (key, op ∈ d/u/i, new_bal). */
  private[graft] def mergeDelta(spark: SparkSession, dir: String): DataFrame = {
    val target = mergeTarget(spark, dir)
    val changes = target
      .filter(col("key") % 13 === 0 || col("key") % 7 === 0)
      .select(col("key"),
        when(col("key") % 13 === 0, "d").otherwise("u").as("op"),
        (col("bal") + lit(100.0)).as("new_bal"))
    val inserts = target.filter(col("key") % 11 === 0)
      .select((col("key") + 1000000L).as("key"), lit("i").as("op"),
        lit(0.0).as("new_bal"))
    changes.unionByName(inserts)
  }

  /** ONE MERGE application: clause resolution over the full-outer keyed
    * join — shared verbatim by the batch query and the foreachBatch
    * incremental maintenance (q_stream_merge), which is what makes
    * "stream of disjoint-key deltas == one batch MERGE" provable. */
  private[graft] def mergeStep(target: DataFrame, delta: DataFrame): DataFrame =
    target.join(delta, Seq("key"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "d") // WHEN MATCHED AND del THEN DELETE
      .select(col("key"),
        when(col("op") === "u", col("new_bal"))      // WHEN MATCHED THEN UPDATE
          .when(col("op") === "i", col("new_bal"))   // WHEN NOT MATCHED THEN INSERT
          .otherwise(col("bal")).as("bal"))

  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val target = mergeTarget(spark, dir)
    val delta = mergeDelta(spark, dir)
    target.join(delta, Seq("key"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "d")
      .select(col("key"),
        when(col("op") === "u", col("new_bal"))
          .when(col("op") === "i", col("new_bal"))
          .otherwise(col("bal")).as("bal"),
        when(col("op") === "u", "updated")
          .when(col("op") === "i", "inserted")
          .otherwise("kept").as("action"))
      .orderBy(col("key"))
  }

  val mergeUpsertSql: String =
    """WITH target AS (
      |  SELECT c_custkey AS key, c_acctbal AS bal FROM customer),
      |delta AS (
      |  SELECT key,
      |    CASE WHEN key % 13 = 0 THEN 'd' ELSE 'u' END AS op,
      |    bal + 100.0 AS new_bal
      |  FROM target WHERE key % 13 = 0 OR key % 7 = 0
      |  UNION ALL
      |  SELECT key + 1000000 AS key, 'i' AS op, 0.0 AS new_bal
      |  FROM target WHERE key % 11 = 0)
      |SELECT coalesce(t.key, d.key) AS key,
      |  CASE WHEN d.op IN ('u', 'i') THEN d.new_bal ELSE t.bal END AS bal,
      |  CASE WHEN d.op = 'u' THEN 'updated'
      |       WHEN d.op = 'i' THEN 'inserted'
      |       ELSE 'kept' END AS action
      |FROM target t FULL OUTER JOIN delta d ON t.key = d.key
      |WHERE coalesce(d.op, '') <> 'd'
      |ORDER BY key""".stripMargin

  /** Grouping-set aggregation (ROLLUP) — additive (SURVEY §2.11). Null
    * grouping keys are coalesced for cross-engine deterministic ordering. */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    G.table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), G.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(coalesce(col("l_returnflag"), lit("~")),
        coalesce(col("l_linestatus"), lit("~")))

  val rollupSummarySql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY coalesce(l_returnflag, '~'), coalesce(l_linestatus, '~')""".stripMargin

  /** Pivot — additive: per-returnflag revenue pivoted by linestatus.
    * Spark `pivot()` plans as conditional aggregation (one hash-agg, no
    * extra shuffle vs the groupBy), which is also exactly the SQL oracle. */
  def pivotRevenue(spark: SparkSession, dir: String): DataFrame =
    G.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(G.dsum(col("l_extendedprice")))
      .na.fill(0.0)
      .withColumnRenamed("F", "rev_f")
      .withColumnRenamed("O", "rev_o")
      .orderBy(col("l_returnflag"))

  val pivotRevenueSql: String =
    """SELECT l_returnflag,
      |  coalesce(CAST(SUM(CASE WHEN l_linestatus = 'F'
      |    THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS rev_f,
      |  coalesce(CAST(SUM(CASE WHEN l_linestatus = 'O'
      |    THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE), 0.0) AS rev_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Unpivot (wide → long) — the inverse surface of pivot; plans as a
    * single Expand over the aggregate, no extra shuffle. */
  def unpivotSummary(spark: SparkSession, dir: String): DataFrame = {
    val wide = G.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(G.dsum(col("l_quantity")).as("sum_qty"),
        G.dsum(col("l_extendedprice")).as("sum_price"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  val unpivotSummarySql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_price
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
      |ORDER BY l_returnflag, metric""".stripMargin

  /** Set operations (EXCEPT distinct) — additive: well-funded customers
    * with no large order. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val rich = G.table(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val bigOrderCusts = G.table(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    rich.except(bigOrderCusts).orderBy(col("c_custkey"))
  }

  val setOpsSql: String =
    """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
      |ORDER BY c_custkey""".stripMargin

  /** Window functions (additive; SURVEY §2.11 notes the reference lacks
    * them): per-supplier running revenue + rank, deterministic ordering. */
  def supplierRunningTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    G.table(spark, dir, "lineitem")
      .filter(col("l_suppkey") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("running_revenue",
        sum(col("l_extendedprice").cast("decimal(38,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .filter(col("rn") <= 20)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val supplierRunningTotalsSql: String =
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
      |    row_number() OVER w AS rn,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) OVER
      |      (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
      |  FROM lineitem WHERE l_suppkey <= 3
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |) t WHERE rn <= 20 ORDER BY l_suppkey, rn""".stripMargin

  /** Range (interval) join, binned — additive: Spark has no native range
    * join, and the naive formulation is a cross product with a theta filter.
    * The scale pattern: quantize both sides to coarse bins (intervals of
    * bounded duration expand to ≤ ceil(dur/bin)+1 bins), equi-join on the
    * bin, then apply the exact range predicate as a residual filter. The
    * shuffle/broadcast volume is O(events + intervals·span), never
    * O(events·intervals).
    *
    * Here: the 20 busiest hours (deterministic count-desc/hour-asc cut)
    * widened to [hour−30 min, hour+90 min) windows, joined back against all
    * events — overlapping windows, so the counts are not recoverable from
    * any single groupBy. The interval side is tiny → broadcast; the event
    * side is never shuffled until the final 20-group aggregate. */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    val HOUR = 3600000L
    val ev = G.eventsRaw(spark, dir)
      .select(expr("ts_ns DIV 1000000").as("ms"), col("user_id"))
    val hot = ev.groupBy(expr(s"ms DIV $HOUR").as("hr"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("hr"))
      .limit(20)
      .select((col("hr") * HOUR - HOUR / 2).as("window_start"),
        (col("hr") * HOUR + 3 * HOUR / 2).as("window_end"))
    val binsPerInterval = hot.withColumn("bin",
      explode(expr(s"sequence(window_start DIV $HOUR, (window_end - 1) DIV $HOUR)")))
    ev.withColumn("bin", expr(s"ms DIV $HOUR"))
      .join(broadcast(binsPerInterval), "bin")
      .filter(col("ms") >= col("window_start") && col("ms") < col("window_end"))
      .groupBy(col("window_start"), col("window_end"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_start"))
  }

  val rangeJoinBinnedSql: String =
    """WITH e AS (SELECT epoch_ms(ts) AS ms, user_id FROM events),
      |hot AS (
      |  SELECT ms // 3600000 AS hr, count(*) AS c FROM e
      |  GROUP BY 1 ORDER BY c DESC, hr LIMIT 20),
      |iv AS (
      |  SELECT hr * 3600000 - 1800000 AS window_start,
      |         hr * 3600000 + 5400000 AS window_end FROM hot)
      |SELECT iv.window_start, iv.window_end, count(*) AS n_events,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM iv JOIN e ON e.ms >= iv.window_start AND e.ms < iv.window_end
      |GROUP BY 1, 2 ORDER BY window_start""".stripMargin

  /** FULL OUTER join with genuinely unmatched sides: nations' rare
    * high-balance customers vs rare low-cost suppliers — either side can be
    * empty for a nation, exercising null-producing outer semantics.
    * `coalesce` keys + zero-filled counts keep ordering deterministic.
    * Scale: both inputs are pre-aggregated (25 rows max) before the join —
    * aggregate-then-join, never join-then-aggregate. */
  def outerJoinNations(spark: SparkSession, dir: String): DataFrame = {
    val cust = G.table(spark, dir, "customer")
      .filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_cust"))
    val supp = G.table(spark, dir, "supplier")
      .filter(col("s_acctbal") < -900)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_poor_supp"))
    cust.join(supp, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
        coalesce(col("n_poor_supp"), lit(0L)).as("n_poor_supp"))
      .orderBy(col("nationkey"))
  }

  val outerJoinNationsSql: String =
    """WITH c AS (
      |  SELECT c_nationkey AS nationkey, count(*) AS n_rich_cust
      |  FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
      |s AS (
      |  SELECT s_nationkey AS nationkey, count(*) AS n_poor_supp
      |  FROM supplier WHERE s_acctbal < -900 GROUP BY 1)
      |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      |  coalesce(n_rich_cust, 0) AS n_rich_cust,
      |  coalesce(n_poor_supp, 0) AS n_poor_supp
      |FROM c FULL OUTER JOIN s USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  /** LEFT SEMI + LEFT ANTI in one query: per-nation counts of suppliers
    * that did / did not ship any line in 1995. Semi/anti joins shuffle only
    * the distinct key set of the right side — the existence check never
    * materializes the match multiplicity. */
  def semiAntiSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val shipped95 = G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_suppkey"))
    val supp = G.table(spark, dir, "supplier")
    val active = supp.join(shipped95, col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_active"))
    val idle = supp.join(shipped95, col("s_suppkey") === col("l_suppkey"),
        "left_anti")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_idle"))
    active.join(idle, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_idle"), lit(0L)).as("n_idle"))
      .orderBy(col("nationkey"))
  }

  val semiAntiSuppliersSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT l_suppkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-01-01'),
      |a AS (
      |  SELECT s_nationkey AS nationkey, count(*) AS n_active FROM supplier
      |  WHERE EXISTS (SELECT 1 FROM sh WHERE sh.l_suppkey = supplier.s_suppkey)
      |  GROUP BY 1),
      |i AS (
      |  SELECT s_nationkey AS nationkey, count(*) AS n_idle FROM supplier
      |  WHERE NOT EXISTS (SELECT 1 FROM sh WHERE sh.l_suppkey = supplier.s_suppkey)
      |  GROUP BY 1)
      |SELECT coalesce(a.nationkey, i.nationkey) AS nationkey,
      |  coalesce(n_active, 0) AS n_active, coalesce(n_idle, 0) AS n_idle
      |FROM a FULL OUTER JOIN i USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  /** Scalar + correlated subqueries — the remaining SQL-surface family:
    * customers whose account balance exceeds their nation's average
    * (correlated per-nation aggregate) and the global average (scalar
    * subquery). Expressed via spark.sql so Catalyst's subquery decorrelation
    * does the rewrite (correlated agg → join with a grouped subquery;
    * scalar subquery → single-row broadcast) — the declarative form scales
    * to the decorrelated join plan automatically. */
  def subqueryRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    G.table(spark, dir, "customer").createOrReplaceTempView("customer_sq")
    // decimal-exact means (not avg(double)): the subquery result feeds a >
    // comparison, so the cross-engine float-sum order invariant applies
    spark.sql(subqueryRichCustomersSql.replace("FROM customer", "FROM customer_sq"))
  }

  val subqueryRichCustomersSql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS VARCHAR(38)) AS DOUBLE)
      |                          / COUNT(c2.c_acctbal)
      |                   FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)
      |  AND c_acctbal > (SELECT CAST(CAST(SUM(CAST(c3.c_acctbal AS DECIMAL(38,6))) AS VARCHAR(38)) AS DOUBLE)
      |                          / COUNT(c3.c_acctbal)
      |                   FROM customer c3)
      |ORDER BY c_custkey""".stripMargin

  /** CUBE grouping sets — additive, completing the rollup/cube/grouping-sets
    * family (same Expand-based plan as rollup, all 4 grouping combinations). */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame =
    G.table(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), G.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(coalesce(col("l_returnflag"), lit("~")),
        coalesce(col("l_linestatus"), lit("~")))

  val cubeSummarySql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY coalesce(l_returnflag, '~'), coalesce(l_linestatus, '~')""".stripMargin

  /** Analytic window-function surface over per-customer order history:
    * lag/lead (prev/next order price), ntile quartile, percent_rank and
    * first_value — the dashboard "customer journey" shapes
    * (ref: per-user panels, docs/05-clickhouse-grafana.md). One shuffle on
    * o_custkey serves all five functions (same partitioning + ordering, so
    * Catalyst collapses them into a single Window operator — no repeated
    * exchange). percent_rank's (rank-1)/(n-1) division over small integers
    * is the same double on any engine, so the output is hash-exact. */
  def windowFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    G.table(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        first_value(col("o_orderkey")).over(w).as("first_key"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val windowFunctionsSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  first_value(o_orderkey) OVER w AS first_key
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Explicit GROUPING SETS with grouping() flags — the fourth member of the
    * rollup/cube family, via the SQL surface (the set list is asymmetric:
    * by-status, by-priority, and grand total — NOT expressible as rollup or
    * cube). grouping() flags disambiguate a real NULL key from a
    * superaggregate row; cast to BIGINT so both engines agree on the type. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    G.table(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority,
        |  coalesce(o_orderstatus, '~'), coalesce(o_orderpriority, '~')""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
      |  count(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority,
      |  coalesce(o_orderstatus, '~'), coalesce(o_orderpriority, '~')""".stripMargin

  /** Recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4) —
    * hierarchical subtree rollup. The hierarchy is the decimal-prefix tree
    * over c_custkey (parent = floor(key/10)): every customer contributes its
    * order count and revenue to each ancestor, so the query answers "total
    * revenue under subtree root N" for every internal node — the org-chart /
    * category-tree rollup shape that plain GROUP BY cannot express.
    *
    * Execution shape (scale): Spark plans the recursion as semi-naive
    * UnionLoop — each round maps ONLY the previous increment (one narrow
    * projection + filter per round, no re-scan of the anchor), and depth is
    * O(log10 keyspace) ≈ 6 rounds, independent of row count. The pre-agg
    * `per_cust` collapses orders per key BEFORE the hierarchy join, so the
    * join input is dimension-sized; the revenue SUM stays DECIMAL(38,6)
    * through both aggregation levels (associative ⇒ rollup lossless, same
    * invariant as q_a12).
    *
    * Spark guards runaway recursion with `spark.sql.cteRecursionRowLimit`
    * (default 1 M rows) — this query's recursion emits customers ×
    * key-digit-depth rows, which crossed the default at the 10× scale
    * rehearsal (150 k customers × 10-digit shifted keys). The limit is a
    * safety rail, not semantics, so the operator sizes it from its own
    * inputs: customers × 21 (19 decimal digits of a BIGINT key + anchor +
    * margin), floored at the default.
    *
    * Oracle: textually identical SQL in DuckDB (same WITH RECURSIVE
    * semantics, floor-division parent function, decimal sums). */
  def recursiveSubtreeRollup(spark: SparkSession, dir: String): DataFrame = {
    // the raised recursion row-limit is sized to THIS corpus and must not
    // leak: the returned frame executes later, so the conf cannot simply be
    // restored here, and a permanent set would leave the runaway-recursion
    // safety rail raised for every subsequent query in a long-lived
    // bench/verify session (and race with concurrent verify workers). A
    // cloned session shares the SparkContext and cache but isolates conf
    // and temp views — the frame carries the clone, so the limit applies
    // exactly to this query's execution and nothing else.
    val s2 = spark.newSession()
    val cust = G.table(s2, dir, "customer")
    cust.createOrReplaceTempView("customer_rc")
    G.table(s2, dir, "orders").createOrReplaceTempView("orders_rc")
    s2.conf.set("spark.sql.cteRecursionRowLimit",
      math.max(1000000L, cust.count() * 21).toString)
    s2.sql(recursiveSubtreeRollupSql
      .replace("FROM customer", "FROM customer_rc")
      .replace("FROM orders", "FROM orders_rc"))
  }

  val recursiveSubtreeRollupSql: String =
    """WITH RECURSIVE anc AS (
      |  SELECT c_custkey AS node, c_custkey AS anc FROM customer
      |  UNION ALL
      |  SELECT node, CAST(floor(anc / 10) AS BIGINT) AS anc
      |  FROM anc WHERE anc > 0
      |),
      |per_cust AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |         SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT a.anc AS subtree_root,
      |       count(DISTINCT a.node) AS n_custs,
      |       CAST(SUM(p.n_orders) AS BIGINT) AS n_orders,
      |       CAST(SUM(p.rev) AS DOUBLE) AS revenue
      |FROM anc a JOIN per_cust p ON a.node = p.o_custkey
      |GROUP BY a.anc
      |ORDER BY subtree_root""".stripMargin

  /** Salted skew join (q_r20): supplier revenue through [[Skew.saltedJoin]]
    * — the named skew lever run as a first-class checked query, not just a
    * property test. Each lineitem suppkey is split over 8 salt sub-keys
    * (deterministic `pmod(hash(l_orderkey), 8)`), the supplier side is
    * replicated ×8, and the join keys on (suppkey, salt) — a hot supplier's
    * rows land on 8 reducers instead of one straggler. The result is
    * EXACTLY the plain join (salting is join-key refinement), which is what
    * the plain-SQL oracle checks. Use when the skewed side feeds an
    * aggregation the planner can't see past or the join is planned
    * broadcast-free on a mis-estimated side; AQE handles the cases it can
    * observe. */
  def saltedSupplierRevenue(spark: SparkSession, dir: String,
      factor: Int = 8): DataFrame = {
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    val sup = G.table(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    Skew.saltedJoin(li, sup, Seq("suppkey"), saltOn = col("l_orderkey"),
        factor = factor)
      .groupBy(col("s_nationkey"))
      .agg(
        G.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_nationkey"))
  }

  val saltedSupplierRevenueSql: String =
    """SELECT s_nationkey,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** q_r21: time-RANGE window frame — per-user trailing-10-minute moving
    * average/count over the event stream (`RANGE BETWEEN 600 PRECEDING AND
    * CURRENT ROW` on epoch seconds). The frame is VALUE-based, not
    * row-based: Spark's WindowExec slides both frame bounds monotonically
    * forward per partition (each row enters/leaves the running aggregate
    * once — O(n) per partition, not O(n × frame)), after the single hash
    * exchange on the user key. The moving sum goes through the
    * DECIMAL(38,6) cast on both engines (G.dsum contract), and the frame
    * bound arithmetic is integer seconds — no float drift in frame
    * membership. */
  def slidingTimeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec")).rangeBetween(-600L, 0L)
    G.eventsRaw(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns DIV 1000000000").as("ts_sec"), col("value"))
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .over(w).cast("double") / count(col("value")).over(w))
          .as("avg_10m"),
        count(lit(1)).over(w).as("n_10m"))
      .orderBy(col("event_id"))
  }

  val slidingTimeWindowSql: String =
    """SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_sec,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
      |    / COUNT(value) OVER w AS avg_10m,
      |  COUNT(*) OVER w AS n_10m
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000
      |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q_r22: bloom-filtered join — the explicit form of the semi-join
    * reduction Spark's own `InjectRuntimeFilter` applies when thresholds
    * and plan shape allow. A bloom filter built from the SELECTIVE side's
    * join keys (urgent orders, ~1/5 of orders) is broadcast and probed at
    * the fact scan, so most lineitem rows die BEFORE the join's exchange —
    * at 100 TB that is the difference between shuffling the full fact
    * table and shuffling the ~20% that can match. False positives
    * (fpp 1%) pass the bloom but are removed by the real join, so the
    * result is EXACTLY the plain join's — which is what the DuckDB oracle
    * runs. The probe is a broadcast-closure UDF because Spark exposes no
    * public might_contain; it mirrors the internal
    * `BloomFilterMightContain` runtime-filter probe.
    *
    * Build cost: one pass over the dim keys (`stat.bloomFilter` runs a
    * treeAggregate; the driver holds one ~1 MB sketch, never the keys). */
  def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = G.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val nKeys = math.max(orders.count(), 1000L)
    val bloom = orders.stat.bloomFilter("o_orderkey", nKeys, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val probe = udf((k: Long) => bc.value.mightContain(k))
    G.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
      .filter(probe(col("l_orderkey")))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        G.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val bloomJoinSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q_r23: GROUPED ORDER STATISTICS — per-nation order-value quartiles
    * (q1/median/q3) plus min/max/count, one sort-based aggregate over the
    * orders⋈customer⋈nation join. percentile_disc picks OBSERVED values
    * (no interpolation), so the doubles are bit-identical cross-engine —
    * the a10/c20 exact-order-statistic path extended to grouped keys.
    * Nation/customer dims broadcast; the only exchange keys the
    * aggregation on nation. */
  def groupedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val o = G.table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    val c = G.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val n = G.table(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("q1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("median"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("q3"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("n_name"))
  }

  val groupedQuantilesSql: String =
    """SELECT n_name, count(*) AS n_orders,
      |  min(o_totalprice) AS min_price,
      |  quantile_disc(o_totalprice, 0.25) AS q1,
      |  quantile_disc(o_totalprice, 0.5) AS median,
      |  quantile_disc(o_totalprice, 0.75) AS q3,
      |  max(o_totalprice) AS max_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q_r26: TPC-H Q3-shaped SHIPPING PRIORITY — top-10 unshipped orders of
    * one market segment by outstanding revenue. The canonical 3-table
    * selective-join shape: segment filter pushes into the customer scan,
    * both date filters push into their scans, customer broadcasts
    * (dimension), and the orders⋈lineitem join pre-filters BOTH sides
    * before the one keyed shuffle; the top-10 runs as
    * TakeOrderedAndProject (per-partition heaps), never a global sort.
    * Revenue sums through DECIMAL(38,6) (G.dsum) for oracle parity. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-06-01").cast("timestamp")
    val cust = G.table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = G.table(spark, dir, "orders")
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(G.dsum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q_r27: TPC-H Q17-shaped small-quantity revenue — revenue locked up in
    * lineitems whose quantity is below 20% of their part's average, by brand.
    * The textbook form is a CORRELATED scalar subquery (per-part avg); the
    * scale-correct Spark plan decorrelates it to a WINDOW average over
    * `partition by l_partkey`: one keyed shuffle, one pass over lineitem, no
    * second scan and no self-join (the agg+rejoin alternative scans lineitem
    * twice). The DuckDB oracle keeps the correlated form, so the two engines
    * check each other through INDEPENDENT formulations. Quantities are
    * integral (1..50), so the double window-avg is order-independent and
    * bit-exact on both engines. `part` stays broadcast (dimension). */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("part_avg_qty", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("part_avg_qty"))
    val part = G.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small_lines"),
        G.dsum(col("l_extendedprice")).as("locked_revenue"))
      .orderBy(col("p_brand"))
  }

  val smallQtyRevenueSql: String =
    """SELECT p_brand, COUNT(*) AS n_small_lines,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |    AS locked_revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity < 0.2 * (
      |  SELECT AVG(l2.l_quantity) FROM lineitem l2
      |  WHERE l2.l_partkey = lineitem.l_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q_r28: LATERAL top-k — each customer's 3 highest-value orders through a
    * correlated LATERAL subquery, the SQL surface Spark resolves via its
    * DomainJoin/decorrelation rewrite (and DuckDB via its own lateral-join
    * operator — again two independent engines' formulations of one query).
    * The rewritten plan is a keyed window top-k, NOT a per-customer nested
    * loop: one shuffle on the join key, per-partition heaps, scale-safe.
    * Ties on o_totalprice break on o_orderkey so top-3 is deterministic. */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val tag = s"r28_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    G.table(spark, dir, "customer").createOrReplaceTempView(s"cust_$tag")
    G.table(spark, dir, "orders").createOrReplaceTempView(s"ord_$tag")
    spark.sql(
      s"""SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
         |FROM cust_$tag, LATERAL (
         |  SELECT o_orderkey, o_totalprice FROM ord_$tag
         |  WHERE o_custkey = c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
         |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  val lateralTopOrdersSql: String =
    """SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** q_r29: TPC-H Q22-shaped sales opportunity — customers with
    * above-average positive balance and no orders since 2000-09-01 (lapsed
    * high-balance accounts), by market segment. The
    * scalar threshold (one row) joins in by broadcast-cross rather than a
    * driver-side collect, and the no-orders test is a LEFT ANTI join (the
    * plan NOT EXISTS decorrelates to). `orders` projects to its key only
    * before the anti join, so the exchange carries 8 bytes a row. */
  def salesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val cust = G.table(spark, dir, "customer")
    val thresh = cust.filter(col("c_acctbal") > 0)
      .agg((G.dsum(col("c_acctbal")) / count(col("c_acctbal")))
        .as("avg_bal"))
    val rich = cust.join(broadcast(thresh))
      .filter(col("c_acctbal") > col("avg_bal"))
    val ordKeys = G.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-09-01").cast("timestamp"))
      .select(col("o_custkey"))
    rich.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        G.dsum(col("c_acctbal")).as("total_balance"))
      .orderBy(col("c_mktsegment"))
  }

  val salesOpportunitySql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |    AS total_balance
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |      / COUNT(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2000-09-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q_r30: TPC-H Q4-shaped priority audit — orders with at least one
    * lineitem shipped more than 60 days after the order date, counted by
    * priority. The EXISTS becomes a LEFT SEMI join whose condition mixes the
    * equi-key (orderkey — drives the one shuffle) with the date inequality
    * (evaluated as a join residual, never a cartesian); lineitem projects to
    * (orderkey, shipdate) before the exchange. */
  def latePriorityAudit(spark: SparkSession, dir: String): DataFrame = {
    val ord = G.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val latePriorityAuditSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_late_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q_r31: TPC-H Q5-shaped local-supplier volume — revenue per nation from
    * lineitems where the supplier sits in the customer's own nation. The
    * canonical star join: region→nation→customer and supplier are broadcast
    * dimensions; orders⋈lineitem is the one fact-to-fact shuffle; the
    * local-supplier condition (s_nationkey = c_nationkey) evaluates as a
    * residual on the already-joined row, never a second shuffle. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val y0 = lit("1997-01-01").cast("timestamp")
    val y1 = lit("1998-01-01").cast("timestamp")
    val nat = G.table(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val cust = G.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val sup = G.table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = G.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(G.dsum(col("rev")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE s_nationkey = c_nationkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q_r32: TPC-H Q6-shaped revenue forecast — the pure scan→filter→agg
    * probe: one year of shipments in a quantity/discount band, no join at
    * all. The whole query is a single pass whose predicates ALL push into
    * the parquet scan; at 100 TB its cost is I/O on three columns. The
    * discount band uses exact binary-representable bounds (0.05/0.07 read
    * back from float literals differ engine-to-engine; >= 0.05 − 1e-9 style
    * fudge is banned here — instead the band compares against the same
    * decimal literals both engines parse identically). */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(G.dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n_lines"))

  val revenueForecastSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** q_r33: TPC-H Q10-shaped returned-item reporting — top-20 customers by
    * revenue lost to returns in one quarter. orders pre-filters to the
    * quarter BEFORE its join (the selective side drives), lineitem
    * pre-filters to returnflag='R'; customer and nation broadcast onto the
    * aggregated result (post-agg enrichment: the keyed shuffle carries
    * custkey+revenue, never name/segment strings). Top-20 runs as
    * TakeOrderedAndProject. */
  def returnedItemReport(spark: SparkSession, dir: String): DataFrame = {
    val q0 = lit("1997-10-01").cast("timestamp")
    val q1 = lit("1998-01-01").cast("timestamp")
    val ord = G.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= q0 && col("o_orderdate") < q1)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = G.table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val perCust = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(G.dsum(col("rev")).as("revenue"), count(lit(1)).as("n_lines"))
    val cust = G.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"))
    val nat = G.table(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    perCust.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name"), col("revenue"), col("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemReportSql: String =
    """SELECT c_custkey, c_name, c_mktsegment, n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM orders
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_mktsegment, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** q_r34: TPC-H Q19-shaped disjunctive-predicate join — revenue from
    * three (brand, size-range, quantity-range) clauses OR-ed together. The
    * wrong plan evaluates the disjunction as a post-join filter over the
    * full lineitem⋈part product; the right one pushes the common
    * conjuncts (quantity bound, size floor) into both scans and broadcasts
    * part, leaving the OR as a cheap residual. Catalyst does exactly that
    * once the predicate is written as (common) AND (disjunction). */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = G.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val clause = (col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" &&
        col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" &&
        col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    li.filter(col("l_quantity") <= 30)
      .join(broadcast(part.filter(col("p_size") >= 1)),
        col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .groupBy(col("p_brand"))
      .agg(G.dsum(col("rev")).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  val disjunctiveRevenueSql: String =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q_r35: TPC-H Q7-shaped volume shipping — bilateral trade between two
    * nations by year: lineitems whose supplier sits in one nation and
    * customer in the other, either direction. The nation filters push into
    * the BROADCAST dimension builds (tiny), which then act as semi-join
    * reducers on the fact rows; the only shuffle is orders⋈lineitem.
    * year() on the ship date is GROUP-BY material computed post-join. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val y0 = lit("1997-01-01").cast("timestamp")
    val y1 = lit("1999-01-01").cast("timestamp")
    val nat = G.table(spark, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = G.table(spark, dir, "customer")
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val sup = G.table(spark, dir, "supplier")
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = G.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= y0 && col("l_shipdate") < y1)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(G.dsum(col("rev")).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val volumeShippingSql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation cn ON cn.n_nationkey = c_nationkey
      |JOIN nation sn ON sn.n_nationkey = s_nationkey
      |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      |  AND cn.n_name IN ('NATION_1', 'NATION_2')
      |  AND sn.n_name <> cn.n_name
      |  AND l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1999-01-01'
      |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** q_r36: TPC-H Q8-shaped market share — of all revenue shipped to ASIA
    * customers over two years, the fraction supplied by NATION_2, by year.
    * The share is a CONDITIONAL-AGGREGATE RATIO (sum(case)/sum) — one
    * aggregation, no self-join, the shape reporting stacks reach for
    * whenever they say "share of". Numerator and denominator both sum
    * through DECIMAL, then divide once in double — hash-exact. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val y0 = lit("1997-01-01").cast("timestamp")
    val y1 = lit("1999-01-01").cast("timestamp")
    val asiaNat = G.table(spark, dir, "nation")
      .join(G.table(spark, dir, "region")
          .filter(col("r_name") === "ASIA").select(col("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = G.table(spark, dir, "customer")
      .join(asiaNat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supNat = G.table(spark, dir, "supplier")
      .join(G.table(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = G.table(spark, dir, "orders")
      .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        G.dsum(when(col("supp_nation") === "NATION_2", col("rev"))
          .otherwise(0.0)).as("nation_rev"),
        G.dsum(col("rev")).as("total_rev"),
        count(lit(1)).as("n_lines"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy(col("o_year"))
  }

  val marketShareSql: String =
    """WITH j AS (
      |  SELECT year(o_orderdate) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS rev,
      |    sn.n_name AS supp_nation
      |  FROM orders
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation cn ON cn.n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = cn.n_regionkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation sn ON sn.n_nationkey = s_nationkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1999-01-01')
      |SELECT CAST(o_year AS INT) AS o_year,
      |  CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_2' THEN rev
      |    ELSE 0.0 END AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS nation_rev,
      |  CAST(CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_rev,
      |  COUNT(*) AS n_lines,
      |  CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_2' THEN rev
      |    ELSE 0.0 END AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) /
      |    CAST(CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS mkt_share
      |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin

  /** q_r37: TPC-H Q18-shaped large-volume customers — orders whose total
    * quantity tops 250 units, with their customer, ranked by order value.
    * The HAVING-on-fact-agg runs FIRST (partial→final on orderkey, output
    * a few thousand keys), then joins back to orders and a broadcast
    * customer; the big table is aggregated before anything is joined —
    * never the other way around. Quantities are integral doubles, so the
    * HAVING threshold is exact. */
  def largeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = G.table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(G.dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250)
    val ord = G.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val cust = G.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    bigOrders.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val largeVolumeCustomersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |      AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) > 250)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  total_qty
      |FROM big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** q_r38: TPC-H Q9-shaped product-margin — profit per supplier nation
    * per year, margin = discounted revenue minus catalog cost
    * (p_retailprice × quantity stands in for partsupp supplycost, which
    * this schema does not carry). part and supplier⋈nation broadcast; the
    * one fact-to-fact shuffle joins lineitem to orders for the order year;
    * the margin expression folds into the scan projection. */
  def productMargin(spark: SparkSession, dir: String): DataFrame = {
    val part = G.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"))
    val supNat = G.table(spark, dir, "supplier")
      .join(G.table(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord = G.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(G.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.1))
          .as("margin"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year"))
  }

  val productMarginSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    - p_retailprice * l_quantity * 0.1 AS DECIMAL(38,6)))
      |    AS DOUBLE) AS margin,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year""".stripMargin

  /** q_r39: TPC-H Q16-shaped supplier diversity — how many DISTINCT
    * suppliers serve each (brand, size-band), observed from actual trade
    * (lineitem supplies the part↔supplier relation this schema keeps).
    * The pre-aggregation DISTINCT runs on (partkey, suppkey) pairs BEFORE
    * the brand rollup, so the count-distinct shuffle carries two longs —
    * the wrong plan count-distincts strings post-broadcast. */
  def supplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val rel = G.table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val part = G.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        (col("p_size") - pmod(col("p_size"), lit(10))).as("size_band"))
    rel.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("size_band"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("p_brand"), col("size_band"))
  }

  val supplierDiversitySql: String =
    """WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_size - (p_size % 10) AS size_band,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  COUNT(DISTINCT l_partkey) AS n_parts
      |FROM rel JOIN part ON p_partkey = l_partkey
      |GROUP BY p_brand, p_size - (p_size % 10)
      |ORDER BY p_brand, size_band""".stripMargin

  /** q_r40: TPC-H Q21-shaped waiting-supplier audit — suppliers who were
    * the LAST to ship on a multi-supplier open order: an EXISTS (another
    * supplier on the same order) and a NOT EXISTS (another supplier
    * shipping later) composed on one keyed frame. Both quantifiers resolve
    * against per-order extremes computed in a single window pass over
    * lineitem (max shipdate, distinct-supplier count) — no triple
    * self-join; the shuffle key is l_orderkey throughout, so the window
    * and the semi-join reuse one partitioning. */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
    val li = G.table(spark, dir, "lineitem")
      .join(G.table(spark, dir, "orders")
          .filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .withColumn("max_ship", max(col("l_shipdate")).over(w))
      .withColumn("n_supps", size(collect_set(col("l_suppkey")).over(w)))
    val waiting = li
      .filter(col("n_supps") > 1 && col("l_shipdate") === col("max_ship"))
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_orderkey")).as("n_waiting_orders"))
    waiting.join(broadcast(G.table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
      col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waiting_orders"))
      .orderBy(col("n_waiting_orders").desc, col("s_suppkey"))
      .limit(25)
  }

  val waitingSuppliersSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate,
      |    max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
      |    COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
      |      AS n_supps
      |  FROM lineitem
      |  WHERE l_orderkey IN
      |    (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')),
      |wt AS (
      |  SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS n_waiting_orders
      |  FROM li WHERE n_supps > 1 AND l_shipdate = max_ship
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, n_waiting_orders
      |FROM wt JOIN supplier ON s_suppkey = l_suppkey
      |ORDER BY n_waiting_orders DESC, s_suppkey LIMIT 25""".stripMargin

  /** q_r41: TPC-H Q2-shaped MIN-COST SUPPLIER — for each mid-size LARGE
    * part, the European supplier(s) quoting the lowest observed unit price.
    * This schema has no partsupp, so the supplying relation and its cost
    * derive from trade: per (part, supplier) the MINIMUM observed
    * `l_extendedprice / l_quantity`. The textbook correlated MIN subquery
    * is DECORRELATED to a window MIN over `l_partkey` on the
    * region-filtered frame: the per-pair agg shuffles (partkey, suppkey)
    * once, the window re-keys on partkey, and every dimension (part,
    * supplier⋈nation⋈region) broadcasts — the fact table never joins
    * through an exchange. The DuckDB oracle keeps the correlated form, so
    * the engines cross-check through independent formulations. Unit cost
    * is one double division per row and MIN is selection (not
    * accumulation), so the equality predicate compares bit-identical
    * doubles on both engines. The part filter only removes whole partkey
    * groups, so it commutes with the window and runs as a broadcast
    * semi-reducer BEFORE it. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val cost = G.table(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val eu = G.table(spark, dir, "supplier")
      .join(broadcast(G.table(spark, dir, "nation")),
        col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(G.table(spark, dir, "region"))
          .filter(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val part = G.table(spark, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .select(col("p_partkey"), col("p_brand"))
    val w = Window.partitionBy(col("l_partkey"))
    cost.join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .withColumn("min_cost", min(col("unit_cost")).over(w))
      .filter(col("unit_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val minCostSupplierSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
      |FROM cost JOIN eu ON s_suppkey = l_suppkey
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
      |  AND unit_cost = (
      |    SELECT MIN(c2.unit_cost) FROM cost c2
      |    JOIN eu e2 ON e2.s_suppkey = c2.l_suppkey
      |    WHERE c2.l_partkey = cost.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** q_r42: TPC-H Q11-shaped IMPORTANT PARTS — parts whose European-
    * supplied trade value exceeds a fixed fraction of the total. The
    * global total is the classic scalar subquery; here it aggregates the
    * ALREADY-AGGREGATED per-part frame and joins back as a broadcast
    * one-row frame (no collect, no single-partition window over the fact
    * data). The per-part subtree appears in both branches of the cross
    * join, so Spark's ReuseExchange executes the lineitem scan + keyed agg
    * ONCE (pinned in Round10OpsSpec). Both the per-part value and the
    * re-total go through DECIMAL(38,6), so the threshold compares
    * bit-identical doubles on both engines. */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val eu = G.table(spark, dir, "supplier")
      .join(broadcast(G.table(spark, dir, "nation")),
        col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(G.table(spark, dir, "region"))
          .filter(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("s_suppkey"))
    val pv = G.table(spark, dir, "lineitem")
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(G.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("value"))
    val tot = pv.agg(G.dsum(col("value")).as("total_value"))
    pv.crossJoin(broadcast(tot))
      .filter(col("value") > lit(0.0005) * col("total_value"))
      .select(col("l_partkey"), col("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val importantPartsSql: String =
    """WITH eu AS (
      |  SELECT s_suppkey FROM supplier
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'EUROPE'),
      |pv AS (
      |  SELECT l_partkey,
      |    CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS value
      |  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM eu)
      |  GROUP BY l_partkey)
      |SELECT l_partkey, value FROM pv
      |WHERE value > 0.0005 * (
      |  SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) FROM pv)
      |ORDER BY value DESC, l_partkey""".stripMargin

  /** q_r43: TPC-H Q12-shaped SHIPPING-DELAY AUDIT — high- vs low-priority
    * line counts per delay band (this schema has no shipmode; the band is
    * derived from order-to-ship days, keeping Q12's essence: a fact-fact
    * join feeding CASE-conditional counts grouped by a derived category).
    * Both sides project to the join key + the two columns the conditional
    * needs BEFORE the one orderkey shuffle; the band computation and both
    * counts fold into the partial aggregation, so the final exchange
    * carries three rows per partition. Day difference is integer calendar
    * arithmetic (`datediff` ≡ DuckDB `date_diff('day', …)` on
    * midnight-aligned timestamps). */
  def shippingDelayBands(spark: SparkSession, dir: String): DataFrame = {
    val ord = G.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = G.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate"), col("o_orderdate")))
      .withColumn("delay_band",
        when(col("delay_days") <= 30, "FAST")
          .when(col("delay_days") <= 60, "MEDIUM")
          .otherwise("SLOW"))
      .groupBy(col("delay_band"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("delay_band"))
  }

  val shippingDelayBandsSql: String =
    """SELECT
      |  CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
      |         THEN 'FAST'
      |       WHEN date_diff('day', o_orderdate, l_shipdate) <= 60
      |         THEN 'MEDIUM'
      |       ELSE 'SLOW' END AS delay_band,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q_r44: TPC-H Q13-shaped CUSTOMER ORDER-COUNT DISTRIBUTION — how many
    * customers placed 0, 1, 2, … qualifying orders. The left outer join
    * keeps order-less customers (their COUNT(o_orderkey) is 0 — counting
    * the nullable key, never *), the first aggregation groups by the
    * join key itself (custkey), and the histogram aggregation runs over
    * one row per customer. Plan (pinned in Round10OpsSpec): exactly TWO
    * hash exchanges — one per aggregation level — with the join adding
    * none (at this scale orders broadcasts; at fact scale the sort-merge
    * join's custkey exchange doubles as the first agg's, so the count
    * stays two either way). The priority filter stands in for Q13's
    * comment filter and pushes into the orders scan before the join. */
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = G.table(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    G.table(spark, dir, "customer").select(col("c_custkey"))
      .join(ord, col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val orderCountDistributionSql: String =
    """WITH co AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist FROM co
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q_r45: TPC-H Q14-shaped PROMO REVENUE SHARE — the percentage of one
    * quarter's revenue that came from PROMO-type parts, as a conditional-
    * aggregate ratio in ONE aggregation over one scan (the r36 move: no
    * self-join, no second pass for the denominator). The date filter
    * pushes into the lineitem scan, part broadcasts, and both sums go
    * through DECIMAL(38,6) with the division association `(100·num)/den`
    * mirrored in the oracle so the single double division is
    * bit-identical. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val part = G.table(spark, dir, "part")
      .select(col("p_partkey"), col("p_type"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        ((lit(100.0) * G.dsum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0.0)))) / G.dsum(col("rev")))
          .as("promo_revenue_pct"),
        count(lit(1)).as("n_lines"))
  }

  val promoRevenueSql: String =
    """SELECT
      |  100.0 * CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
      |      AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS promo_revenue_pct,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-04-01'""".stripMargin

  /** q_r46: TPC-H Q15-shaped TOP SUPPLIER — the supplier(s) with maximum
    * quarterly revenue. Q15's view+MAX resolves as: keyed revenue agg,
    * then the scalar MAX aggregated FROM that frame and joined back as a
    * broadcast one-row frame (no collect, no single-partition window).
    * The revenue subtree feeds both branches, so ReuseExchange runs the
    * lineitem scan + agg once (pinned in Round10OpsSpec). MAX over doubles
    * is selection, so the equality matches bit-identical values on both
    * engines. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    // the explicit isNotNull mirrors what the supplier join infers on the
    // main branch — without it the two rev subtrees differ by one pushed
    // filter and ReuseExchange can't unify them (two lineitem scans)
    val rev = G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp") &&
        col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(G.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(G.table(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-04-01'
      |    AND l_suppkey IS NOT NULL
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** q_r47: TPC-H Q20-shaped DOMINANT SUPPLIERS — suppliers who shipped
    * more than 30% of a selected part's yearly volume (the availqty
    * quantifier reshaped onto trade volume: this schema has no partsupp).
    * Q20's nested IN subqueries resolve as: a broadcast part semi-reducer
    * pushed BEFORE the per-(supplier, part) agg (it only removes whole
    * partkey groups, so it commutes with everything downstream), a window
    * share test over l_partkey, and broadcast supplier/nation enrichment
    * of the tiny DISTINCT supplier set. The window SUM goes through
    * DECIMAL(38,6) — a double window sum would be accumulation-order-
    * dependent and break the cross-engine threshold comparison. */
  def dominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val selParts = G.table(spark, dir, "part")
      .filter(col("p_type").isin("SMALL", "MEDIUM"))
      .select(col("p_partkey"))
    val sp = G.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(selParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(G.dsum(col("l_quantity")).as("pair_qty"))
    val w = Window.partitionBy(col("l_partkey"))
    val dom = sp
      .withColumn("part_qty",
        sum(col("pair_qty").cast("decimal(38,6)")).over(w).cast("double"))
      .filter(col("pair_qty") > lit(0.3) * col("part_qty"))
      .select(col("l_suppkey")).distinct()
    dom.join(broadcast(G.table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(G.table(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val dominantSuppliersSql: String =
    """WITH sp AS (
      |  SELECT l_suppkey, l_partkey,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |      AS pair_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_type IN ('SMALL','MEDIUM'))
      |  GROUP BY l_suppkey, l_partkey),
      |tot AS (
      |  SELECT *, CAST(SUM(CAST(pair_qty AS DECIMAL(38,6)))
      |    OVER (PARTITION BY l_partkey) AS DOUBLE) AS part_qty FROM sp),
      |dom AS (
      |  SELECT DISTINCT l_suppkey FROM tot
      |  WHERE pair_qty > 0.3 * part_qty)
      |SELECT s_suppkey, s_name, n_name FROM dom
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |ORDER BY s_suppkey""".stripMargin

  val shippingPrioritySql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
}
