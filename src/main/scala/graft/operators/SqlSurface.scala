package graft.operators

import graft.G
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SQL query surface (SURVEY §3.3, entry point 3): the reference's 12
  * Grafana panels fire raw SQL at ClickHouse
  * (`grafana/provisioning/dashboards/json/cdc-pipeline.json`); here the same
  * analytics run as `spark.sql` over registered views — the engine's third
  * query surface next to the DataFrame API and the streaming dataflow.
  *
  * Time predicates are anchored to the data's max timestamp instead of
  * `now()` (deterministic replay, SURVEY §7.4); panel SQL is otherwise a
  * direct translation. Catalyst plans these identically to the DataFrame
  * versions in DashboardQueries (same pushdown/pruning/TakeOrdered shapes).
  */
object SqlSurface {

  /** Register the driver tables as temp views (events normalized through
    * G.events so `ts` is a usable timestamp). */
  def createViews(spark: SparkSession, dir: String): Unit = {
    G.events(spark, dir)
      .withColumn("k", G.propsK(col("props")))
      .createOrReplaceTempView("events_v")
    Seq("lineitem", "orders", "customer", "documents").foreach { t =>
      G.table(spark, dir, t).createOrReplaceTempView(s"${t}_v")
    }
  }

  /** The 12 panels (cdc-pipeline.json), re-based onto events_v. */
  val panels: Map[String, String] = Map(
    "total_trades" -> "SELECT count(*) AS total FROM events_v",
    "avg_price" ->
      "SELECT round(avg(value), 1) AS avg_price FROM events_v WHERE event_type = 'purchase'",
    "total_volume" -> "SELECT sum(k) AS total_volume FROM events_v",
    "max_price" -> "SELECT max(value) AS max_price FROM events_v",
    "uniq_markets" -> "SELECT count(DISTINCT user_id) AS n FROM events_v",
    "liveness" ->
      """SELECT CASE WHEN max(ts) >= TIMESTAMP '2024-01-30 00:00:00'
        |THEN 1 ELSE 0 END AS alive FROM events_v""".stripMargin,
    "latency_per_minute" ->
      """SELECT date_trunc('minute', ts) AS minute, avg(k) AS avg_latency,
        |max(k) AS max_latency FROM events_v GROUP BY 1 ORDER BY 1""".stripMargin,
    "price_chart" ->
      """SELECT date_trunc('minute', ts) AS minute, avg(value) AS avg_price,
        |min(value) AS min_price, max(value) AS max_price
        |FROM events_v WHERE user_id = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "bid_ask_by_market" ->
      """SELECT user_id,
        |count(CASE WHEN event_type = 'purchase' THEN 1 END) AS bid,
        |count(CASE WHEN event_type <> 'purchase' THEN 1 END) AS ask
        |FROM events_v GROUP BY user_id ORDER BY bid + ask DESC, user_id""".stripMargin,
    "recent_alerts" ->
      """SELECT event_id, ts, user_id, value FROM events_v
        |WHERE event_type = 'error'
        |ORDER BY ts DESC, event_id DESC LIMIT 50""".stripMargin,
    "recent_trades" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events_v
        |ORDER BY ts DESC, event_id DESC LIMIT 30""".stripMargin,
    "changed_rows" ->
      """SELECT event_type, count(*) AS n FROM events_v
        |WHERE event_type IN ('purchase', 'view', 'error')
        |GROUP BY event_type ORDER BY event_type""".stripMargin)

  def runPanel(spark: SparkSession, dir: String, name: String): DataFrame = {
    createViews(spark, dir)
    spark.sql(panels(name))
  }

  /** t2 entry: every scalar panel unioned into one (panel, value) frame —
    * exercises the whole spark.sql surface in one oracle-checked query. */
  def scalarPanels(spark: SparkSession, dir: String): DataFrame = {
    createViews(spark, dir)
    spark.sql(
      """SELECT 'total_trades' AS panel, CAST(count(*) AS DOUBLE) AS value FROM events_v
        |UNION ALL
        |SELECT 'avg_price', round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value), 1)
        |  FROM events_v WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT 'total_volume', CAST(sum(k) AS DOUBLE) FROM events_v
        |UNION ALL
        |SELECT 'max_price', max(value) FROM events_v
        |UNION ALL
        |SELECT 'uniq_markets', CAST(count(DISTINCT user_id) AS DOUBLE) FROM events_v
        |ORDER BY panel""".stripMargin)
  }

  /** q_sql_concurrent: THE SERVING-LAYER CHECK — all 12 panels fired at
    * ONE session from 12 threads (the reference dashboard refreshes every
    * panel each 10 s; `grafana/.../cdc-pipeline.json:7` "refresh": "10s"),
    * each job tagged with its own scheduler pool (FAIR when the session
    * enables it — Bench/Verify do — so a heavy GROUP BY panel cannot
    * starve the scalar tiles; harmless under FIFO). Returns one row per
    * panel: its served row count and whether the concurrently-served
    * result is IDENTICAL to the same panel run sequentially afterward.
    * The concurrent/sequential equality is IN the oracle-checked result:
    * a thread-safety bug, temp-view race, or non-deterministic plan flips
    * `matches_sequential` and fails the driver's t2 hash gate, not just a
    * local spec. */
  def concurrentPanels(spark: SparkSession, dir: String): DataFrame = {
    val conc = servePanelsConcurrently(spark, dir)
    val seq = panels.map { case (n, sql) =>
      n -> spark.sql(sql).collect().toSeq
    }
    import spark.implicits._
    panels.keys.toSeq.sorted
      .map(n => (n, conc(n)._1.size.toLong, conc(n)._1 == seq(n)))
      .toDF("panel", "n_rows", "matches_sequential")
      .orderBy(col("panel"))
  }

  /** One concurrent volley: every panel collected on its own thread in
    * its own scheduler pool. Returns per-panel (rows, wall millis). */
  private def servePanelsConcurrently(spark: SparkSession, dir: String)
      : Map[String, (Seq[org.apache.spark.sql.Row], Double)] = {
    createViews(spark, dir)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.DurationInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(panels.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = panels.toSeq.map { case (name, sql) =>
        Future {
          spark.sparkContext
            .setLocalProperty("spark.scheduler.pool", s"panel_$name")
          val t0 = System.nanoTime()
          val rows = spark.sql(sql).collect().toSeq
          name -> (rows, (System.nanoTime() - t0) / 1e6)
        }
      }
      Await.result(Future.sequence(fs), 10.minutes).toMap
    } finally pool.shutdown()
  }

  /** Bench probe: `volleys` rounds of the full 12-panel concurrent volley;
    * returns every per-panel wall latency (ms) for percentile math. The
    * number the reference publishes SLOs for is per-panel latency under
    * the 12-way concurrent refresh, not sequential query time. */
  def panelLatencies(spark: SparkSession, dir: String,
      volleys: Int): Seq[Double] =
    (1 to volleys).flatMap(_ =>
      servePanelsConcurrently(spark, dir).values.map(_._2))

  val concurrentPanelsSql: String =
    """WITH e AS (SELECT *, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
      |           FROM events)
      |SELECT panel, n_rows, TRUE AS matches_sequential FROM (
      |  SELECT 'avg_price' AS panel, CAST(1 AS BIGINT) AS n_rows
      |  UNION ALL SELECT 'bid_ask_by_market',
      |    (SELECT count(DISTINCT user_id) FROM e)
      |  UNION ALL SELECT 'changed_rows',
      |    (SELECT count(DISTINCT event_type) FROM e
      |     WHERE event_type IN ('purchase', 'view', 'error'))
      |  UNION ALL SELECT 'latency_per_minute',
      |    (SELECT count(DISTINCT date_trunc('minute', ts)) FROM e)
      |  UNION ALL SELECT 'liveness', 1
      |  UNION ALL SELECT 'max_price', 1
      |  UNION ALL SELECT 'price_chart',
      |    (SELECT count(DISTINCT date_trunc('minute', ts)) FROM e
      |     WHERE user_id = 1)
      |  UNION ALL SELECT 'recent_alerts',
      |    (SELECT least(50, count(*)) FROM e WHERE event_type = 'error')
      |  UNION ALL SELECT 'recent_trades', (SELECT least(30, count(*)) FROM e)
      |  UNION ALL SELECT 'total_trades', 1
      |  UNION ALL SELECT 'total_volume', 1
      |  UNION ALL SELECT 'uniq_markets', 1)
      |ORDER BY panel""".stripMargin

  val scalarPanelsSql: String =
    """WITH e AS (SELECT *, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
      |           FROM events)
      |SELECT panel, value FROM (
      |  SELECT 'total_trades' AS panel, CAST(count(*) AS DOUBLE) AS value FROM e
      |  UNION ALL
      |  SELECT 'avg_price', round(CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(value), 1)
      |    FROM e WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT 'total_volume', CAST(sum(k) AS DOUBLE) FROM e
      |  UNION ALL
      |  SELECT 'max_price', max(value) FROM e
      |  UNION ALL
      |  SELECT 'uniq_markets', CAST(count(DISTINCT user_id) AS DOUBLE) FROM e)
      |ORDER BY panel""".stripMargin
}
