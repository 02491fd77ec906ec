package graft.operators

import graft.{G, model}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium CDC envelope parsing (SURVEY §2.2 P1/P2, §2.1 S2).
  *
  * Reproduces the flatMap semantics of the reference parser
  * (`flink/.../function/CdcEventParser.java:42-97`):
  *  - tolerate a missing `payload` wrapper — fields at root (`:48-51`)
  *  - drop events without `op` — tombstones (`:53-54`)
  *  - row image = `before` when op='d', else `after` (`:57-62`); drop if null
  *  - decimal-string → double, non-numeric → 0.0 (`:104-115`)
  *  - per-field defaults: 0 for numerics, "UNKNOWN" for strings (`:76-86`)
  *  - `cdc_latency_ms = ts_ms - source.ts_ms` (`:90`)
  *  - malformed JSON → 0 rows, no failure (`:94-96`)
  *
  * Spark-first: `from_json` returns null on corrupt input and null for absent
  * fields, so the flatMap's 0-or-1-row behavior is exactly
  * `from_json → filter(op.isNotNull) → filter(image.isNotNull)` and defaults
  * are `coalesce` — all codegen'd builtins; no UDF, fully pushdown-friendly.
  * At 100 TB this stays a single narrow projection stage: no shuffle, no
  * state, whole-stage-codegen end to end.
  */
object CdcParser {

  /** Core operator: parse a column of Debezium-envelope JSON into the
    * flattened trade-event frame (model.TradeEvent columns). */
  def parseEnvelope(df: DataFrame, jsonCol: Column): DataFrame = {
    val env = df.withColumn("_env", from_json(jsonCol, model.envelopeSchema))
    // payload wrapper if present, else the root-level fields
    def pick(field: String): Column =
      coalesce(col(s"_env.payload.$field"), col(s"_env.$field"))
    val withImage = env
      .withColumn("_op", pick("op"))
      .filter(col("_op").isNotNull) // tombstone / malformed → 0 rows
      .withColumn("_img",
        when(col("_op") === "d", pick("before")).otherwise(pick("after")))
      .filter(col("_img").isNotNull) // no row image → 0 rows
      .withColumn("_src_ts", pick("source.ts_ms"))
      .withColumn("_cdc_ts", pick("ts_ms"))
    // decimal-string parse: try_cast yields null on garbage → default 0.0
    // (P2; plain cast would THROW under Spark 4's default ANSI mode)
    def dec(field: String): Column =
      coalesce(expr(s"try_cast(_img.$field AS DOUBLE)"), lit(0.0))
    withImage.select(
      col("_op").as("op"),
      coalesce(col("_img.trade_id"), lit(0L)).as("trade_id"),
      coalesce(col("_img.market"), lit("UNKNOWN")).as("market"),
      dec("trade_price").as("trade_price"),
      dec("trade_volume").as("trade_volume"),
      dec("trade_amount").as("trade_amount"),
      coalesce(col("_img.ask_bid"), lit("UNKNOWN")).as("ask_bid"),
      coalesce(col("_img.upbit_timestamp"), lit(0L)).as("upbit_timestamp"),
      coalesce(col("_img.sequential_id"), lit(0L)).as("sequential_id"),
      coalesce(col("_src_ts"), lit(0L)).as("source_ts"),
      coalesce(col("_cdc_ts"), lit(0L)).as("cdc_ts"),
      (coalesce(col("_cdc_ts"), lit(0L)) - coalesce(col("_src_ts"), lit(0L)))
        .as("cdc_latency_ms"))
  }

  // ---------------------------------------------------------------- t2 query

  /** Deterministic op-code mapping used to turn the driver `events` table
    * into a CDC change stream (FIXTURES.md §B): each event_type plays one
    * Debezium op; `error` plays a delete (image in `before`). */
  private val opCase: Column =
    when(col("event_type") === "signup", "c")
      .when(col("event_type") === "purchase", "c")
      .when(col("event_type") === "click", "r")
      .when(col("event_type") === "view", "u")
      .otherwise("d")

  private val opCaseSql: String =
    """CASE WHEN event_type = 'signup' THEN 'c'
      |     WHEN event_type = 'purchase' THEN 'c'
      |     WHEN event_type = 'click' THEN 'r'
      |     WHEN event_type = 'view' THEN 'u'
      |     ELSE 'd' END""".stripMargin

  /** Build Debezium-shaped JSON from `events`, exercising every parser
    * branch, then parse it back with `parseEnvelope`:
    *  - event_id % 17 == 0 → tombstone (no op) → dropped
    *  - event_id % 23 == 0 → malformed JSON → dropped
    *  - op 'd' rows carry the image in `before` (after=null)
    *  - event_type 'click' rows omit `ask_bid` → default "UNKNOWN"
    *  - odd event_id → fields at the JSON root (no payload wrapper)
    *  - cdc latency = props.k (source.ts_ms = ts_ms - k)
    */
  def cdcParseRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = G.eventsRaw(spark, dir)
      .withColumn("k", G.propsK(col("props")))
      .withColumn("cdc_ms", expr("ts_ns DIV 1000000"))
      .withColumn("src_ms", expr("ts_ns DIV 1000000") - col("k"))
      .withColumn("op", opCase)
    val image = concat(
      lit("""{"trade_id": """), col("event_id"),
      lit(""", "market": "M"""), col("user_id"), lit("\""),
      lit(""", "trade_price": """"), col("value").cast(StringType), lit("\""),
      when(col("event_type") =!= "click",
        concat(lit(""", "ask_bid": """"),
          when(col("event_type") === "purchase", "BID").otherwise("ASK"),
          lit("\""))).otherwise(lit("")),
      lit(""", "sequential_id": """), col("event_id") * 1000,
      lit("}"))
    val payload = concat(
      lit("{"),
      when(col("op") === "d",
        concat(lit(""""before": """), image, lit(""", "after": null""")))
        .otherwise(concat(lit(""""before": null, "after": """), image)),
      lit(""", "source": {"ts_ms": """), col("src_ms"),
      lit(""", "db": "crypto_db", "table": "crypto_trades"}"""),
      lit(""", "op": """"), col("op"), lit("\""),
      lit(""", "ts_ms": """), col("cdc_ms"),
      lit("}"))
    val json =
      when(col("event_id") % 17 === 0,
        // tombstone: envelope with no op at all
        lit("""{"payload": {"before": null, "after": null}}"""))
      .when(col("event_id") % 23 === 0, lit("""{"oops"""))  // malformed
      .when(col("event_id") % 2 === 1, payload)             // no wrapper
      .otherwise(concat(lit("""{"payload": """), payload, lit("}")))
    parseEnvelope(ev.select(json.as("json")), col("json"))
      .orderBy(col("trade_id"))
  }

  val cdcParseRoundtripSql: String =
    s"""SELECT $opCaseSql AS op,
       |  event_id AS trade_id,
       |  'M' || user_id AS market,
       |  value AS trade_price,
       |  CAST(0.0 AS DOUBLE) AS trade_volume,
       |  CAST(0.0 AS DOUBLE) AS trade_amount,
       |  CASE WHEN event_type = 'click' THEN 'UNKNOWN'
       |       WHEN event_type = 'purchase' THEN 'BID'
       |       ELSE 'ASK' END AS ask_bid,
       |  0 AS upbit_timestamp,
       |  event_id * 1000 AS sequential_id,
       |  epoch_ms(ts) - CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS source_ts,
       |  epoch_ms(ts) AS cdc_ts,
       |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS cdc_latency_ms
       |FROM events
       |WHERE event_id % 17 <> 0 AND event_id % 23 <> 0
       |ORDER BY trade_id""".stripMargin

  /** P5: changed-rows filter (op IN c/u/d, excludes snapshot 'r') + per-op
    * counts — the materialized-view predicate (`clickhouse/init.sql:93`). */
  def changedRowCounts(spark: SparkSession, dir: String): DataFrame =
    cdcParseRoundtrip(spark, dir)
      .filter(col("op").isin("c", "u", "d"))
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n"),
        G.dsum(col("trade_price")).as("price_sum"))
      .orderBy(col("op"))

  val changedRowCountsSql: String =
    s"""SELECT op, count(*) AS n,
       |  CAST(SUM(CAST(trade_price AS DECIMAL(38,6))) AS DOUBLE) AS price_sum
       |FROM (${cdcParseRoundtripSql.replace("ORDER BY trade_id", "")}) t
       |WHERE op IN ('c','u','d')
       |GROUP BY op ORDER BY op""".stripMargin
}
