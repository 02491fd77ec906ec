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
    * flattened trade-event frame (model.TradeEvent columns).
    *
    * PERFORMANCE-CRITICAL SHAPE: the drop conditions (tombstone / malformed
    * / missing image) must NOT be expressed as `filter` over aliases of the
    * parsed struct — predicate pushdown substitutes the alias, inlining a
    * fresh `from_json` into every pushed conjunct (measured ~7 parses per
    * row, 2× the whole-query time). Instead every output column AND a
    * `_keep` flag are computed in one projection over the single `_env`
    * alias (CollapseProject never inlines non-cheap expressions used more
    * than once), and the drop happens behind a TYPED filter — an object
    * boundary the optimizer cannot push predicates through. Net effect:
    * exactly one from_json evaluation per row. */
  def parseEnvelope(df: DataFrame, jsonCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val env = df.select(from_json(jsonCol, model.envelopeSchema).as("_env"))
    // payload wrapper if present, else the root-level fields
    def pick(field: String): Column =
      coalesce(col(s"_env.payload.$field"), col(s"_env.$field"))
    val op = pick("op")
    val img = when(op === "d", pick("before")).otherwise(pick("after"))
    val srcTs = coalesce(pick("source.ts_ms"), lit(0L))
    val cdcTs = coalesce(pick("ts_ms"), lit(0L))
    // decimal-string parse: try_cast yields null on garbage → default 0.0
    // (P2; plain cast would THROW under Spark 4's default ANSI mode)
    val flat = env.select(
      coalesce(op, lit("")).as("op"),
      coalesce(img.getField("trade_id"), lit(0L)).as("trade_id"),
      coalesce(img.getField("market"), lit("UNKNOWN")).as("market"),
      coalesce(img.getField("trade_price").try_cast(DoubleType), lit(0.0))
        .as("trade_price"),
      coalesce(img.getField("trade_volume").try_cast(DoubleType), lit(0.0))
        .as("trade_volume"),
      coalesce(img.getField("trade_amount").try_cast(DoubleType), lit(0.0))
        .as("trade_amount"),
      coalesce(img.getField("ask_bid"), lit("UNKNOWN")).as("ask_bid"),
      coalesce(img.getField("upbit_timestamp"), lit(0L)).as("upbit_timestamp"),
      coalesce(img.getField("sequential_id"), lit(0L)).as("sequential_id"),
      srcTs.as("source_ts"),
      cdcTs.as("cdc_ts"),
      (cdcTs - srcTs).as("cdc_latency_ms"),
      (op.isNotNull && img.isNotNull).as("_keep"))
    flat.as[model.ParsedEvent]
      .filter(_._keep) // typed boundary: no pushdown, parse stays single
      .drop("_keep")
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
  }

  /** q_p1 entry: the roundtrip plus its presentation sort. The sort lives
    * here — not in the building block — so downstream aggregations
    * (`changedRowCounts`) never depend on `EliminateSorts` to remove it. */
  def cdcParseRoundtripSorted(spark: SparkSession, dir: String): DataFrame =
    cdcParseRoundtrip(spark, dir).orderBy(col("trade_id"))

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
