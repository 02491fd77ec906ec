package graft

import org.apache.spark.sql.types._

/** Core data model for the Spark-native engine.
  *
  * Mirrors the reference's data model (see SURVEY.md §1):
  *  - flattened CDC trade event: reference `flink/.../model/CryptoTradeEvent.java:14-25`
  *  - windowed aggregate: reference `flink/.../model/TradeAggResult.java:11-22`
  *  - anomaly alert: reference `flink/.../model/AnomalyAlert.java:11-24`
  *  - Debezium envelope: reference `flink/.../function/CdcEventParser.java:14-32`,
  *    `docs/03-cdc-pipeline.md:156-191`
  *
  * All timestamps are epoch millis (`Long`) in flight — converted to Spark
  * `TimestampType` only at table boundaries, matching the reference
  * (`sink/ClickHouseSinks.java:39-42`).
  */
object model {

  /** Flattened change event, the engine's in-flight row (FIXTURES.md §A2). */
  final case class TradeEvent(
      op: String,
      trade_id: Long,
      market: String,
      trade_price: Double,
      trade_volume: Double,
      trade_amount: Double,
      ask_bid: String,
      upbit_timestamp: Long,
      sequential_id: Long,
      source_ts: Long,   // epoch ms (Debezium source.ts_ms)
      cdc_ts: Long,      // epoch ms (Debezium ts_ms)
      cdc_latency_ms: Long)

  /** Parser-internal row: TradeEvent columns + the keep flag evaluated in
    * the same projection as the parse (see CdcParser for why). */
  final case class ParsedEvent(
      op: String,
      trade_id: Long,
      market: String,
      trade_price: Double,
      trade_volume: Double,
      trade_amount: Double,
      ask_bid: String,
      upbit_timestamp: Long,
      sequential_id: Long,
      source_ts: Long,
      cdc_ts: Long,
      cdc_latency_ms: Long,
      _keep: Boolean)

  /** Per-market 5-minute window aggregate (reference TradeAggResult). */
  final case class TradeAgg(
      market: String,
      window_start: Long,
      window_end: Long,
      trade_count: Long,
      bid_count: Long,
      ask_count: Long,
      total_amount: Double,
      total_volume: Double,
      avg_price: Double,
      min_price: Double,
      max_price: Double,
      vwap: Double)

  /** Alert types, reference `model/AnomalyAlert.java:11-16`. */
  object AlertType {
    val LargeTrade = "LARGE_TRADE"
    val PriceSpike = "PRICE_SPIKE"
    val VolumeSurge = "VOLUME_SURGE"
    val RapidTrades = "RAPID_TRADES"
  }

  /** Emitted alert (reference `model/AnomalyAlert.java`). `detected_at` is
    * event time, not wall clock — documented deviation (SURVEY §7.4). */
  final case class AnomalyAlert(
      alert_type: String,
      market: String,
      trade_id: Long,
      price: Double,
      volume: Double,
      amount: Double,
      message: String,
      detected_at: Long)

  /** Per-key detector state (reference `AnomalyDetector.java:79-97`:
    * five ValueState slots → one case class in GroupState). */
  final case class DetectorState(
      lastPrice: Double,
      avgVolume: Double,
      volumeCount: Long,
      windowStart: Long,
      windowTradeCount: Int)

  object DetectorState {
    val empty: DetectorState = DetectorState(0.0, 0.0, 0L, 0L, 0)
  }

  /** Debezium CDC envelope schema (reference `CdcEventParser.java:14-32`).
    * Decimals arrive as strings (`decimal.handling.mode=string`,
    * `debezium/connector-config.json:29`). */
  val rowImageSchema: StructType = StructType(Seq(
    StructField("trade_id", LongType),
    StructField("market", StringType),
    StructField("trade_price", StringType),
    StructField("trade_volume", StringType),
    StructField("trade_amount", StringType),
    StructField("ask_bid", StringType),
    StructField("upbit_timestamp", LongType),
    StructField("sequential_id", LongType),
    StructField("created_at", StringType)))

  /** Debezium `source` block. The reference parser reads only `ts_ms`
    * (`CdcEventParser.java:66-90`); the remaining fields (connector/MySQL
    * provenance: snapshot flag, binlog file/pos, gtid, server_id —
    * `docs/03-cdc-pipeline.md:156-191`) are kept for envelope fidelity so a
    * consumer can filter snapshot rows or order by binlog position without
    * re-parsing the JSON. `from_json` leaves absent fields null. */
  val sourceSchema: StructType = StructType(Seq(
    StructField("ts_ms", LongType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("snapshot", StringType),
    StructField("file", StringType),
    StructField("pos", LongType),
    StructField("gtid", StringType),
    StructField("server_id", LongType)))

  val payloadSchema: StructType = StructType(Seq(
    StructField("before", rowImageSchema),
    StructField("after", rowImageSchema),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Full envelope: `{"payload": {...}}` wrapper, with the payload fields
    * also accepted at the root (reference tolerates both,
    * `CdcEventParser.java:48-51`). */
  val envelopeSchema: StructType = StructType(
    StructField("payload", payloadSchema) +: payloadSchema.fields.toSeq)
}
