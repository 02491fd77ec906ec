package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers: table loading and oracle-exact numeric aggregation. */
object G {

  /** Load one driver parquet table (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Load `events` with its TIMESTAMP(NANOS) column normalized.
    *
    * Spark 4 rejects parquet nanosecond timestamps outright
    * (PARQUET_TYPE_ILLEGAL); the only supported path is the legacy flag that
    * surfaces them as raw nanos `Long`. We convert ns → µs with integer
    * division (a double division would lose precision at ~1.7e18) and expose
    * the column as TIMESTAMP_NTZ — wall-clock semantics, matching what DuckDB
    * sees, independent of the session timezone at parquet-write time.
    * The conf is runtime-settable, so this works under a driver-owned session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType))
  }

  /** Load `events` keeping the raw nanosecond epoch as `ts_ns: Long`
    * (plus all other columns) — for operators that do epoch-millis
    * arithmetic, like the reference (`CdcEventParser.java:66-90`). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events").withColumnRenamed("ts", "ts_ns")
  }

  /** When false, `dsum`/`davg` fall back to plain double aggregation —
    * production mode: ~4× faster on agg-heavy plans (measured in
    * graft.Stress at 10 M rows) at the cost of bit-exact cross-engine
    * reproducibility. The oracle/verify path leaves this true. */
  @volatile var exactSums: Boolean = true

  /** Order-independent, oracle-exact sum of a double column.
    *
    * Summing doubles is order-dependent; Spark's partial/final aggregation
    * order differs from DuckDB's scan order, so raw `sum(double)` can differ
    * in the last bits and fail the driver's hash compare. Casting each value
    * to DECIMAL(38,scale) first makes the sum exact and associative; casting
    * back to double yields a bit-identical result on both engines.
    * DuckDB oracle equivalent: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 6): Column =
    if (exactSums) sum(c.cast(DecimalType(38, scale))).cast(DoubleType)
    else sum(c)

  /** Exact mean via decimal sum / count (DuckDB: dsum / COUNT(x)).
    * Plain `avg(double)` has the same order-dependence problem as sum. */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(c)

  /** events.props is a tiny JSON object `{"k": <int>}`; `k` plays the
    * trade-volume analogue when events stands in for the trade stream
    * (FIXTURES.md §B mapping). */
  def propsK(c: Column): Column = get_json_object(c, "$.k").cast(LongType)
}
