package graft

import graft.operators.TradeAggregates
import org.apache.spark.sql.functions._

/** Golden window-aggregate fixture from the reference's hand-computed
  * verification (`docs/04-flink-streaming.md:304-317`, FIXTURES.md §A3):
  * 3 trades in one window — 100@72000 BID, 50@73000 BID, 1000@74000 ASK —
  * total amount 84,850,000, range 72000–74000, counts 2/1. */
class TradeAggSpec extends SparkSpec {
  import spark.implicits._

  test("golden 84,850,000 window (docs/04-flink-streaming.md:304-317)") {
    val rows = Seq(
      ("2024-01-01 00:01:00", 1L, "purchase", 72000.0, 100L),
      ("2024-01-01 00:02:00", 1L, "purchase", 73000.0, 50L),
      ("2024-01-01 00:03:00", 1L, "view", 74000.0, 1000L))
      .toDF("ts_s", "user_id", "event_type", "value", "k")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TradeAggregates.windowAggOn(rows).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("trade_count") == 3L)
    assert(row.getAs[Long]("bid_count") == 2L)
    assert(row.getAs[Long]("ask_count") == 1L)
    assert(row.getAs[Double]("total_amount") == 84850000.0)
    assert(row.getAs[Long]("total_volume") == 1150L)
    assert(row.getAs[Double]("min_price") == 72000.0)
    assert(row.getAs[Double]("max_price") == 74000.0)
    assert(row.getAs[Double]("avg_price") == 73000.0)
    assert(row.getAs[Double]("vwap") == 84850000.0 / 1150.0)
  }

  test("zero-volume window vwap guard (TradeAggregator.java:72-75)") {
    val rows = Seq(("2024-01-01 00:01:00", 1L, "view", 10.0, 0L))
      .toDF("ts_s", "user_id", "event_type", "value", "k")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TradeAggregates.windowAggOn(rows).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("vwap") == 0.0)
    assert(r.head.getAs[Double]("total_amount") == 0.0)
  }

  test("events split into correct 5-minute buckets") {
    val rows = Seq(
      ("2024-01-01 00:04:59", 1L, "view", 1.0, 1L),
      ("2024-01-01 00:05:00", 1L, "view", 2.0, 1L))
      .toDF("ts_s", "user_id", "event_type", "value", "k")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TradeAggregates.windowAggOn(rows)
      .orderBy(col("window_start")).collect()
    assert(r.length == 2)
    assert(r(0).getAs[java.sql.Timestamp]("window_start").toString
      .startsWith("2024-01-01 00:00:00"))
    assert(r(1).getAs[java.sql.Timestamp]("window_start").toString
      .startsWith("2024-01-01 00:05:00"))
  }

  test("merged HLL sketch estimate is within 5% of the exact distinct") {
    val r = graft.operators.DashboardQueries.sketchUnionUsers(spark, sf())
      .collect().head
    val est = r.getAs[Long]("distinct_users_merged").toDouble
    val exact = G.events(spark, sf())
      .select("user_id").distinct().count().toDouble
    assert(r.getAs[Long]("n_days") >= 1)
    assert(math.abs(est - exact) / exact < 0.05,
      s"estimate $est vs exact $exact")
  }
}
