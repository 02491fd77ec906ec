package graft

import graft.operators.{AnomalyDetection, TradeAggregates}
import graft.streaming.StreamingJobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming semantics: streaming results must equal batch results on the
  * same data (SURVEY §5 plan item 5). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def parsedStream(jsons: Seq[String]): org.apache.spark.sql.DataFrame = {
    val mem = MemoryStream[String](spark)
    mem.addData(jsons)
    graft.operators.CdcParser.parse(
      mem.toDF().withColumnRenamed("value", "json"), col("json"))
  }

  test("streaming window agg == batch window agg (complete mode)") {
    val trades = Synthetic.trades(300)
    val jsons = trades.map(t => Synthetic.envelopeJson(t))
    val parsed = parsedStream(jsons)
    val q = StreamingJobs.windowAggStream(parsed)
      .writeStream.format("memory").queryName("agg_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streaming = spark.table("agg_out")
      .orderBy(col("window_start"), col("user_id")).collect().toSeq
    val batch = TradeAggregates.windowAggOn(
      graft.operators.CdcParser.parseEnvelope(jsons.toDF("json"), col("json"))
        .select(timestamp_millis(col("source_ts")).as("ts"),
          col("market").as("user_id"), col("ask_bid").as("event_type"),
          col("trade_price").as("value"), col("trade_volume").as("k")))
      .orderBy(col("window_start"), col("user_id")).collect().toSeq
    assert(streaming.nonEmpty)
    assert(streaming == batch)
  }

  test("streaming session windows == batch session windows (complete mode)") {
    val trades = Synthetic.trades(200)
    val jsons = trades.map(t => Synthetic.envelopeJson(t))
    val base = parsedStream(jsons)
      .select(timestamp_millis(col("source_ts")).as("ts"),
        col("market").as("user_id"), col("trade_price").as("value"))
    val q = base
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), G.dsum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("total_value"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streaming = spark.table("sess_out")
      .orderBy(col("user_id"), col("session_start")).collect().toSeq
    val batch = graft.operators.CdcParser.parseEnvelope(jsons.toDF("json"), col("json"))
      .select(timestamp_millis(col("source_ts")).as("ts"),
        col("market").as("user_id"), col("trade_price").as("value"))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), G.dsum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start")).collect().toSeq
    assert(streaming.nonEmpty)
    assert(streaming == batch)
  }

  test("stateful detector stream == batch fold on same single batch") {
    val trades = Synthetic.trades(200)
    val jsons = trades.map(t => Synthetic.envelopeJson(t))
    val parsed = parsedStream(jsons)
    val q = StreamingJobs.detectAnomaliesStream(parsed)
      .writeStream.format("memory").queryName("alerts_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streaming = spark.table("alerts_out")
      .select("alert_type", "market", "trade_id")
      .collect().map(_.toSeq).toSet
    // batch reference: same mapping as detectAnomaliesStream, local fold
    val evs = StreamingJobs.evFromTrades(
      graft.operators.CdcParser.parseEnvelope(jsons.toDF("json"), col("json")))
      .collect()
    val local = evs.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
      var st = model.DetectorState.empty
      es.sortBy(e => (e.ts_ms, e.event_id)).toSeq.flatMap { e =>
        val (a, s2) = AnomalyDetection.step(st, e); st = s2; a }
    }.map(a => Seq[Any](a.alert_type, a.market, a.trade_id)).toSet
    assert(streaming.nonEmpty)
    assert(streaming == local)
  }

  test("transformWithState detector == flatMapGroupsWithState detector") {
    val trades = Synthetic.trades(200)
    val jsons = trades.map(t => Synthetic.envelopeJson(t))
    // TWS needs column families -> RocksDB provider (production config W4)
    StreamingJobs.configureStateStore(spark)
    val q = StreamingJobs.detectAnomaliesTws(parsedStream(jsons))
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val tws = spark.table("tws_out")
      .select("alert_type", "market", "trade_id")
      .collect().map(_.toSeq).toSet
    val q2 = StreamingJobs.detectAnomaliesStream(parsedStream(jsons))
      .writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append").start()
    try { q2.processAllAvailable() } finally q2.stop()
    val fmgws = spark.table("fmgws_out")
      .select("alert_type", "market", "trade_id")
      .collect().map(_.toSeq).toSet
    assert(tws.nonEmpty)
    assert(tws == fmgws)
  }

  test("streaming minute rollup == batch rollup (A3 MV analogue)") {
    val trades = Synthetic.trades(240)
    val jsons = trades.map(t => Synthetic.envelopeJson(t, latencyMs = t.trade_id % 50))
    val parsed = parsedStream(jsons)
    val q = StreamingJobs.minuteRollupStream(parsed)
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streaming = spark.table("rollup_out")
      .orderBy(col("minute")).collect().toSeq
    val batchParsed = graft.operators.CdcParser
      .parseEnvelope(jsons.toDF("json"), col("json"))
      .filter(col("op").isin("c", "u", "d"))
      .select(timestamp_millis(col("source_ts")).as("ts"), col("cdc_latency_ms"))
      .groupBy(window(col("ts"), "1 minute").getField("start").as("minute"))
      .agg(avg(col("cdc_latency_ms")).as("avg_latency"),
        max(col("cdc_latency_ms")).as("max_latency"),
        min(col("cdc_latency_ms")).as("min_latency"),
        count(lit(1)).as("cnt"))
      .orderBy(col("minute")).collect().toSeq
    assert(streaming.nonEmpty)
    assert(streaming == batchParsed)
  }

  test("fanOutReplay agg sink == batch window agg on the same envelope stream (q_stream_a1)") {
    // the driver-oracle entry for the streaming spine: file-stream source →
    // parse → foreachBatch fan-out → agg sink must reproduce the batch
    // aggregation over the identical events-derived CDC input, row for row
    val streamed = StreamingJobs.fanOutReplay(spark, sf()).collect().toSeq
    val batch = TradeAggregates.windowAggOn(
      graft.operators.CdcParser.cdcParseRoundtrip(spark, sf())
        .select(timestamp_millis(col("source_ts")).as("ts"),
          col("market").as("user_id"), col("ask_bid").as("event_type"),
          col("trade_price").as("value"), col("trade_volume").as("k")))
      .withColumn("window_start", col("window_start")
        .cast(org.apache.spark.sql.types.TimestampNTZType))
      .orderBy(col("window_start"), col("user_id")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("fan-out raw + alert sinks reproduce the batch parse (q_stream_raw / q_stream_alerts)") {
    // read-back of the OTHER two sinks of the same T1 replay: the raw sink
    // must hold exactly the parsed rows, the alert sink exactly the
    // stateless LARGE_TRADE subset
    val raw = StreamingJobs.fanOutRawReplay(spark, sf()).collect().toSeq
    val batch = graft.operators.CdcParser.cdcParseRoundtripSorted(spark, sf())
      .collect().toSeq
    assert(raw.nonEmpty && raw == batch)
    val alerts = StreamingJobs.fanOutAlertsReplay(spark, sf()).collect().toSeq
    val batchAlerts = graft.operators.CdcParser.cdcParseRoundtrip(spark, sf())
      .filter(col("op") === "c" &&
        col("trade_price") * col("trade_volume") >= 3000.0)
      .select(col("trade_id"), col("market"), col("trade_price"),
        col("trade_volume"),
        (col("trade_price") * col("trade_volume")).as("amount"))
      .orderBy(col("trade_id")).collect().toSeq
    assert(alerts.nonEmpty && alerts == batchAlerts)
  }

  test("stateful detector replay == local fold; key mapping collision-free (q_stream_d3d4)") {
    val parsed = graft.operators.CdcParser.cdcParseRoundtrip(spark, sf())
    // the q_stream_d3d4 oracle groups by market/user_id; the stream groups
    // by the hashed key — equivalence requires the mapping be injective on
    // the corpus
    val nMkts = parsed.filter(col("op") === "c")
      .select("market").distinct().count()
    val nKeys = StreamingJobs.evFromTrades(parsed)
      .select("user_id").distinct().count()
    assert(nMkts == nKeys, "market->key hash collision")
    val streamed = StreamingJobs.detectorReplay(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val evs = StreamingJobs.evFromTrades(parsed).collect()
    val local = evs.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
      var st = model.DetectorState.empty
      es.sortBy(e => (e.ts_ms, e.event_id)).toSeq.flatMap { e =>
        val (a, s2) = AnomalyDetection.step(st, e); st = s2; a }
    }
    val localCounts = local.groupBy(_.alert_type)
      .map { case (t, as) => (t, as.size.toLong) }.toSeq.sortBy(_._1)
    assert(streamed.nonEmpty && streamed == localCounts)
  }

  test("stateful detector carries state across micro-batches (two-batch == global fold)") {
    val trades = Synthetic.trades(300)
    val jsons = trades.map(t => Synthetic.envelopeJson(t))
    // trades are time-ordered, so a half split preserves per-key global
    // (ts, id) order across the batch boundary
    val (first, second) = jsons.splitAt(150)
    val mem = MemoryStream[String](spark)
    val parsed = graft.operators.CdcParser.parse(
      mem.toDF().withColumnRenamed("value", "json"), col("json"))
    val q = StreamingJobs.detectAnomaliesStream(parsed)
      .writeStream.format("memory").queryName("carry_out")
      .outputMode("append").start()
    try {
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("carry_out")
      .select("alert_type", "market", "trade_id")
      .collect().map(_.toSeq).toSet
    def fold(js: Seq[String], st0: Map[Long, model.DetectorState] = Map.empty)
        : (Set[Seq[Any]], Map[Long, model.DetectorState]) = {
      val evs = StreamingJobs.evFromTrades(
        graft.operators.CdcParser.parseEnvelope(js.toDF("json"), col("json")))
        .collect()
      var states = st0
      val out = evs.groupBy(_.user_id).toSeq.flatMap { case (k, es) =>
        var st = states.getOrElse(k, model.DetectorState.empty)
        val as = es.sortBy(e => (e.ts_ms, e.event_id)).toSeq.flatMap { e =>
          val (a, s2) = AnomalyDetection.step(st, e); st = s2; a }
        states = states.updated(k, st)
        as
      }.map(a => Seq[Any](a.alert_type, a.market, a.trade_id)).toSet
      (out, states)
    }
    val (global, _) = fold(jsons) // one fold over everything
    assert(streaming == global)
    // the test is non-vacuous only if a state reset at the boundary would
    // change the output: fold each half from empty state and compare
    val (h1, _) = fold(first)
    val (h2, _) = fold(second)
    assert(h1.union(h2) != global,
      "split corpus not state-sensitive; pick a different split")
  }

  test("streaming dedup drops redelivered events (S3 INSERT IGNORE)") {
    val trades = Synthetic.trades(100)
    // every 4th trade delivered twice (WebSocket redelivery)
    val jsons = trades.map(t => Synthetic.envelopeJson(t)) ++
      trades.filter(_.trade_id % 4 == 0).map(t => Synthetic.envelopeJson(t))
    val parsed = parsedStream(jsons)
    val q = StreamingJobs.dedupStream(parsed)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val ids = spark.table("dedup_out")
      .select("sequential_id").as[Long].collect()
    assert(ids.length == 100)
    assert(ids.toSet.size == 100)
  }

  test("stream-stream interval join == batch join, matches across micro-batches") {
    import spark.implicits._
    val trades = Synthetic.trades(300)
    val jsons = trades.map(t => Synthetic.envelopeJson(t))
    // trades are time-ordered (1 s cadence), so this is a time split:
    // batch 2 is strictly later and nothing arrives behind the watermark
    val (first, second) = jsons.splitAt(150)
    val mem = MemoryStream[String](spark)
    val parsed = graft.operators.CdcParser.parse(
      mem.toDF().withColumnRenamed("value", "json"), col("json"))
    val q = StreamingJobs.tradeQuoteJoin(parsed)
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("ssj_out")
      .orderBy("trade_id", "quote_id").collect().toSeq
    val bp = graft.operators.CdcParser
      .parseEnvelope(jsons.toDF("json"), col("json"))
    val bt = bp.filter(col("ask_bid") === "BID")
      .select(col("market"), col("trade_id"), col("trade_price"),
        col("source_ts").as("t_ms"))
    val bq = bp.filter(col("ask_bid") === "ASK")
      .select(col("market").as("q_market"), col("trade_id").as("quote_id"),
        col("trade_price").as("quote_price"), col("source_ts").as("q_ms"))
    val batch = bt.join(bq,
        col("market") === col("q_market") &&
          col("q_ms") >= col("t_ms") - lit(3600000L) &&
          col("q_ms") <= col("t_ms"))
      .select(col("market"), col("trade_id"), col("quote_id"),
        col("trade_price"), col("quote_price"),
        (col("t_ms") - col("q_ms")).as("lag_ms"))
      .orderBy("trade_id", "quote_id").collect().toSeq
    assert(streaming.nonEmpty && streaming == batch)
    // the join state really buffered across micro-batches: some match
    // pairs a second-batch trade with a first-batch quote
    val firstIds = trades.take(150).map(_.trade_id).toSet
    val secondIds = trades.drop(150).map(_.trade_id).toSet
    assert(streaming.exists(r =>
      secondIds.contains(r.getLong(1)) && firstIds.contains(r.getLong(2))))
  }

  test("stream-static broadcast join enrichment == batch join") {
    import spark.implicits._
    val trades = Synthetic.trades(100)
    val jsons = trades.map(t => Synthetic.envelopeJson(t))
    val dim = Synthetic.markets.zipWithIndex
      .map { case (m, i) => (m, if (i % 2 == 0) "gold" else "silver") }
      .toDF("market", "tier")
    val q = StreamingJobs.enrichStream(parsedStream(jsons), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streaming = spark.table("enrich_out")
      .select("trade_id", "market", "tier")
      .orderBy("trade_id").collect().toSeq
    val batch = graft.operators.CdcParser
      .parseEnvelope(jsons.toDF("json"), col("json"))
      .join(broadcast(dim), Seq("market"), "left")
      .select("trade_id", "market", "tier")
      .orderBy("trade_id").collect().toSeq
    assert(streaming.nonEmpty && streaming == batch)
    assert(streaming.forall(_.getString(2) != null))
  }

  test("foreachBatch fan-out writes raw/agg/alerts sinks (T1)") {
    val in = Files.createTempDirectory("graft_in").toString
    val out = Files.createTempDirectory("graft_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val jsons = Synthetic.trades(100).map(t => Synthetic.envelopeJson(t))
    Files.write(java.nio.file.Paths.get(in, "part-0.json"),
      jsons.mkString("\n").getBytes)
    val q = StreamingJobs.fanOut(spark, in, out, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$out/raw").count() == 100)
    assert(spark.read.parquet(s"$out/agg").count() > 0)
    assert(spark.read.parquet(s"$out/alerts").count() > 0)
  }

  test("partitioned table writer: layout + pruning (ST1/ST2/ST4)") {
    val dir = Files.createTempDirectory("graft_tbl").toString
    val df = G.events(spark, sf())
    Tables.writePartitioned(df, dir, "ts", Seq("user_id", "ts"))
    val back = Tables.read(spark, dir)
    assert(back.count() == df.count())
    assert(back.columns.contains("month") && back.columns.contains("inserted_at"))
    // partition pruning: a month filter must read a subset of files
    val pruned = back.filter(col("month") === "202401")
    assert(pruned.count() == df.count()) // all data is Jan 2024
    assert(Tables.retentionFilter(back, "ts", "2024-01-15 00:00:00").count()
      < back.count())
  }
}
