package graft

import graft.operators.{DashboardQueries, Graph, Multimodal, TextAnalysis, Validation}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Round-7 operators. */
class Round7OpsSpec extends SparkSpec {

  private def executed(df: => org.apache.spark.sql.DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("plan audit: q_a18 OHLC is one keyed agg exchange + presentation sort") {
    val plan = executed(DashboardQueries.ohlcCandles(spark, sf()))
    val exchanges = plan.collect { case e: Exchange => e }
    // hash (candle agg) + range (orderBy); the struct-ordered
    // min_by/max_by force SORT-based aggregation, but the partial still
    // combines map-side before the single keyed exchange — pin that
    assert(exchanges.length == 2,
      s"expected hash + range exchanges only, got:\n$plan")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(kinds.exists(_.contains("Hash")) && kinds.exists(_.contains("Range")),
      s"unexpected partitionings: $kinds")
    val s = plan.toString
    assert(s.contains("partial_min_by"), s"no map-side partial agg:\n$s")
    assert(s.split("SortAggregate|HashAggregate").length - 1 >= 2)
  }

  test("plan audit: q_m7 blob bytes never cross an exchange") {
    val plan = executed(Multimodal.chunkDedup(spark, sf()))
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.exists(n => n == "media" || n == "text"),
        s"blob column shuffled: $names")
    }
  }

  test("plan audit: q_a17 peak join is broadcast, no sort-merge join") {
    val planStr = executed(DashboardQueries.peakConcurrency(spark, sf())).toString
    assert(planStr.contains("BroadcastHashJoin"),
      s"peak lookup not broadcast:\n$planStr")
    assert(!planStr.contains("SortMergeJoin"),
      s"unexpected sort-merge join:\n$planStr")
  }

  test("chunk dedup: stored never exceeds raw, savings exist where chunks repeat") {
    val r = Multimodal.chunkDedup(spark, sf("0.01")).cache()
    assert(r.count() > 0)
    assert(r.filter(col("stored_bytes") > col("raw_bytes")).count() == 0)
    assert(r.filter(col("uniq_chunks") > col("n_chunks")).count() == 0)
    // saved_bytes is exactly the raw/stored gap
    assert(r.filter(col("saved_bytes") =!=
      col("raw_bytes") - col("stored_bytes")).count() == 0)
    r.unpersist()
    ()
  }

  test("vocab growth: cumulative curves are monotone and the last point is the corpus total") {
    val r = TextAnalysis.vocabGrowth(spark, sf("0.01")).cache()
    val rows = r.orderBy(col("decile")).collect()
    assert(rows.length == 10)
    // monotone non-decreasing cumulatives, decile 10 == whole-corpus totals
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a.getLong(1) <= b.getLong(1) && a.getLong(2) <= b.getLong(2) })
    val toks = G.table(spark, sf("0.01"), "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    assert(rows.last.getLong(1) == toks.count())
    assert(rows.last.getLong(2) == toks.distinct().count())
    r.unpersist()
    ()
  }

  test("outlier days: deviation threshold is exactly 3 MAD, flags match recompute") {
    val r = Validation.outlierDays(spark, sf("0.01")).cache()
    assert(r.count() > 0)
    assert(r.filter((col("dev") > lit(3) * col("mad")) =!=
      (col("is_outlier") === 1L)).count() == 0)
    // med/mad constant across rows; median really is an observed count
    assert(r.select(col("med")).distinct().count() == 1)
    val med = r.head().getLong(2)
    assert(r.filter(col("cnt") === med).count() >= 1)
    r.unpersist()
    ()
  }

  test("peak concurrency: sweep-line max equals brute-force interval count") {
    val r = DashboardQueries.peakConcurrency(spark, sf("0.001")).cache()
    assert(r.count() > 0)
    // brute force: concurrency at the reported peak instant must equal
    // the reported peak (intervals are [s, e) under the ends-first order)
    val ev = G.eventsRaw(spark, sf("0.001"))
      .withColumn("k", G.propsK(col("props")))
      .select(col("event_type"), expr("ts_ns DIV 1000000").as("s"),
        (expr("ts_ns DIV 1000000") + col("k") * 60000L).as("e"))
    r.collect().foreach { row =>
      val (et, peak, at) = (row.getString(0), row.getLong(1), row.getLong(2))
      val n = ev.filter(col("event_type") === et &&
        col("s") <= at && col("e") > at).count()
      assert(n == peak, s"$et: brute $n != sweep $peak")
    }
    r.unpersist()
    ()
  }

  test("containment: bounded to (0.5, 1], asymmetric on a planted excerpt") {
    val r = graft.operators.Dedup.containment(spark, sf("0.01")).cache()
    assert(r.count() > 0)
    assert(r.filter(col("containment") < 0.5 || col("containment") > 1.0)
      .count() == 0)
    r.unpersist()
    // planted: doc 2 is a verbatim excerpt of doc 1 (first 10 of 20
    // tokens), doc 3 is unrelated. Excerpt⊂original = 1.0 exactly;
    // original⊄excerpt (13 grams, 3 shared = 0.23 < τ); no cross rows.
    import spark.implicits._
    val toks = (1 to 20).map(i => s"w$i")
    val planted = Seq(
      (1L, toks.mkString(" ")),
      (2L, toks.take(10).mkString(" ")),
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val p = graft.operators.Dedup.containmentOn(planted).collect()
    assert(p.length == 1, s"expected only excerpt⊂original: ${p.toSeq}")
    assert(p(0).getLong(0) == 2L && p(0).getLong(1) == 1L &&
      p(0).getDouble(4) == 1.0)
    ()
  }

  test("probe sweep: recall is monotone in nprobe and bounded by 1") {
    val r = graft.operators.Similarity.probeSweep(spark, sf("0.01"))
      .orderBy(col("nprobe")).collect()
    assert(r.length == 3)
    // widening the probe set can only ADD candidates: recall never drops
    assert(r.sliding(2).forall { case Array(a, b) =>
      a.getDouble(3) <= b.getDouble(3) })
    r.foreach { row =>
      assert(row.getLong(2) == 50) // 10 queries x top-5, all settings
      assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0)
    }
    ()
  }

  test("k-core: bounded 4-round peel reaches the true fixpoint (round 5 is a no-op)") {
    val r4 = Graph.kcoreRounds(spark, sf("0.01"), 4).cache()
    val r5 = Graph.kcoreRounds(spark, sf("0.01"), 5)
    assert(r4.count() > 0)
    // set equality both directions: bounded result IS the 10-core
    assert(r4.exceptAll(r5).count() == 0 && r5.exceptAll(r4).count() == 0)
    // core invariant: every member keeps >= 10 neighbors inside the core
    assert(r4.filter(col("core_deg") < 10).count() == 0)
    r4.unpersist()
    ()
  }
}
