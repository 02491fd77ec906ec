package graft

import graft.operators.{DashboardQueries, Graph, Multimodal}
import org.apache.spark.sql.functions._

/** Round-7 operators. */
class Round7OpsSpec extends SparkSpec {

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
