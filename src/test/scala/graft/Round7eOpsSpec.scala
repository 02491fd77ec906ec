package graft

import graft.operators.{CdcParser, DashboardQueries, Graph, Validation}
import org.apache.spark.sql.functions._

/** Round-7 fifth wave: planner/ops audits (v10 join cardinality, v11 skew
  * report), mergeable log-histogram percentiles (a20), fixed-point
  * personalized PageRank (g7), and the late-data contract (p11 audit +
  * q_stream_late engine check). */
class Round7eOpsSpec extends SparkSpec {

  test("v10: true cardinality matches a real join; estimate laws hold") {
    val out = Validation.joinCardinality(spark, sf()).collect()
    assert(out.length == 5)
    val byEdge = out.map(r => r.getString(0) -> r).toMap
    // brute force the lineitem⋈part edge with an actual join
    val li = G.table(spark, sf(), "lineitem")
    val pt = G.table(spark, sf(), "part")
    val actual = li.join(pt, li("l_partkey") === pt("p_partkey")).count()
    assert(byEdge("lineitem*part@partkey").getLong(5) == actual)
    out.foreach { r =>
      val (nl, nr, ndvl, ndvr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ndvl <= nl && ndvr <= nr)
      val est = r.getDouble(6)
      assert(est == nl.toDouble * nr / math.max(ndvl, ndvr))
      assert(r.getDouble(7) == est / r.getLong(5).toDouble)
    }
    // PK-FK edge: every lineitem hits exactly one order → truth == n_left
    val e = byEdge("lineitem*orders@orderkey")
    assert(e.getLong(5) == e.getLong(1))
  }

  test("v11: skew stats match a direct recompute; invariants hold") {
    val out = Validation.skewReport(spark, sf()).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val (n, ndv, top1, hot) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6))
      assert(top1 * ndv >= n)        // max >= mean
      assert(hot * 32 >= n)          // max partition >= ideal share
      assert(r.getDouble(7) >= 1.0)  // imbalance >= 1
      assert(r.getBoolean(8) == (r.getDouble(7) > 2.0))
    }
    // brute-force the hottest user_id count
    val expTop = G.table(spark, sf(), "events")
      .groupBy(col("user_id")).count()
      .agg(max("count")).head().getLong(0)
    val row = out.find(_.getString(0) == "events.user_id").get
    assert(row.getLong(3) == expTop)
    // a handful of sources over many rows MUST be flagged for salting
    assert(out.find(_.getString(0) == "documents.source").get.getBoolean(8))
  }

  test("a20: bucket picks bracket the exact percentiles") {
    val out = DashboardQueries.logHistogram(spark, sf()).collect()
    assert(out.nonEmpty)
    val cents = G.table(spark, sf(), "events")
      .select(col("event_type"),
        floor(col("value") * 100.0).cast("long").as("c"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
    out.foreach { r =>
      val vs = cents(r.getString(0))
      assert(r.getLong(1) == vs.length)
      def exact(q: Int): Long = vs((vs.length * q + 99) / 100 - 1)
      for ((q, i) <- Seq((50, 3), (90, 4), (99, 5))) {
        val lo = r.getLong(i)
        val ex = exact(q)
        // the exact value lies in the picked bucket: [lo, lo + width),
        // width = pow2/4 <= lo/4 (+2 covers the tiny-decade buckets)
        assert(ex >= lo && ex <= lo + lo / 4 + 2,
          s"${r.getString(0)} p$q: lo=$lo exact=$ex")
      }
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(5))
    }
  }

  test("g7: fixed-point PPR matches an in-memory recompute exactly") {
    val li = G.table(spark, sf(), "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = li.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2)
      for (u <- ps; v <- ps if u < v) yield (u, v)
    }.distinct
    val adj = (edges ++ edges.map { case (u, v) => (v, u) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = adj.map { case (k, vs) => k -> vs.length.toLong }
    val brand = G.table(spark, sf(), "part")
      .filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val seeds = adj.keySet.filter(brand)
    val unit = 1000000000000L
    val seedU = unit / seeds.size
    val restartU = 15L * seedU / 100L
    var r = seeds.map(_ -> seedU).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
      r.foreach { case (u, ru) =>
        val m = ru / deg(u)
        adj(u).foreach(v => contrib(v) = contrib.getOrElse(v, 0L) + m)
      }
      val touched = contrib.keySet ++ seeds
      r = touched.map { v =>
        v -> ((if (seeds(v)) restartU else 0L) +
          85L * contrib.getOrElse(v, 0L) / 100L)
      }.toMap
    }
    val expTop = r.toSeq.map { case (n, u) => (u.toDouble / 1e12, n) }
      .sortBy { case (p, n) => (-p, n) }.take(100)
    val got = Graph.ppr(spark, sf()).collect()
      .map(row => (row.getDouble(2), row.getLong(0)))
    assert(got.toSeq == expTop)
  }

  test("p11: drop counts are monotone in delay and vanish at the holdback") {
    val out = CdcParser.lateAudit(spark, sf()).collect()
    val drops = out.filter(_.getString(0) == "drop")
      .map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
    assert(drops.length == 5)
    assert(drops.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
    assert(drops.last._2 == 0L)  // delay == the 7-day holdback drops nothing
    assert(drops.head._2 > 0L)   // zero allowed lateness drops the deep ones
    def stat(s: String): Long =
      out.find(_.getString(0) == s).get.getLong(2)
    val parsed = CdcParser.cdcParseRoundtrip(spark, sf()).count()
    assert(stat("events") == parsed)
    assert(stat("late_p50") == 0L)               // most rows are on time
    assert(stat("late_max") <= 604800000L)       // lateness <= the 7d holdback
    assert(stat("late_p50") <= stat("late_p95") &&
      stat("late_p95") <= stat("late_p99") &&
      stat("late_p99") <= stat("late_max"))
  }

  test("stream_late: the engine drops exactly the deep redeliveries") {
    val out = graft.streaming.StreamingJobs.lateWindowReplay(spark, sf())
      .agg(sum("n_trades")).head().getLong(0)
    val parsed = CdcParser.cdcParseRoundtrip(spark, sf())
      .select(col("trade_id"), col("cdc_ts"))
    val cmax = parsed.agg(max("cdc_ts")).head().getLong(0)
    val deep = parsed
      .filter(col("trade_id") % 101 === 0 &&
        col("cdc_ts") <= cmax - 691200000L).count()
    val total = parsed.count()
    assert(deep > 0, "fixture must inject at least one deep redelivery")
    assert(out == total - deep)
  }
}
