package graft

import graft.operators.{Graph, Relational, Validation}
import org.apache.spark.sql.functions._

/** Round-7 eighth wave: TPC-H-shaped relational classics. */
class Round9OpsSpec extends SparkSpec {

  test("r26 shipping priority: plan pin — customer broadcasts, top-10 is " +
    "TakeOrderedAndProject (no global sort), date filters pushed") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = Relational.shippingPriority(spark, sf())
        d.collect()
        d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s"customer not broadcast:\n$s")
    assert(s.contains("TakeOrderedAndProject"), s"top-10 ran a global sort:\n$s")
    // both date predicates reach the parquet scans as pushed filters
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("o_orderdate") && pushed.contains("l_shipdate"),
      s"date filters not pushed: $pushed")
  }

  test("r27 small-qty revenue: decorrelated plan scans lineitem ONCE " +
    "(window, not agg+self-join) and broadcasts part") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = Relational.smallQtyRevenue(spark, sf())
        d.collect()
        d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val liScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.getOrElse("Location", "").contains("lineitem") => f
    }
    assert(liScans.length == 1, s"lineitem scanned ${liScans.length}x:\n$plan")
    assert(plan.toString.contains("BroadcastHashJoin"))
    assert(plan.toString.contains("Window"))
  }

  test("r27 small-qty revenue: per-brand rows recompute from a brute " +
    "per-part average") {
    val rows = Relational.smallQtyRevenue(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val avg = li.groupBy(_._1).view
      .mapValues(g => g.map(_._2).sum / g.length).toMap
    val smallKeys = li.filter { case (p, q) => q < 0.2 * avg(p) }
    val brand = spark.read.parquet(s"${sf()}/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = smallKeys.groupBy(x => brand(x._1)).view
      .mapValues(_.length.toLong).toMap
    assert(rows == want)
  }

  test("r28 lateral top-k: decorrelates to a keyed plan (no cartesian / " +
    "nested-loop), emits <=3 rows per customer in descending order") {
    val d = Relational.lateralTopOrders(spark, sf())
    val rows = d.collect()
    val s = d.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), s"cartesian lateral:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"), s"nested-loop lateral:\n$s")
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.values.forall(_.length <= 3))
    byCust.values.foreach { g =>
      val tp = g.map(_.getDouble(3))
      assert(tp.zip(tp.tail).forall { case (a, b) => a >= b })
    }
  }

  test("r29 sales opportunity: reported customers truly have no recent " +
    "orders and sit above the positive-balance average") {
    val segs = Relational.salesOpportunity(spark, sf()).collect()
    val cust = spark.read.parquet(s"${sf()}/customer.parquet").collect()
    val pos = cust.map(_.getAs[Double]("c_acctbal")).filter(_ > 0)
    val thresh = pos.sum / pos.length
    val recent = spark.read.parquet(s"${sf()}/orders.parquet")
      .filter(col("o_orderdate") >= lit("2000-09-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val want = cust
      .filter(r => r.getAs[Double]("c_acctbal") > thresh &&
        !recent(r.getAs[Long]("c_custkey")))
      .groupBy(_.getAs[String]("c_mktsegment")).view
      .mapValues(_.length.toLong).toMap
    assert(segs.map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    assert(segs.nonEmpty, "vacuous: no lapsed high-balance customers")
  }

  test("r30 late-priority audit: semi-join counts each order once and " +
    "matches a brute recompute") {
    val got = Relational.latePriorityAudit(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ship = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .selectExpr("l_orderkey", "CAST(CAST(l_shipdate AS TIMESTAMP) AS LONG) ship_s").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = spark.read.parquet(s"${sf()}/orders.parquet")
      .selectExpr("o_orderkey", "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) ord_s",
        "o_orderpriority").collect()
      .filter { r =>
        ship.get(r.getLong(0)).exists(_ > r.getLong(1) + 60L * 86400L)
      }
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    assert(got == want)
  }

  test("st6 bucketed join: result through bucketed storage equals the " +
    "direct in-memory join") {
    val got = Tables.bucketedJoin(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    val status = spark.read.parquet(s"${sf()}/orders.parquet")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = li.groupBy(status).view.mapValues(_.length.toLong).toMap
    assert(got.map(x => x._1 -> x._2).toMap == want)
  }

  test("v14 k-anonymity: k is the minimum class size and members " +
    "reconcile to the customer count") {
    val rows = Validation.kAnonymity(spark, sf()).collect()
    val sizes = rows.map(_.getAs[Long]("n_members"))
    val k = rows.map(_.getAs[Long]("k_anonymity")).distinct
    assert(k.length == 1 && k.head == sizes.min)
    assert(sizes.sum ==
      spark.read.parquet(s"${sf()}/customer.parquet").count())
    rows.foreach(r => assert(
      r.getAs[Boolean]("risky") == (r.getAs[Long]("n_members") < 10)))
  }

  test("g11 modularity: degree sums reconcile to 2m, intra edges to <= m, " +
    "and Q stays in [-1, 1]") {
    val rows = Graph.modularity(spark, sf()).collect()
    assert(rows.nonEmpty)
    val m = rows.map(_.getAs[Long]("m")).distinct
    assert(m.length == 1)
    assert(rows.map(_.getAs[Long]("d_sum")).sum == 2 * m.head)
    assert(rows.map(_.getAs[Long]("e_in")).sum <= m.head)
    val q = rows.map(_.getAs[Double]("contribution")).sum
    assert(q >= -1.0 - 1e-12 && q <= 1.0 + 1e-12)
  }

  test("r31 local-supplier volume: all three dimensions broadcast; the " +
    "only sort-merge or shuffled join is the fact-to-fact one") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // kill the auto threshold so ONLY the explicit broadcast() hints fire —
    // at test SF the fact join would otherwise auto-broadcast too
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try {
        val d = Relational.localSupplierVolume(spark, sf())
        d.collect()
        d.queryExecution.executedPlan
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
    val s = plan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(s).length
    assert(nBroadcast == 3, s"expected 3 broadcast joins, got $nBroadcast:\n$s")
    assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"),
      s"fact-to-fact join missing:\n$s")
  }

  test("r32 revenue forecast: every predicate pushes into the scan and " +
    "only the needed columns are read") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = Relational.revenueForecast(spark, sf())
        d.collect()
        d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"filters not pushed: $pushed")
    val readSchema = scans.head.metadata.getOrElse("ReadSchema", "")
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_returnflag"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("r33 returned items: returnflag filter pushes to the lineitem scan " +
    "and the top-20 runs as TakeOrderedAndProject") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = Relational.returnedItemReport(spark, sf())
        d.collect()
        d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"), s"global sort for top-20:\n$s")
    val pushed = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("l_returnflag"), s"returnflag not pushed: $pushed")
  }

  test("r34 disjunctive revenue: rows satisfy exactly their brand clause " +
    "(brute recompute of per-brand counts)") {
    val got = Relational.disjunctiveRevenue(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val size = spark.read.parquet(s"${sf()}/part.parquet")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val want = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_partkey", "l_quantity").collect()
      .flatMap { r =>
        val (b, sz) = size(r.getLong(0)); val q = r.getDouble(1)
        val hit =
          (b == "Brand#1" && sz >= 1 && sz <= 15 && q >= 1 && q <= 11) ||
          (b == "Brand#2" && sz >= 1 && sz <= 25 && q >= 10 && q <= 20) ||
          (b == "Brand#3" && sz >= 1 && sz <= 35 && q >= 20 && q <= 30)
        if (hit) Some(b) else None
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want)
  }

  test("r35 volume shipping: only cross-nation pairs appear, both " +
    "directions, years within the window") {
    // sf0.001 has no cross-trade between these two nations in the window;
    // the law needs the populated graph
    val rows = Relational.volumeShipping(spark, sf("0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != r.getString(1))
      assert(Set("NATION_1", "NATION_2")(r.getString(0)))
      val y = r.getInt(2)
      assert(y >= 1997 && y <= 1998)
    }
  }

  test("r36 market share: the ratio is numerator/denominator and stays " +
    "in [0, 1]") {
    val rows = Relational.marketShare(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nr = r.getAs[Double]("nation_rev")
      val tr = r.getAs[Double]("total_rev")
      val sh = r.getAs[Double]("mkt_share")
      assert(nr >= 0 && nr <= tr)
      assert(math.abs(sh - nr / tr) < 1e-15)
      assert(sh >= 0 && sh <= 1)
    }
  }

  test("r37 large-volume customers: every order tops the quantity " +
    "threshold and value descends") {
    val rows = Relational.largeVolumeCustomers(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250))
    val tp = rows.map(_.getAs[Double]("o_totalprice"))
    assert(tp.zip(tp.tail).forall { case (a, b) => a >= b })
    // threshold reconciles against a brute per-order sum
    val want = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 > 250).keySet
    assert(rows.map(_.getAs[Long]("o_orderkey")).toSet.subsetOf(want))
  }

  test("r38 product margin: brute per-nation-year recompute matches") {
    val got = Relational.productMargin(spark, sf()).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val supNat = spark.read.parquet(s"${sf()}/supplier.parquet")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> nation(r.getInt(1))).toMap
    val ordYear = spark.read.parquet(s"${sf()}/orders.parquet")
      .selectExpr("o_orderkey", "year(o_orderdate) y").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (supNat(r.getLong(1)), ordYear(r.getLong(0))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want)
  }

  test("r39 supplier diversity: distinct pre-aggregation means no band " +
    "exceeds the relation's true supplier count") {
    val rows = Relational.supplierDiversity(spark, sf()).collect()
    assert(rows.nonEmpty)
    val rel = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val band = spark.read.parquet(s"${sf()}/part.parquet")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2) / 10 * 10))
      .toMap
    val want = rel.groupBy(p => band(p._1)).view
      .mapValues(g => (g.map(_._2).size.toLong, g.map(_._1).size.toLong))
      .toMap
    rows.foreach { r =>
      val k = (r.getString(0), r.getInt(1))
      val (ns, np) = want(k)
      assert(r.getAs[Long]("n_suppliers") == ns)
      assert(r.getAs[Long]("n_parts") == np)
    }
  }

  test("r40 waiting suppliers: every reported supplier really shipped " +
    "last on some multi-supplier open order") {
    val rows = Relational.waitingSuppliers(spark, sf()).collect()
    assert(rows.nonEmpty)
    val open = spark.read.parquet(s"${sf()}/orders.parquet")
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey",
        "CAST(CAST(l_shipdate AS TIMESTAMP) AS LONG) s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(t => open(t._1))
    val byOrder = li.groupBy(_._1)
    val want = byOrder.values.flatMap { g =>
      val supps = g.map(_._2).distinct
      if (supps.length <= 1) Nil
      else {
        val mx = g.map(_._3).max
        g.filter(_._3 == mx).map(_._2).distinct
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(want(r.getAs[Long]("s_suppkey")) ==
        r.getAs[Long]("n_waiting_orders"))
    }
  }

  test("stream_union: the hash split is non-degenerate (both sources " +
    "carry rows) and the union replay emits windows") {
    val env = graft.operators.CdcParser.eventsAsEnvelopeJsonTs(spark, sf())
    val cnt = env.select(pmod(xxhash64(col("json")), lit(2L)).as("h"))
      .groupBy("h").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cnt.getOrElse(0L, 0L) > 0 && cnt.getOrElse(1L, 0L) > 0,
      s"degenerate split: $cnt")
    val rows = graft.streaming.StreamingJobs.unionReplay(spark, sf())
    assert(rows.count() > 0)
  }

  test("m12 scene kernel: planted two-scene payload cuts exactly once " +
    "and corpus laws hold") {
    // 4 quiet frames (all 0x01) then 4 loud frames (all 0xff): one jump of
    // 64*(255-1) >> 256 at frame 4, zero jump everywhere else
    val planted = Array.fill(4 * 64)(1.toByte) ++
      Array.fill(4 * 64)(0xff.toByte)
    val (nf, nc, ns, ls) = graft.operators.Multimodal.sceneKernel(planted)
    assert(nf == 8 && nc == 1 && ns == 2 && ls == 4, s"($nf,$nc,$ns,$ls)")
    // flat payload: one scene spanning everything
    val flat = Array.fill(6 * 64)(42.toByte)
    val (f2, c2, s2, l2) = graft.operators.Multimodal.sceneKernel(flat)
    assert(f2 == 6 && c2 == 0 && s2 == 1 && l2 == 6)
    assert(graft.operators.Multimodal.sceneKernel(Array.emptyByteArray) ==
      ((0L, 0L, 0L, 0L)))
    val rows = graft.operators.Multimodal.sceneCuts(spark, sf()).collect()
    rows.foreach { r =>
      val (nfr, ncu, nsc, lsc) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      if (nfr > 0) {
        assert(nsc == ncu + 1)
        assert(lsc >= 1 && lsc <= nfr)
      } else assert(ncu == 0 && nsc == 0 && lsc == 0)
    }
    // the threshold must actually fire on the corpus, or the operator
    // degenerates into a frame counter
    assert(rows.map(_.getLong(2)).sum > 0, "no cuts fired on the corpus")
  }

  test("a23 event gaps: per-type counts reconcile (gaps = rows - streams) " +
    "and a brute max-gap recompute agrees") {
    val rows = graft.operators.DashboardQueries.eventGaps(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val ev = G.eventsRaw(spark, sf())
      .selectExpr("event_type", "user_id", "ts_ns DIV 1000000 ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = ev.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getString(0)
      val streams = byType(t).groupBy(_._2)
      // only streams with >= 2 events produce gaps
      val gappy = streams.filter(_._2.length >= 2)
      assert(r.getAs[Long]("n_streams") == gappy.size)
      assert(r.getAs[Long]("n_gaps") ==
        gappy.values.map(_.length - 1).sum.toLong)
      val maxGap = gappy.values.map { g =>
        val s = g.map(_._3).sorted
        s.zip(s.tail).map { case (a, b) => b - a }.max
      }.max
      assert(r.getAs[Long]("max_gap_ms") == maxGap)
    }
  }

  test("t24 sentence stats: brute split recompute matches and laws hold") {
    val rows = graft.operators.TextAnalysis.sentenceStats(spark, sf())
      .collect()
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val sents = docs(r.getLong(0)).split("[.!?]+").map(_.trim)
        .filter(_.nonEmpty)
      assert(r.getInt(1) == sents.length)
      assert(r.getLong(2) == sents.map(_.length.toLong).sum)
      if (sents.nonEmpty) {
        assert(r.getInt(3) == sents.map(_.length).max)
        assert(math.abs(r.getDouble(4) -
          sents.map(_.length.toLong).sum.toDouble / sents.length) < 1e-12)
      }
    }
    assert(rows.map(_.getInt(1).toLong).sum > 0)
  }

  test("r26 shipping priority: revenue descends and keys are distinct") {
    val rows = Relational.shippingPriority(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("o_orderkey")).distinct.length == rows.length)
  }
}
