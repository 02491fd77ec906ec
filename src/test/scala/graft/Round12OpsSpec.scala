package graft

import org.apache.spark.sql.functions._

/** Round-8 wave: dynamic partition pruning through real storage (st7). */
class Round12OpsSpec extends SparkSpec {

  test("st7 dpp: the fact scan carries a dynamicpruning partition filter " +
    "— runtime pruning, not static — and the result covers exactly the " +
    "quarter") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (rows, plan) =
      try {
        val d = Tables.dppJoin(spark, sf())
        val r = d.collect()
        (r, d.queryExecution.executedPlan)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(rows.nonEmpty && rows.length <= 3)
    assert(rows.forall(_.getString(0).startsWith("1997-0")))
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val pf = scans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString
    assert(pf.contains("dynamicpruning"),
      s"fact scan has no runtime pruning subquery: $pf\n$plan")
    // the decisive runtime metric: of the ~85 month partitions on disk,
    // the fact scan touched only the quarter's 3
    val factScan = scans.find(
      _.metadata.getOrElse("PartitionFilters", "").contains("dynamicpruning"))
    assert(factScan.isDefined)
    val nPart = factScan.get.metrics.get("numPartitions").map(_.value)
    assert(nPart.contains(3L),
      s"expected 3 partitions read, metric says $nPart " +
        s"(metrics: ${factScan.get.metrics.keys.mkString(", ")})")
    // and the reconciliation: the pruned scan lost no rows vs the
    // unpartitioned recompute
    val want = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .filter(col("ship_month").isin("1997-01", "1997-02", "1997-03"))
      .groupBy(col("ship_month")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_lines") == want(r.getString(0)))
    }
  }

  test("m13 multimodal pack: brute greedy recompute agrees, capacity is " +
    "respected, and the text/media split reconciles") {
    val rows = graft.operators.Multimodal.multimodalPack(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def cost(text: String): (Long, Long) = {
      val t = text.split("\\s+").length.toLong
      val m = if (text.length >= 50) 144L else 0L
      (t, m)
    }
    rows.foreach { r =>
      val (t, m) = cost(docs(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_text_tokens") == t)
      assert(r.getAs[Long]("n_media_tokens") == m)
      assert(r.getAs[Long]("n_tokens") == t + m)
      assert(r.getAs[Long]("ex_offset") + r.getAs[Long]("n_tokens") <= 1024L,
        s"doc ${r.getAs[Long]("doc_id")} overflows its example")
    }
    // brute greedy fold per shard
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("doc_id"))
      var ex = 0L; var cur = 0L; var first = true
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        if (first) { cur = n; first = false }
        else if (cur + n > 1024L) { ex += 1; cur = n }
        else { cur += n }
        assert(r.getAs[Long]("ex_id") == ex)
      }
    }
  }

  test("stream_waterfill: the micro-batch-maintained allocation is " +
    "byte-identical to the one-shot batch c30 report") {
    val streamed = graft.streaming.StreamingJobs
      .waterfillReplay(spark, sf()).collect()
    val batch = graft.operators.Curation
      .waterfillAllocation(spark, sf()).collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }

  test("g13 multi-seed ppr: brute integer recompute of all four " +
    "personalizations matches the top-10s exactly") {
    val rows = graft.operators.Graph.pprMulti(spark, sf()).collect()
    assert(rows.nonEmpty)
    // rebuild the graph in memory
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_quantity") >= 30)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    li.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).distinct
      for (u <- ps; v <- ps if u != v)
        adj(u) = v :: adj.getOrElse(u, Nil)
    }
    val adjD = adj.map { case (k, v) => k -> v.distinct }
    val deg = adjD.map { case (k, v) => k -> v.length.toLong }
    val seeds = adjD.keys.toSeq.sorted.take(4)
    val unit = 1000000000000L
    val restartU = 15L * unit / 100L
    val expect = seeds.flatMap { seed =>
      var r = Map(seed -> unit)
      for (_ <- 1 to 3) {
        val contrib = scala.collection.mutable.Map.empty[Long, Long]
        r.foreach { case (c, rc) =>
          val d = deg(c)
          adjD(c).foreach { nb =>
            contrib(nb) = contrib.getOrElse(nb, 0L) + rc / d
          }
        }
        val nodes = contrib.keySet + seed
        r = nodes.map { n =>
          n -> ((if (n == seed) restartU else 0L) +
            85L * contrib.getOrElse(n, 0L) / 100L)
        }.toMap
      }
      r.toSeq.sortBy { case (n, v) => (-v, n) }.take(10).zipWithIndex
        .map { case ((n, v), i) => (seed, (i + 1).toLong, n, v) }
    }
    val got = rows.map(r => (r.getAs[Long]("seed"), r.getAs[Long]("rnk"),
      r.getAs[Long]("node"),
      math.round(r.getAs[Double]("ppr") * 1e12)))
    assert(got.toSeq == expect,
      s"mismatch:\n got ${got.toSeq}\nwant $expect")
  }
}
