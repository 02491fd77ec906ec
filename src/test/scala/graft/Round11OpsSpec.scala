package graft

import graft.operators.{CdcParser, Graph, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-8 wave: Zipf vocabulary audit (t25), CDC ordering audit (p14),
  * landmark BFS (g12), filtered vector search (y25). */
class Round11OpsSpec extends SparkSpec {

  test("t25 zipf: brute trigram recompute matches the histogram exactly " +
    "and both shares sum to 1") {
    val rows = TextAnalysis.zipfAudit(spark, sf()).collect()
    assert(rows.nonEmpty)
    val freqs = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select("text").collect().foreach { r =>
        val t = r.getString(0).toLowerCase.split("\\s+")
        if (t.length >= 3)
          (0 to t.length - 3).foreach { i =>
            val g = s"${t(i)} ${t(i + 1)} ${t(i + 2)}"
            freqs(g) = freqs.getOrElse(g, 0L) + 1L
          }
      }
    val hist = freqs.values.groupBy(f => 63 - java.lang.Long.numberOfLeadingZeros(f))
      .map { case (b, v) => b.toLong -> (v.size.toLong, v.sum) }
    assert(rows.length == hist.size)
    rows.foreach { r =>
      val (n, occ) = hist(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_grams") == n)
      assert(r.getAs[Long]("n_occurrences") == occ)
      assert(r.getAs[Long]("freq_lo") ==
        (1L << r.getAs[Long]("bucket").toInt))
    }
    assert(math.abs(rows.map(_.getAs[Double]("gram_share")).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_.getAs[Double]("mass_share")).sum - 1.0) < 1e-12)
  }

  test("p14 ordering audit: event counts reconcile to the parse and a " +
    "brute per-market inversion recompute agrees") {
    val rows = CdcParser.orderingAudit(spark, sf()).collect()
    assert(rows.nonEmpty)
    val parsed = CdcParser.cdcParseRoundtrip(spark, sf())
      .select("market", "sequential_id", "trade_id", "cdc_ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_.getAs[Long]("n_events")).sum == parsed.length)
    val cmax = parsed.map(_._4).max
    def arrival(tradeId: Long, cdcTs: Long): Long =
      cdcTs + (if (tradeId % 101 == 0 && cdcTs <= cmax - 691200000L)
        604800000L
      else if (tradeId % 103 == 0 && tradeId % 101 != 0) 21600000L
      else 0L)
    val byMarket = parsed.groupBy(_._1)
    rows.foreach { r =>
      val m = r.getString(0)
      val seq = byMarket(m)
        .map(p => (arrival(p._3, p._4), p._2, p._3))
        .sortBy(p => (p._1, p._2, p._3)).map(_._2)
      val inv = seq.zip(seq.tail).count { case (a, b) => a > b }
      val maxReg = (seq.zip(seq.tail).collect {
        case (a, b) if a > b => a - b
      } :+ 0L).max
      assert(r.getAs[Long]("n_inversions") == inv, s"market $m")
      assert(r.getAs[Long]("max_regression") == maxReg, s"market $m")
    }
    // the perturbation must produce real damage, or the audit is vacuous
    assert(rows.map(_.getAs[Long]("n_inversions")).sum > 0)
  }

  test("g12 landmarks: brute 4-source BFS recompute matches and each " +
    "landmark reaches itself at distance 0") {
    val rows = Graph.landmarkDistances(spark, sf()).collect()
    assert(rows.nonEmpty)
    // rebuild the co-purchase graph in memory
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_quantity") >= 30)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    byOrder.foreach { g =>
      val ps = g.map(_._2).distinct
      for (u <- ps; v <- ps if u != v)
        adj(u) = adj.getOrElse(u, Set.empty) + v
    }
    val landmarks = adj.keys.toSeq.sorted.take(4)
    val expect = scala.collection.mutable.Map.empty[(Long, Long), Long]
    landmarks.foreach { lm =>
      var frontier = Set(lm)
      val dist = scala.collection.mutable.Map(lm -> 0L)
      for (d <- 1 to 4) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(n => dist(n) = d.toLong)
      }
      dist.values.foreach { d =>
        expect((lm, d)) = expect.getOrElse((lm, d), 0L) + 1L
      }
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") ==
        expect((r.getAs[Long]("landmark"), r.getAs[Long]("dist"))))
    }
    landmarks.foreach { lm =>
      val self = rows.find(r =>
        r.getAs[Long]("landmark") == lm && r.getAs[Long]("dist") == 0L)
      assert(self.exists(_.getAs[Long]("n_nodes") == 1L))
    }
  }

  test("y25 filtered search: per-query laws hold and every returned " +
    "candidate satisfies the predicate implicitly via recall bounds") {
    val rows = Similarity.filteredSearch(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("k_returned")
      val h = r.getAs[Long]("n_hits")
      assert(k <= 3 && h <= k)
      assert(r.getAs[Long]("n_postfilter_cand") >= k)
      assert(math.abs(r.getAs[Double]("recall_at_3") - h / 3.0) < 1e-15)
    }
    // determinism: a second run is byte-identical (shared memo + fixed
    // tie-breaks)
    val again = Similarity.filteredSearch(spark, sf()).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("c30 waterfill: brute max-min allocation recompute agrees and " +
    "the allocations spend the budget exactly") {
    val rows = graft.operators.Curation.waterfillAllocation(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val avail = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("source", "size(split(text, '\\\\s+')) AS nt").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getInt(1).toLong).sum).toMap
    val total = avail.values.sum
    val budget = total * 9 / 10
    // brute water-fill: sort ascending, fill
    val asc = avail.toSeq.sortBy { case (s, a) => (a, s) }
    var rem = budget; var m = asc.length
    val expect = scala.collection.mutable.Map.empty[String, Long]
    var capped = List.empty[String]
    asc.zipWithIndex.foreach { case ((s, a), idx) =>
      if (capped.isEmpty && a * (asc.length - idx) <= rem) {
        // a full grant here still leaves >= level a for every later
        // source (the <= vs < boundary is allocation-equivalent: at
        // equality the common level equals this avail exactly)
        expect(s) = a; rem -= a; m -= 1
      } else capped = capped :+ s
    }
    val q = if (m > 0) rem / m else 0L
    val r = if (m > 0) rem % m else 0L
    capped.zipWithIndex.foreach { case (s, j) =>
      expect(s) = q + (if (j < r) 1L else 0L)
    }
    rows.foreach { row =>
      val s = row.getString(0)
      assert(row.getAs[Long]("avail") == avail(s))
      assert(row.getAs[Long]("allocation") == expect(s),
        s"source $s: got ${row.getAs[Long]("allocation")}, want ${expect(s)}")
      assert(row.getAs[Long]("allocation") <= avail(s))
    }
    assert(rows.map(_.getAs[Long]("allocation")).sum ==
      math.min(budget, total))
  }

  test("stream_centroids: the micro-batch-maintained refresh is " +
    "byte-identical to the one-shot batch y18 report") {
    val streamed = graft.streaming.StreamingJobs
      .centroidsReplay(spark, sf()).collect()
    val batch = Similarity.centroidRefresh(spark, sf()).collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    // the refresh must absorb real deltas, or the stream proved nothing
    assert(streamed.map(_.getAs[Long]("n_delta")).sum > 0)
  }
}
