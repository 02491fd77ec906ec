package graft

import graft.operators.{DashboardQueries, Dedup, Graph, Multimodal, Similarity, TextAnalysis, Validation}
import org.apache.spark.sql.functions._

/** Round-7 seventh wave: Gopher rule bundle, blob QC, contrastive mining,
  * Benford audit, incremental cluster maintenance. */
class Round8OpsSpec extends SparkSpec {

  test("t22 gopher rules: flags, failure count and keep are consistent " +
    "and metrics recompute from the raw text") {
    val rows = TextAnalysis.gopherRules(spark, sf()).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val flags = Seq("r1_len", "r2_mean_len", "r3_alpha", "r4_stop",
        "r5_symbol", "r6_ttr").map(f => r.getAs[Boolean](f))
      assert(r.getAs[Long]("n_failed") == flags.count(!_))
      assert(r.getAs[Boolean]("keep") == flags.forall(identity))
      // independent recompute of the scalar metrics
      val toks = docs(r.getAs[Long]("doc_id")).toLowerCase
        .split("\\s+").filter(_.nonEmpty)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      val stops = Set("the", "a", "and", "of", "to")
      val nStop = toks.count(stops)
      assert(math.abs(r.getAs[Double]("stop_ratio") -
        nStop.toDouble / math.max(toks.length, 1)) < 1e-12)
      assert(math.abs(r.getAs[Double]("ttr") -
        toks.distinct.length.toDouble / math.max(toks.length, 1)) < 1e-12)
    }
  }

  test("m11 blob QC: Cauchy-Schwarz and dominance bounds hold, stats " +
    "recompute from the raw bytes") {
    val rows = Multimodal.blobQc(spark, sf()).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      val d = r.getAs[Long]("n_distinct_bytes")
      val top = r.getAs[Double]("top_byte_share")
      val simpson = r.getAs[Double]("simpson")
      if (n > 0) {
        // sum c^2 >= n^2/d (Cauchy-Schwarz) and sum c^2 <= maxC * n
        assert(simpson >= 1.0 / d - 1e-12)
        assert(simpson <= top + 1e-12)
        assert(top >= 1.0 / d - 1e-12 && top <= 1.0)
      }
      // full recompute
      val bytes = docs(r.getAs[Long]("doc_id")).getBytes("UTF-8")
      val hist = bytes.groupBy(_ & 0xff).view.mapValues(_.length.toLong)
      assert(d == hist.size)
      if (bytes.nonEmpty) {
        assert(math.abs(top - hist.values.max.toDouble / bytes.length) < 1e-12)
        val ss = hist.values.map(c => c * c).sum
        assert(math.abs(simpson -
          ss.toDouble / (bytes.length.toDouble * bytes.length)) < 1e-12)
      }
    }
  }

  test("y24 contrastive mining: kinds respect labels, ranks are dense, " +
    "sims descend, and the top-1 positive matches brute force") {
    val out = Similarity.hardNegatives(spark, sf()).collect()
    val labels = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byAnchor = out.groupBy(_.getAs[Long]("anchor_id"))
    assert(byAnchor.nonEmpty)
    byAnchor.foreach { case (a, rows) =>
      val (pos, neg) = rows.partition(_.getAs[String]("kind") == "pos")
      assert(pos.length == 3 && neg.length == 3)
      pos.foreach(r => assert(labels(r.getAs[Long]("vec_id")) == labels(a)))
      neg.foreach(r => assert(labels(r.getAs[Long]("vec_id")) != labels(a)))
      Seq(pos, neg).foreach { side =>
        val sorted = side.sortBy(_.getAs[Int]("rank"))
        assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
        val sims = sorted.map(_.getAs[Double]("sim"))
        assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
      }
    }
    // brute-force cross-check of one anchor's top positive
    val vecs = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val (aid, alabel, av) = vecs.find(_._1 == 0L).get
    val best = vecs.filter(v => v._1 != aid && v._2 == alabel)
      .map(v => (cos(v._3, av), v._1)).sortBy(t => (-t._1, t._2)).head._2
    val got = byAnchor(0L).filter(r => r.getAs[String]("kind") == "pos" &&
      r.getAs[Int]("rank") == 1).head.getAs[Long]("vec_id")
    assert(got == best)
  }

  test("v12 benford: digits cover 1..9, shares sum to 1, ratio law holds") {
    val rows = Validation.benford(spark, sf()).collect()
    assert(rows.map(_.getAs[Int]("digit")).sorted.toSeq == (1 to 9))
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("ratio") -
        r.getAs[Double]("share") / r.getAs[Double]("benford_p")) < 1e-12)
      assert(r.getAs[Boolean]("flag_deviant") ==
        (r.getAs[Double]("ratio") > 1.25 || r.getAs[Double]("ratio") < 0.75))
    }
  }

  test("stream_sliding: chained stateful dedup + windowed count equals " +
    "the batch slot construction") {
    val got = graft.streaming.StreamingJobs.slidingDistinctReplay(spark, sf())
      .selectExpr("unix_millis(cast(window_start as timestamp)) win_ms",
        "n_markets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.operators.CdcParser.cdcParseRoundtrip(spark, sf())
      .select(expr("source_ts DIV 900000").as("slot"), col("market"))
      .select(col("market"), explode(expr("sequence(0, 3)")).as("i"),
        col("slot"))
      .select(((col("slot") - col("i")) * 900000L).as("win_ms"), col("market"))
      .groupBy("win_ms")
      .agg(countDistinct(col("market")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("c28 pack lineage: every example accounted for, token sums match " +
    "the packer, capacity respected for multi-doc examples") {
    val lineage = graft.operators.Curation.packLineage(spark, sf()).collect()
    val packed = graft.operators.Curation.seqPack(spark, sf()).collect()
    val byEx = packed.groupBy(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("ex_id")))
    assert(lineage.length == byEx.size)
    lineage.foreach { r =>
      val k = (r.getAs[Long]("shard"), r.getAs[Long]("ex_id"))
      val docs = byEx(k)
      assert(r.getAs[Long]("n_docs") == docs.length)
      val toks = docs.map(_.getAs[Long]("n_tokens")).sum
      assert(r.getAs[Long]("tokens_used") == toks)
      assert(math.abs(r.getAs[Double]("fill_ratio") - toks / 512.0) < 1e-12)
      // a multi-doc example can never exceed capacity (singletons may)
      if (docs.length > 1) assert(toks <= 512)
      assert(r.getAs[Long]("first_doc") ==
        docs.map(_.getAs[Long]("doc_id")).min)
    }
  }

  test("g9 degree histogram: buckets bracket their degrees, node and " +
    "degree totals reconcile with the raw degree frame") {
    val rows = Graph.degreeHistogram(spark, sf()).collect()
    assert(rows.nonEmpty)
    var nodes = 0L
    var degSum = 0L
    rows.foreach { r =>
      val lo = r.getAs[Long]("bucket_lo")
      assert(r.getAs[Long]("min_deg") >= lo)
      assert(r.getAs[Long]("max_deg") < lo * 2)
      nodes += r.getAs[Long]("n_nodes")
      degSum += r.getAs[Long]("sum_deg")
    }
    // sum of degrees = 2 * |edges|; node total = |V| of the bulk graph
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_quantity") >= 30)
      .selectExpr("l_orderkey ok", "l_partkey pk")
    val e = li.as("a").join(li.as("b"), "ok")
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
    val nEdges = e.count()
    val nNodes = e.select(col("u").as("n"))
      .union(e.select(col("v").as("n"))).distinct().count()
    assert(degSum == 2 * nEdges)
    assert(nodes == nNodes)
  }

  test("x17 paragraph dedup: cut counts match a brute-force keep-first " +
    "replay and clean digests reconstruct") {
    val rows = Dedup.paragraphDedup(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_paragraphs"), r.getAs[Long]("n_cut"),
          r.getAs[String]("clean_digest"))).toMap
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSeq)
      .sortBy(_._1)
    // brute-force: global first-occurrence by (doc_id, idx) order
    val seen = scala.collection.mutable.Map[String, (Long, Int)]()
    val chunksOf = docs.map { case (id, ts) =>
      val ch = ts.grouped(20).map(_.mkString(" ")).toArray
      ch.zipWithIndex.foreach { case (c, i) =>
        // docs iterate in ascending (doc_id, idx), so first insert is min
        if (!seen.contains(c)) seen(c) = (id, i)
      }
      id -> ch
    }
    val counts = scala.collection.mutable.Map[String, Int]()
    chunksOf.foreach { case (_, ch) => ch.foreach(c =>
      counts(c) = counts.getOrElse(c, 0) + 1) }
    chunksOf.foreach { case (id, ch) =>
      val cut = ch.zipWithIndex.map { case (c, i) =>
        counts(c) >= 2 && seen(c) != ((id, i)) }
      val (np, nc, dig) = rows(id)
      assert(np == ch.length, s"doc $id paragraph count")
      assert(nc == cut.count(identity), s"doc $id cut count")
      val kept = ch.zip(cut).filter(!_._2).map(_._1).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(dig == md, s"doc $id clean digest")
    }
  }

  test("t23 rerank: permutation of the bm25 shortlist, dense ranks, " +
    "phrase hits recompute from raw text") {
    val out = TextAnalysis.rerank(spark, sf()).collect()
    val base = TextAnalysis.batchRetrieve(spark, sf()).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    val baseByQ = base.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == baseByQ.keySet)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("doc_id")).toSet ==
        baseByQ(q).map(_.getAs[Long]("doc_id")).toSet)
      assert(rows.map(_.getAs[Int]("rerank")).sorted.toSeq ==
        (1 to rows.length))
      // rerank order law: phrase desc, then bm25 score desc, then doc_id
      val sorted = rows.sortBy(_.getAs[Int]("rerank"))
      sorted.zip(sorted.tail).foreach { case (x, y) =>
        val kx = (-x.getAs[Long]("phrase_hits"), -x.getAs[Double]("score"),
          x.getAs[Long]("doc_id"))
        val ky = (-y.getAs[Long]("phrase_hits"), -y.getAs[Double]("score"),
          y.getAs[Long]("doc_id"))
        assert(Ordering[(Long, Double, Long)].lt(kx, ky))
      }
    }
    // independent phrase-hit recompute for every row of one query
    val qterms = TextAnalysis.retrievalQueries.filter(_._1 == 1L).map(_._2).toSet
    val texts = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byQ(1L).foreach { r =>
      val ts = texts(r.getAs[Long]("doc_id")).toLowerCase.split("\\s+")
      val want = ts.zip(ts.tail).count { case (x, y) =>
        qterms(x) && qterms(y) }
      assert(r.getAs[Long]("phrase_hits") == want)
    }
  }

  test("c29 threshold sweep: counts are non-increasing in tau and the " +
    "0.5 row recomputes from raw text") {
    val rows = Dedup.thresholdSweep(spark, sf()).collect()
      .sortBy(_.getAs[Double]("tau"))
    assert(rows.length == 7)
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"))
      assert(lo.getAs[Long]("n_docs_removed") >= hi.getAs[Long]("n_docs_removed"))
    }
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 200).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).sliding(3).filter(_.length == 3).toSet)
    var pairs = 0L
    val removed = scala.collection.mutable.Set[Long]()
    for (i <- docs.indices; j <- (i + 1) until docs.length) {
      val (ida, ga) = docs(i); val (idb, gb) = docs(j)
      val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
      val loG = if (ida < idb) ga else gb
      val hiG = if (ida < idb) gb else ga
      val j05 = (loG & hiG).size.toDouble / (loG | hiG).size
      if (j05 >= 0.5) { pairs += 1; removed += hi }
    }
    val r05 = rows.find(_.getAs[Double]("tau") == 0.5).get
    assert(r05.getAs[Long]("n_pairs") == pairs)
    assert(r05.getAs[Long]("n_docs_removed") == removed.size)
  }

  test("p13 latency histogram: totals reconcile with the parse and the " +
    "percentile picks bracket the exact percentiles") {
    val rows = graft.operators.CdcParser.latencyHistogram(spark, sf())
      .collect()
    val parsed = graft.operators.CdcParser.cdcParseRoundtrip(spark, sf())
      .select("op", "cdc_latency_ms").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byOp = parsed.groupBy(_._1)
    assert(rows.map(_.getAs[String]("op")).toSet == byOp.keySet)
    rows.foreach { r =>
      val op = r.getAs[String]("op")
      val ms = byOp(op).map(_._2).sorted
      assert(r.getAs[Long]("n") == ms.length)
      Seq(50 -> "p50_lo_ms", 90 -> "p90_lo_ms", 99 -> "p99_lo_ms").foreach {
        case (q, cname) =>
          val exact = ms((ms.length * q + 99) / 100 - 1)
          val lo = r.getAs[Long](cname)
          // the pick is the lower bound of the bucket holding the exact
          // percentile: lo <= exact < max(2*lo, 1+lo resolution); the
          // bucket width is <= lo/4 for lo >= 4 (HDR layout), else exact
          val hi = if (lo == 0) 1L else lo + math.max(lo / 4, 1L)
          assert(lo <= exact && exact < hi,
            s"$op $cname: lo=$lo exact=$exact hi=$hi")
      }
    }
  }

  test("v13 order consistency: counts reconcile with a direct recompute") {
    val rows = Validation.orderConsistency(spark, sf()).collect()
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .selectExpr("l_orderkey",
        "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS v")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
      .selectExpr("o_orderkey", "o_orderstatus", "o_totalprice").collect()
    val byStatus = orders.groupBy(_.getString(1))
    assert(rows.map(_.getAs[String]("o_orderstatus")).toSet == byStatus.keySet)
    rows.foreach { r =>
      val os = byStatus(r.getAs[String]("o_orderstatus"))
      assert(r.getAs[Long]("n_orders") == os.length)
      val noLines = os.count(o => !li.contains(o.getLong(0)))
      assert(r.getAs[Long]("n_no_lines") == noLines)
      val mismatch = os.count { o =>
        li.get(o.getLong(0)).exists { vs =>
          math.abs(o.getDouble(2) - vs.sum) > o.getDouble(2) * 0.001
        }
      }
      // the Spark side sums through DECIMAL(38,6); the plain double sum
      // here can disagree only within rounding of the 0.1% band, so pin
      // approximately and exactly count the far-from-boundary cases
      assert(math.abs(r.getAs[Long]("n_mismatch") - mismatch) <= 1,
        s"mismatch count drift: ${r.getAs[Long]("n_mismatch")} vs $mismatch")
    }
  }

  test("stream_latency: incrementally merged histogram equals the " +
    "one-shot batch report") {
    val got = graft.streaming.StreamingJobs.latencyReplay(spark, sf())
      .collect().map(_.toSeq).toSet
    val want = graft.operators.CdcParser.latencyHistogram(spark, sf())
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("g10 assortativity: exact in-memory recompute and r in [-1, 1]") {
    val r = Graph.assortativity(spark, sf()).collect().head
    val rr = r.getAs[Double]("assortativity")
    assert(rr >= -1.0 - 1e-12 && rr <= 1.0 + 1e-12)
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_quantity") >= 30)
      .selectExpr("l_orderkey ok", "l_partkey pk").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (x <- ps; y <- ps if x < y) yield (x, y)
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sym = edges.toSeq.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val n = sym.size.toLong
    val sx = sym.map(e => deg(e._1)).sum
    val sxy = sym.map(e => deg(e._1) * deg(e._2)).sum
    val sx2 = sym.map(e => deg(e._1) * deg(e._1)).sum
    assert(r.getAs[Long]("n_endpoints") == n)
    assert(r.getAs[Long]("sum_deg") == sx)
    assert(r.getAs[Long]("sum_xy") == sxy)
    assert(r.getAs[Long]("sum_x2") == sx2)
    val want = (n * sxy - sx * sx).toDouble / (n * sx2 - sx * sx).toDouble
    assert(math.abs(rr - want) < 1e-12)
  }

  test("a22 heatmap: shares sum to 1, calendar fields in range, totals " +
    "match the event count") {
    val rows = DashboardQueries.dowHourHeatmap(spark, sf()).collect()
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val d = r.getAs[Long]("dow"); val h = r.getAs[Long]("hour")
      assert(d >= 0 && d < 7 && h >= 0 && h < 24)
    }
    val total = spark.read.parquet(s"${sf()}/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("t23 plan pin: stage-2 joins broadcast (no corpus shuffle) and " +
    "the phrase HOF runs post-join") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = TextAnalysis.rerank(spark, sf()); d.collect()
        d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s"no broadcast join:\n$s")
    assert(!s.contains("SortMergeJoin"), s"corpus shuffled through SMJ:\n$s")
  }

  test("c27 incremental cluster maintenance equals the full recompute " +
    "and the base/delta split is non-trivial") {
    val inc = Dedup.incrementalClusters(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.dedupClusters(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full)
    // non-vacuous: the graph must actually split into base and delta edges
    val pairs = Dedup.simhashNearDups(spark, sf())
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delta = pairs.count { case (a, b) => a % 5 == 0 || b % 5 == 0 }
    assert(delta > 0 && delta < pairs.length,
      s"degenerate split: $delta of ${pairs.length} delta edges")
  }
}
