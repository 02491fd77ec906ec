package graft

import graft.operators.{CdcParser, Curation, DashboardQueries, Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Round-6 third wave: SCD Type-2 changelog history, the bigram-LM quality
  * scorer, and the SpaceSaving mergeable-Aggregator heavy hitters — sketch
  * bounds pinned against exact counts, SCD2 pinned against the snapshot
  * apply, and the scale-critical plan shapes pinned like Round5OpsSpec. */
class Round6bOpsSpec extends SparkSpec {

  private def executed(df: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ------------------------------------------------------------ SpaceSaving

  test("spacesaving: exact (err 0) while under capacity, across partitions") {
    import spark.implicits._
    val data = List.fill(50)("a") ++ List.fill(30)("b") ++
      List.fill(20)("c") ++ (1 to 15).map(i => s"n$i")
    val ss = udaf(new graft.functions.SpaceSaving.Agg(100))
    val out = spark.createDataset(data).repartition(7)
      .agg(ss(col("value")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.bigram"), col("h.cnt_est"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = out.map { case (k, c, _) => k -> c }.toMap
    assert(got("a") == 50 && got("b") == 30 && got("c") == 20)
    assert(got.size == 18)
    assert(out.forall(_._3 == 0L), "under-capacity summary must be exact")
  }

  test("spacesaving: bounds + heavy-item recall on planted zipf, small capacity") {
    import spark.implicits._
    // deterministic zipf: item w_i appears floor(2000/i) times, i in 1..200
    val data = (1 to 200).flatMap(i => List.fill(2000 / i)(s"w$i")).toList
    val n = data.size
    val capacity = 64
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ss = udaf(new graft.functions.SpaceSaving.Agg(capacity))
    val out = spark.createDataset(data).repartition(7)
      .agg(ss(col("value")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.bigram"), col("h.cnt_est"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every reported item: cnt_est - err <= true <= cnt_est
    out.foreach { case (k, est, err) =>
      val t = truth.getOrElse(k, 0L)
      assert(t <= est, s"$k: true $t above estimate $est")
      assert(est - err <= t, s"$k: lower bound ${est - err} above true $t")
    }
    // every item with true frequency > n/capacity is present
    val reported = out.map(_._1).toSet
    val heavy = truth.filter(_._2 > n.toLong / capacity).keySet
    assert(heavy.nonEmpty && heavy.subsetOf(reported),
      s"missed heavy items: ${heavy -- reported}")
  }

  test("spacesaving: sf bigram sketch bounded by the exact q_c4 twin stream") {
    // full summary (k = capacity), checked against exact counts of the
    // identical bigram stream
    val sketch = Curation.heavyHitters(spark, sf(), capacity = 256, k = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = G.table(spark, sf(), "documents")
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("bigram", explode(expr(
        """CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(1, size(toks) - 1),
          |         i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
          |  ELSE array() END""".stripMargin)))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(sketch.nonEmpty && sketch.length <= 256)
    sketch.foreach { case (k, est, err) =>
      val t = exact.getOrElse(k, 0L)
      assert(t <= est && est - err <= t,
        s"$k: true $t outside [${est - err}, $est]")
    }
    val reported = sketch.map(_._1).toSet
    val heavy = exact.filter(_._2 > n / 256).keySet
    assert(heavy.subsetOf(reported), s"missed: ${heavy -- reported}")
  }

  test("streaming heavy hitters: whole-stream bounds hold vs exact counts") {
    val sketch = graft.streaming.StreamingJobs
      .heavyHitterReplay(spark, sf(), capacity = 256, k = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = G.table(spark, sf(), "documents")
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("bigram", explode(expr(
        """CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(1, size(toks) - 1),
          |         i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
          |  ELSE array() END""".stripMargin)))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(sketch.nonEmpty)
    sketch.foreach { case (k, est, err) =>
      val t = exact.getOrElse(k, 0L)
      assert(t <= est && est - err <= t,
        s"$k: true $t outside [${est - err}, $est] after streaming merges")
    }
    val heavy = exact.filter(_._2 > n / 256).keySet
    val reported = sketch.map(_._1).toSet
    assert(heavy.subsetOf(reported), s"missed: ${heavy -- reported}")
  }

  test("funnel: step times strictly ordered, steps law, signup grounding") {
    val r = DashboardQueries.funnel(spark, sf("0.01")).cache()
    assert(r.count() > 0)
    assert(r.filter(col("t_view").isNotNull &&
      col("t_view") <= col("t_signup")).count() == 0)
    assert(r.filter(col("t_purchase").isNotNull &&
      col("t_purchase") <= col("t_view")).count() == 0)
    // a purchase step requires a view step
    assert(r.filter(col("t_purchase").isNotNull &&
      col("t_view").isNull).count() == 0)
    assert(r.filter(col("steps") =!= (lit(1L)
      + when(col("t_view").isNotNull, 1L).otherwise(0L)
      + when(col("t_purchase").isNotNull, 1L).otherwise(0L))).count() == 0)
    // exactly the signup users enter the funnel
    val signups = G.eventsRaw(spark, sf("0.01"))
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(r.count() == signups)
    r.unpersist()
  }

  test("ann recall: per-query recall in [0,1] over exactly k=3 returned") {
    val r = graft.operators.Similarity.annRecall(spark, sf()).collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getLong(1) == 3L, s"expected 3 returned: $row")
      val rec = row.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $row")
      assert(row.getLong(2) <= 3L)
    }
  }

  test("pagerank: probability mass conserved, ranks positive, floor respected") {
    val r = graft.operators.Dedup.pageRank(spark, sf()).cache()
    val n = r.count()
    assert(n > 0)
    // no dangling nodes (undirected edges) → Σ rank is invariant at 1
    val total = r.agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"mass not conserved: $total")
    // every rank at least the teleport floor 0.15/n
    assert(r.filter(col("rank") < lit(0.15) / lit(n.toDouble) - 1e-12)
      .count() == 0)
    assert(r.filter(col("deg") < 1).count() == 0)
    r.unpersist()
    spark.catalog.clearCache()
  }

  test("canonical selection: consistent with c10 clusters, quality-maximal") {
    val canon = graft.operators.Dedup.canonicalPerCluster(spark, sf("0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val clusters = graft.operators.Dedup.dedupClusters(spark, sf("0.01"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon.nonEmpty && canon.length == clusters.size)
    canon.foreach { case (cid, n, _, _) =>
      assert(clusters(cid) == n, s"cluster $cid size mismatch")
    }
    // the canonical doc's quality is the maximum of its cluster —
    // re-derive from quality scores of all docs (clusters are small here)
    val quality = graft.operators.TextAnalysis.qualityScore(spark, sf("0.01"))
      .select(col("doc_id"), col("quality_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    canon.foreach { case (_, _, doc, q) =>
      assert(math.abs(quality(doc) - q) < 1e-12)
    }
  }

  // ------------------------------------------------------------------- SCD2

  test("scd2: current version set == snapshot apply; one current per key max") {
    // sf0.01, NOT sf0.001: at sf0.001 every trade_id < 3000, so each key
    // carries exactly one version and lead() never fires — the multi-
    // version semantics this test exists for only appear at sf0.01+
    val hist = CdcParser.scd2History(spark, sf("0.01")).cache()
    // at most one open interval per key
    assert(hist.filter(col("is_current") === 1)
      .groupBy(col("key")).count().filter(col("count") > 1).count() == 0)
    // closed intervals end no earlier than they start only when the payload
    // timestamps agree with the changelog order — not asserted (the
    // changelog's sequential_id is the authority; timestamps are data).
    // The load-bearing check: the open versions ARE the snapshot state.
    val cur = hist.filter(col("is_current") === 1)
      .select(col("key"), col("market"), col("trade_price"),
        col("sequential_id"))
    val snap = CdcParser.snapshotApply(spark, sf("0.01"))
      .select(col("key"), col("market"), col("trade_price"),
        col("sequential_id"))
    assert(cur.exceptAll(snap).count() == 0 &&
      snap.exceptAll(cur).count() == 0,
      "open SCD2 versions must equal the applied snapshot")
    hist.unpersist()
  }

  test("scd2: every non-delete changelog row becomes exactly one version") {
    val hist = CdcParser.scd2History(spark, sf("0.01"))
    // multi-version chains closed with real valid_to intervals must exist
    assert(hist.filter(col("valid_to").isNotNull).count() > 0)
    val changelog = CdcParser.cdcParseRoundtrip(spark, sf("0.01"))
      .filter(col("op") =!= "d")
    assert(hist.count() == changelog.count())
    // versions are unique per (key, sequential_id)
    assert(hist.groupBy(col("key"), col("sequential_id")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("scd2 streaming: incremental maintenance == batch build, 5 micro-batches") {
    val stream = graft.streaming.StreamingJobs.scd2Replay(spark, sf("0.01"))
    val batch = CdcParser.scd2History(spark, sf("0.01"))
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "incremental SCD2 diverged from the batch build")
  }

  // -------------------------------------------------------------- LM score

  test("lm score: scores every multi-token doc, terms bounded below by 1") {
    val r = TextAnalysis.lmScore(spark, sf()).cache()
    val docs = G.table(spark, sf(), "documents")
      .filter(size(split(lower(col("text")), "\\s+")) >= 2).count()
    assert(r.count() == docs)
    // each inverse-probability term is > 1 (numerator adds V >= 2, the
    // denominator adds 1), so the mean is too
    assert(r.filter(col("avg_inv_p") <= 1.0).count() == 0)
    // held_out law matches the hash split
    assert(r.filter(col("held_out") =!=
      when(col("doc_id") % 10 >= 8, 1L).otherwise(0L)).count() == 0)
    // n_bigrams = token count - 1
    val bad = r.join(G.table(spark, sf(), "documents"), "doc_id")
      .filter(col("n_bigrams") =!=
        size(split(lower(col("text")), "\\s+")) - 1)
    assert(bad.count() == 0)
    r.unpersist()
  }

  test("lm score: unseen-bigram docs score worse than all-seen docs") {
    // held-in docs reuse trained bigrams; a doc of entirely novel tokens
    // must sit at the maximum possible surprisal V/1 per... construct the
    // comparison from the output itself: the corpus maximum avg_inv_p must
    // exceed the corpus minimum (non-degenerate spread), and train-side
    // mean surprisal <= overall max
    val r = TextAnalysis.lmScore(spark, sf())
    val s = r.agg(min(col("avg_inv_p")).as("lo"), max(col("avg_inv_p")).as("hi"))
      .head()
    assert(s.getDouble(0) < s.getDouble(1), "degenerate LM score spread")
  }

  test("cms counts: deterministic overestimates within eps*N of exact") {
    val eps = 0.001
    val r = Curation.cmsCounts(spark, sf(), eps = eps)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 50)
    val n = G.table(spark, sf(), "documents")
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 2)
      .agg(sum(size(col("toks")) - 1)).head().getLong(0)
    r.foreach { case (k, exact, est) =>
      assert(est >= exact, s"$k: CMS must never underestimate ($est < $exact)")
      assert(est <= exact + (eps * n).toLong + 1,
        s"$k: estimate $est beyond eps*N bound of $exact + ${(eps * n).toLong}")
    }
    // fixed seed + cell-wise merge: estimates identical on re-evaluation
    val r2 = Curation.cmsCounts(spark, sf(), eps = eps)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == r2.toSeq, "CMS estimates must be deterministic")
  }

  test("bloom join: prunes most fact rows pre-shuffle, result == plain join") {
    val r = Relational.bloomJoin(spark, sf("0.01"))
    // oracle-equivalence is the driver's hash check; here pin the LEVER:
    // the bloom probe must actually prune (urgent orders ~1/5 of keys, so
    // well under half the fact rows may survive the filter)
    val orders = G.table(spark, sf("0.01"), "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val nKeys = math.max(orders.count(), 1000L)
    val bloom = orders.stat.bloomFilter("o_orderkey", nKeys, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val probe = udf((k: Long) => bc.value.mightContain(k))
    val li = G.table(spark, sf("0.01"), "lineitem")
    val total = li.count()
    val survived = li.filter(probe(col("l_orderkey"))).count()
    assert(survived < total / 2,
      s"bloom pruned too little: $survived of $total survive")
    // and the pruned-join aggregate matches the unpruned join aggregate
    val plain = G.table(spark, sf("0.01"), "lineitem")
      .join(G.table(spark, sf("0.01"), "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        G.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("l_returnflag"))
    assert(r.exceptAll(plain).count() == 0 && plain.exceptAll(r).count() == 0)
  }

  test("compression ratio: repetitive text below shuffled-unique, deterministic") {
    val r = TextAnalysis.compressionRatio(spark, sf()).cache()
    val docs = G.table(spark, sf(), "documents").count()
    assert(r.count() == docs)
    assert(r.filter(col("ratio") <= 0.0 || col("n_deflate") <= 0).count() == 0)
    // planted contract on the sf corpus itself: the most repetitive docs
    // (few distinct tokens) must compress harder than the most diverse
    val diversity = G.table(spark, sf(), "documents")
      .select(col("doc_id"),
        (size(array_distinct(split(lower(col("text")), "\\s+"))).cast("double")
          / size(split(lower(col("text")), "\\s+"))).as("uniq_frac"))
    val joined = r.join(diversity, "doc_id")
    val lowDiv = joined.orderBy(col("uniq_frac")).limit(50)
      .agg(avg(col("ratio"))).head().getDouble(0)
    val highDiv = joined.orderBy(col("uniq_frac").desc).limit(50)
      .agg(avg(col("ratio"))).head().getDouble(0)
    assert(lowDiv < highDiv,
      s"repetitive docs ($lowDiv) should compress below diverse docs ($highDiv)")
    // determinism on re-evaluation (same zlib, same container)
    assert(r.exceptAll(TextAnalysis.compressionRatio(spark, sf())).count() == 0)
    r.unpersist()
  }

  test("bpe: double-replace merge == simultaneous left-to-right BPE merge") {
    import spark.implicits._
    // the planted worst cases for the shared-delimiter-space hazard:
    // back-to-back occurrences (one replace pass misses every second one)
    // and overlapping self-pairs (only the leftmost may merge)
    val cases = Seq(
      (" a b a b a b </w> ", " a b ", " ab ", " ab ab ab </w> "),
      (" a b a b a b a b </w> ", " a b ", " ab ", " ab ab ab ab </w> "),
      (" a a a </w> ", " a a ", " aa ", " aa a </w> "),
      (" b a b a b </w> ", " b a ", " ba ", " ba ba b </w> "),
      (" a b c a b </w> ", " a b ", " ab ", " ab c ab </w> "),
      (" x y </w> ", " a b ", " ab ", " x y </w> "))
    val df = cases.toDF("spelled", "pat", "rep", "expected")
      .withColumn("got",
        replace(replace(col("spelled"), col("pat"), col("rep")),
          col("pat"), col("rep")))
    val bad = df.filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.map(r =>
      s"${r.getString(0)} -> ${r.getString(4)} (want ${r.getString(3)})")
      .mkString("; "))
  }

  test("bpe: merge counts non-increasing, pairs distinct, census-consistent") {
    val r = TextAnalysis.bpeTrain(spark, sf()).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.length == 8 && r.map(_._1).toSeq == (1L to 8L))
    // a merge can only create pairs at most as frequent as the pair it
    // consumed, and existing pairs only lose occurrences — counts are
    // monotonically non-increasing across rounds
    val counts = r.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"merge counts increased: ${counts.mkString(",")}")
    assert(r.map(_._2).distinct.length == 8, "merge rules must be distinct")
    // round 1's top pair count can never exceed the corpus bigram total
    val total = G.table(spark, sf(), "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(counts.head <= total * 2, "pair count beyond symbol budget")
  }

  test("bpe apply: every doc tokenized, merges strictly reduce symbol count") {
    val r = TextAnalysis.bpeApply(spark, sf()).cache()
    val docs = G.table(spark, sf(), "documents")
      .filter(size(split(lower(col("text")), "\\s+")) >= 1).count()
    assert(r.count() == docs)
    // a word is at least one symbol: n_symbols >= n_tokens, fertility >= 1
    assert(r.filter(col("n_symbols") < col("n_tokens")).count() == 0)
    assert(r.filter(col("fertility") < 1.0).count() == 0)
    // 8 merges must beat the char-level baseline (chars + </w> per word)
    val baseline = G.table(spark, sf(), "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")) + 1), count(lit(1)))
      .head()
    val (baseSyms, nTok) = (baseline.getLong(0), baseline.getLong(1))
    val gotSyms = r.agg(sum(col("n_symbols"))).head().getLong(0)
    assert(gotSyms < baseSyms,
      s"8 merges should compress below char baseline: $gotSyms vs $baseSyms")
    assert(r.agg(sum(col("n_tokens"))).head().getLong(0) == nTok)
    r.unpersist()
  }

  test("drift gate: distances in range; identical halves → zero drift") {
    val r = graft.operators.Validation.drift(spark, sf()).head()
    val (tvd, chi2) = (r.getAs[Double]("tvd"), r.getAs[Double]("chi2"))
    assert(tvd >= 0.0 && tvd <= 1.0, s"tvd out of range: $tvd")
    assert(chi2 >= 0.0 && chi2 <= 2.0, s"chi2 out of range: $chi2")
    // planted null case: comparing a corpus half against itself via the
    // same machinery must report exactly zero drift
    import spark.implicits._
    val same = Seq((0L, "a b c a"), (1L, "a b c a")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift").toString
    same.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val z = graft.operators.Validation.drift(spark, tmp).head()
    assert(z.getAs[Double]("tvd") == 0.0 && z.getAs[Double]("chi2") == 0.0)
  }

  test("plan audit: dynamic partition pruning fires on the partitioned layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val ev = G.events(spark, sf("0.01"))
    Tables.writePartitioned(ev, tmp, "ts", Seq("user_id"), 1)
    // dim: a one-month SELECTIVE FILTER arriving through a join, not a
    // literal on the fact — only DPP can prune the fact scan. The dim must
    // be a source relation with its own predicate (DPP's insertion rule
    // requires a selective filter on the build side; a LIMIT does not
    // qualify).
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("month"))
    spark.read.parquet(tmp).select(col("month")).distinct()
      .withColumn("flag", row_number().over(w))
      .write.mode("overwrite").parquet(s"$tmp-dim")
    val months = spark.read.parquet(s"$tmp-dim").filter(col("flag") === 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.read.parquet(tmp)
        .join(months, Seq("month"))
        .groupBy(col("month")).agg(count(lit(1)).as("n"))
      joined.collect()
      val scans = joined.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.metadata.get("Location").exists(_.contains("graft_dpp")) => s
      }
      assert(scans.nonEmpty)
      assert(scans.exists(_.partitionFilters.exists(
          _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .DynamicPruningExpression]).isDefined)),
        s"no DynamicPruningExpression in fact partitionFilters: " +
          scans.map(_.partitionFilters).mkString(" | "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ------------------------------------------------------------------ plans

  test("plan audit: q_p8 scd2 is one keyed exchange + presentation sort") {
    val plan = executed(CdcParser.scd2History(spark, sf()))
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.length == 2,
      s"expected hash (window) + range (orderBy) exchanges only, got:\n$plan")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName)
    assert(kinds.exists(_.contains("Hash")) && kinds.exists(_.contains("Range")),
      s"unexpected partitionings: $kinds")
  }

  test("pit lookup: unique per probe, every match inside its interval") {
    val r = CdcParser.pitLookup(spark, sf("0.01")).cache()
    assert(r.count() > 0)
    assert(r.groupBy(col("trade_id")).count()
      .filter(col("count") > 1).count() == 0)
    // re-join to the history and check interval containment of each match
    val hist = CdcParser.scd2History(spark, sf("0.01"))
      .select(col("key").as("k2"), col("sequential_id").as("v2"),
        col("valid_from"), col("valid_to"))
    val bad = r.join(hist, col("key") === col("k2") &&
        col("version_seq") === col("v2"))
      .filter(col("ts") < col("valid_from") ||
        (col("valid_to").isNotNull && col("ts") >= col("valid_to")))
    assert(bad.count() == 0, "match outside its validity interval")
    r.unpersist()
  }

  test("plan audit: q_p9 pit join adds no exchange between join and dedup window") {
    val plan = executed(CdcParser.pitLookup(spark, sf()))
    val s = plan.toString
    // the rank-1 filter must run as WindowGroupLimit (per-task top-1)
    assert(s.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$s")
    val exchanges = plan.collect { case e: Exchange => e }
    // broadcast (probe side) + one hash (history window, reused by the
    // join AND the dedup window) + presentation range sort — nothing else
    assert(exchanges.length == 3, s"expected 3 exchanges, got:\n$s")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName)
    assert(kinds.count(_.contains("Hash")) == 1 &&
      kinds.count(_.contains("Range")) == 1,
      s"unexpected partitionings: $kinds")
  }

  test("probe training: mse strictly decreases, learns the token direction") {
    val rows = TextAnalysis.probeTrain(spark, sf()).collect()
      .sortBy(_.getAs[Int]("step"))
    assert(rows.length == 3)
    val mse = rows.map(_.getAs[Double]("mse_pre"))
    // GD on a convex quadratic with eta < 2/L: loss strictly decreases
    assert(mse(0) > mse(1) && mse(1) > mse(2), s"mse not decreasing: ${mse.toSeq}")
    // the label is (n_tokens >= median): the token weight must be the
    // strongest learned direction and positive
    val last = rows.last
    assert(last.getAs[Double]("w_tok") > 0.0)
    assert(last.getAs[Double]("w_tok") > last.getAs[Double]("w_chr"))
    // deterministic: a re-run reproduces identical bits
    val again = TextAnalysis.probeTrain(spark, sf()).collect()
      .sortBy(_.getAs[Int]("step"))
    rows.zip(again).foreach { case (a, b) =>
      assert(a.getAs[Double]("w_tok") == b.getAs[Double]("w_tok"))
      assert(a.getAs[Double]("mse_pre") == b.getAs[Double]("mse_pre"))
    }
  }

  test("probe apply: decision consistent with score, beats majority baseline") {
    val rows = TextAnalysis.probeApply(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kept = r.getAs[Long]("kept")
      assert(kept == (if (r.getAs[Double]("score") >= 0.5) 1L else 0L))
    }
    val n = rows.length.toDouble
    val acc = rows.count(r =>
      r.getAs[Long]("kept") == r.getAs[Long]("label")) / n
    val majority = math.max(
      rows.count(_.getAs[Long]("label") == 1L) / n,
      rows.count(_.getAs[Long]("label") == 0L) / n)
    // three GD rounds on a separable label must beat predicting the mode
    assert(acc > majority, s"probe acc $acc <= majority $majority")
  }

  test("mmr: picks distinct, greedy scores non-increasing, pick 1 = argmax rel") {
    val picks = Similarity.mmrSelect(spark, sf()).collect()
      .sortBy(_.getAs[Int]("pick"))
    assert(picks.length == 5)
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // adding selected vectors only raises penalties, so the chosen score
    // cannot increase round over round
    picks.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("score") >= b.getAs[Double]("score"))
    }
    // round 1 has zero penalty: its pick maximizes pure relevance
    assert(picks.head.getAs[Double]("rel") ==
      picks.map(_.getAs[Double]("rel")).max)
  }

  test("version diff: status counts obey the derivation laws exactly") {
    val byStatus = graft.operators.Validation.versionDiff(spark, sf())
      .collect()
      .groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val ids = G.table(spark, sf(), "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(byStatus("added") == ids.count(_ % 13 == 0))
    assert(byStatus("removed") == ids.count(_ % 11 == 0))
    assert(byStatus("changed") == ids.count(i => i % 17 == 0 && i % 13 != 0))
    assert(byStatus.values.sum == ids.length + ids.count(_ % 11 == 0))
  }

  test("plan audit: c17 packing and v4 diff never ship text through an exchange") {
    // c17: the groupByKey shuffle moves (doc_id, shard, n_tokens) encoder
    // rows only — no string type may appear on any exchange
    val packPlan = executed(Curation.seqPack(spark, sf()))
    val packEx = packPlan.collect { case e: Exchange => e }
    assert(packEx.nonEmpty)
    packEx.foreach { e =>
      assert(!e.output.exists(a =>
        a.dataType == org.apache.spark.sql.types.StringType),
        s"string crosses the packing exchange: ${e.output.map(_.name)}")
    }
    // v4: the full-outer manifest join shuffles digests; md5 is 32 chars,
    // text is unbounded — assert the text column itself never crosses
    val diffPlan = executed(graft.operators.Validation.versionDiff(spark, sf()))
    val diffEx = diffPlan.collect { case e: Exchange => e.output.map(_.name) }
    assert(diffEx.nonEmpty)
    diffEx.foreach(names =>
      assert(!names.contains("text"), s"text crosses an exchange: $names"))
  }

  test("suffix array: ranks equal dense lexicographic rank of token suffixes") {
    import scala.math.Ordering.Implicits._
    val docs = G.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq)
    val vid = docs.flatMap(_._2).distinct.sorted.zipWithIndex.toMap
    val sufs = docs.flatMap { case (d, ts) =>
      val ids = ts.map(vid).toList
      ids.indices.map(o => (d, o.toLong, ids.drop(o)))
    }
    val rk = sufs.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val got = graft.operators.Dedup.suffixArray(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("off")) ->
        r.getAs[Long]("rank")).toMap
    assert(got.size == sufs.length)
    sufs.foreach { case (d, o, s) =>
      assert(got((d, o)) == rk(s), s"suffix ($d,$o)")
    }
    // ranks tie exactly when the full token suffixes are equal — the
    // exact-substring-dedup signal the structure exists to expose
    assert(got.values.toSeq.distinct.size == sufs.map(_._3).distinct.size)
  }

  test("repeated span: equals driver-side sorted-suffix neighbor-LCP truth") {
    import scala.math.Ordering.Implicits._
    val docs = G.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toVector)
    val sufs = docs.flatMap { case (d, ts) =>
      ts.indices.map(o => (d, ts.drop(o)))
    }.sortBy(_._2)
    def lcp(a: Vector[String], b: Vector[String]): Long =
      a.zip(b).iterator.takeWhile(p => p._1 == p._2).size.toLong
    // longest repeated prefix of a suffix = max LCP with its sorted
    // neighbors (equal suffixes are adjacent, giving the full length)
    val best = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    sufs.indices.foreach { i =>
      val (d, s) = sufs(i)
      val up = if (i > 0) lcp(s, sufs(i - 1)._2) else 0L
      val dn = if (i < sufs.length - 1) lcp(s, sufs(i + 1)._2) else 0L
      best(d) = math.max(best(d), math.max(up, dn))
    }
    val got = graft.operators.Dedup.repeatedSpans(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("max_dup_span")).toMap
    assert(got.size == docs.length)
    docs.foreach { case (d, _) => assert(got(d) == best(d), s"doc $d") }
  }

  test("coverage: bins partition the corpus and bound their own sums") {
    val rows = Similarity.coverage(spark, sf()).collect()
    val nCorpus = G.table(spark, sf(), "embeddings").count()
    val nSel = G.table(spark, sf(), "embeddings")
      .filter(col("vec_id") % 37 === 0).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nCorpus)
    // every bin's decimal-exact sum must sit inside the bin's sim range
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val n = r.getAs[Long]("n_vectors")
      val mean = r.getAs[Double]("sum_max_sim") / n
      assert(mean >= bin / 20.0 - 1e-9 && mean < (bin + 1) / 20.0 + 1e-9,
        s"bin $bin mean $mean")
    }
    // selection members cover themselves at sim ~1.0 (sqrt(d)*sqrt(d)
    // rounding can land 1.0-ulp in bin 19), so the top bins hold them all
    assert(rows.filter(_.getAs[Long]("bin") >= 19)
      .map(_.getAs[Long]("n_vectors")).sum >= nSel)
  }

  test("contiguous contamination: equals brute-force longest common run") {
    val docs = G.table(spark, sf(), "documents")
      .select(col("doc_id"), lower(col("text")).as("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toVector)
    val bench = docs.filter(_._1 % 7 == 3)
    val train = docs.filter(_._1 % 7 != 3)
    def lcsRun(a: Vector[String], b: Vector[String]): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices if a(i) == b(j)) {
        var k = 0
        while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k))
          k += 1
        if (k > best) best = k
      }
      best
    }
    val expect = (for ((bd, bts) <- bench; (td, tts) <- train) yield
      (bd, td) -> lcsRun(bts, tts)).filter(_._2 >= 8).toMap
    val got = Curation.contigContam(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Long]("max_span_tokens")).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, l) => assert(got(k) == l.toLong, s"pair $k") }
  }

  test("dedup cut: equals brute-force keep-first span cutting per doc") {
    val K = 16
    val docs = G.table(spark, sf(), "documents")
      .select(col("doc_id"), lower(col("text")).as("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toVector)
      .sortBy(_._1)
    val occ = scala.collection.mutable
      .Map[Seq[String], List[(Long, Int)]]().withDefaultValue(Nil)
    for ((d, ts) <- docs; o <- 0 to ts.length - K)
      occ(ts.slice(o, o + K)) :+= ((d, o))
    val cutStarts = occ.values.filter(_.size >= 2).flatMap { os =>
      val mn = os.minBy { case (d, o) => d * 128 + o }
      os.filterNot(_ == mn)
    }.toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = docs.map { case (d, ts) =>
      val covered = Array.fill(ts.length)(false)
      for (o <- ts.indices if cutStarts((d, o));
           i <- o until math.min(o + K, ts.length)) covered(i) = true
      val kept = ts.indices.filterNot(covered).map(ts)
      d -> ((ts.length.toLong, covered.count(identity).toLong,
        md5hex(kept.mkString(" "))))
    }.toMap
    val got = graft.operators.Dedup.dedupCut(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_cut"), r.getAs[String]("clean_digest")))).toMap
    assert(got.size == expect.size)
    expect.foreach { case (d, e) => assert(got(d) == e, s"doc $d") }
    // the operation must actually fire on the planted near-dups
    assert(got.values.exists(_._2 > 0))
  }

  test("plan audit: y12 and c18 broadcast their small side; no global window") {
    // y12: the selection joins as a broadcast, and the only keyed exchange
    // carries (vec_id, partial max) — the corpus vectors never shuffle
    val covPlan = executed(Similarity.coverage(spark, sf()))
    assert(covPlan.toString.contains("BroadcastNestedLoopJoin") ||
      covPlan.toString.contains("BroadcastExchange"),
      "y12 selection no longer broadcast")
    // c18: bench grams broadcast (train grams must not shuffle to find
    // candidates), and every window partitions by (pair, diag) — a window
    // with an empty partition spec would be a single-task global sort
    val c18Plan = executed(Curation.contigContam(spark, sf()))
    assert(c18Plan.toString.contains("BroadcastHashJoin"),
      "c18 bench-gram join degraded from broadcast")
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = c18Plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, "global (unpartitioned) window in c18"))
  }

  test("plan audit: q_t12 never ships raw text through an exchange") {
    val plan = executed(TextAnalysis.lmScore(spark, sf()))
    val exchanged = plan.collect { case e: Exchange => e.output.map(_.name) }
    assert(exchanged.nonEmpty)
    exchanged.foreach { names =>
      assert(!names.contains("text") && !names.contains("toks"),
        s"raw text crosses an Exchange: $names")
    }
  }
}
