package graft

import org.apache.spark.sql.functions._

/** Round-9 wave: SessionMemo safety proofs.
  *
  *  - content fingerprint: a long-lived session whose data dir is
  *    REGENERATED in place must rebuild memoized artifacts, not serve
  *    stale ones (the memo previously keyed on (session, dir path) only,
  *    which was safe solely under this harness's immutable-testdata
  *    assumption);
  *  - live-session collisions: two concurrently-live sessions must never
  *    share an entry (the previous identityHashCode key was not unique).
  */
class Round15OpsSpec extends SparkSpec {

  test("SessionMemo rebuilds when the dir contents are regenerated, " +
      "and not when they are unchanged") {
    val memo = new SessionMemo[Int]()
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_fp")
    try {
      val f = dir.resolve("part-0.parquet")
      java.nio.file.Files.writeString(f, "v1 contents")
      var builds = 0
      def get(): Int = memo.getOrBuild(spark, dir.toString) { builds += 1; builds }
      assert(get() == 1 && get() == 1, "unchanged dir must hit the memo")
      // regenerate in place: same path, different bytes (size differs, so
      // the fingerprint changes even inside one mtime granule)
      java.nio.file.Files.writeString(f, "v2 regenerated, longer contents")
      assert(get() == 2, "regenerated dir served a stale artifact")
      assert(get() == 2, "rebuilt entry must itself memoize")
    } finally {
      SessionMemo.deleteTree(dir.toString)
    }
  }

  test("SessionMemo: composite dir#params tags fingerprint the path " +
      "component and keep params distinct") {
    val memo = new SessionMemo[String]()
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_tag")
    try {
      java.nio.file.Files.writeString(dir.resolve("a"), "x")
      val a = memo.getOrBuild(spark, s"$dir#k=4") { "k4" }
      val b = memo.getOrBuild(spark, s"$dir#k=8") { "k8" }
      assert(a == "k4" && b == "k8", "params collapsed into one entry")
      assert(memo.getOrBuild(spark, s"$dir#k=4") { "rebuilt" } == "k4")
    } finally SessionMemo.deleteTree(dir.toString)
  }

  /** q_t13 golden-digest fixture (VERDICT r8 #7): deflate is non-SQL so
    * DuckDB can't replay it, but the output is fully deterministic — so the
    * FULL result digest is pinned per testdata VINTAGE. The fixture file
    * maps sha256(documents.parquet) → sha256(canonical result); a
    * regenerated corpus gets a fresh entry recorded (with a determinism
    * double-run in place of the history check), every later run on the
    * same vintage must reproduce the recorded digest bit-for-bit. The
    * fixture is committed, so cross-round drift in the deflate path fails
    * here instead of hiding behind rows-only. */
  test("t13 compress-ratio: full-result digest matches the recorded " +
      "golden value for this testdata vintage") {
    def sha(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
        .map("%02x".format(_)).mkString
    def resultDigest(dir: String): String = {
      val rows = operators.TextAnalysis.compressionRatio(spark, dir)
        .collect()
        .map(r => s"${r.getAs[Long]("doc_id")}:${r.getAs[Int]("n_bytes")}:" +
          s"${r.getAs[Int]("n_deflate")}:" +
          java.lang.Double.toString(r.getAs[Double]("ratio")))
        .sorted
      sha(rows.mkString("\n").getBytes("UTF-8"))
    }
    val fixture = java.nio.file.Paths.get("src/test/resources/t13_golden.properties")
    val props = new java.util.Properties()
    if (java.nio.file.Files.exists(fixture)) {
      val in = java.nio.file.Files.newInputStream(fixture)
      try props.load(in) finally in.close()
    }
    var dirty = false
    for (sfd <- Seq("0.001", "0.01")) {
      val inputHash = sha(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${sf(sfd)}/documents.parquet")))
      val digest = resultDigest(sf(sfd))
      Option(props.getProperty(inputHash)) match {
        case Some(golden) =>
          assert(digest == golden,
            s"t13 digest drifted on UNCHANGED sf$sfd testdata: the deflate " +
              "path changed behavior (update the fixture only if intended)")
        case None => // new vintage: determinism double-run, then record
          assert(digest == resultDigest(sf(sfd)),
            s"t13 is not deterministic on sf$sfd")
          props.setProperty(inputHash, digest)
          dirty = true
      }
    }
    if (dirty) {
      val out = java.nio.file.Files.newOutputStream(fixture)
      try props.store(out, "q_t13 golden digests: sha256(documents.parquet) " +
        "-> sha256(sorted doc_id:n_bytes:n_deflate:ratio lines)")
      finally out.close()
    }
  }

  /** q_y16 plan pin (VERDICT r8 #4): the round-8 bench flagged
    * 1.03 → 1.67 s; bench_history shows every idle 3-rep reading after the
    * round-8 changes back at 0.89–1.17 s with occasional vr ≈ 2.4 on a
    * single rep — the flagged number was a loaded 2-rep pass, amplified by
    * the query's structure (three SEQUENTIAL jobs with a 64-row driver
    * collect between rounds: any per-job scheduler jitter counts three
    * times). This pin freezes the per-round distributed kernel so a future
    * drift that IS a plan change fails here: one hash exchange on dim,
    * map-side partial sums, no join of any kind. */
  test("y16 power-iteration round kernel: one exchange, partial+final " +
      "agg, join-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    functions.VectorExpressions.ensureRegistered(spark)
    try {
      val e = G.table(spark, sf(), "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val v0 = Array.fill(64)(0.125)
      val df = operators.Similarity.powerRound(e, v0)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 1,
        s"power round must shuffle ONCE (on dim), got ${shuffles.size}")
      val aggs = plan.collect { case a: HashAggregateExec => a }
      assert(aggs.size == 2,
        s"expected partial+final hash aggregate pair, got ${aggs.size}")
      assert(plan.toString.indexOf("Join") < 0,
        "power round grew a join — the corpus is being shuffled")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Replay-interior global-window audit (VERDICT r8 #8): the batch sweep
    * in Round14OpsSpec skips `q_stream_*` because replays execute on
    * build; their stateful aggregations run through the state store (no
    * WindowExec possible), but their foreachBatch INTERIORS and fixture
    * staging are ordinary batch actions where an unpartitioned window
    * could hide. Those interiors fire the session's
    * QueryExecutionListener (micro-batch clones copy the listener
    * manager), so: register a listener, run each replay serially,
    * attribute every captured batch plan to it, and apply the same
    * no-unreviewed-global-window rule. twsReplay runs on a newSession()
    * (fresh listener manager) — its interior is a plain parquet append
    * with no foreachBatch, reviewed by reading, and stays outside the
    * listener's reach. */
  test("streaming replays: no unpartitioned WindowExec in any " +
      "foreachBatch interior or staging plan") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    // an executed plan under AQE is wrapped in AdaptiveSparkPlanExec,
    // whose children are Nil — a bare collect() sees NOTHING inside (the
    // bug this helper exists for: the first version of this audit passed
    // while waterfill's global windows executed in plain sight). Descend
    // through adaptive wrappers and query stages explicitly.
    def globalWindows(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      p.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => 1
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => 1
        case a: AdaptiveSparkPlanExec => globalWindows(a.executedPlan)
        case s: QueryStageExec => globalWindows(s.plan)
      }.sum
    }
    /** Reviewed replays that run a global window on an O(small) frame. */
    val whitelist: Map[String, String] = Map(
      // final report windows over the merged <=|sources| state table,
      // shared with whitelisted batch q_c30 (waterfillFromAvail) — never
      // over the document stream
      "q_stream_waterfill" -> "<=20 source availability rows",
    )
    val offenders = scala.collection.mutable.Map[String, Int]()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("q_stream_"))
    spark.listenerManager.register(listener)
    try {
      names.foreach { case (name, fn) =>
        plans.clear()
        fn(spark, sf()).collect() // replays execute on build + collect
        // listener callbacks land asynchronously; drain until stable
        var stable = 0
        var last = -1
        while (stable < 3) {
          Thread.sleep(200)
          val n = plans.size()
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
        assert(!plans.isEmpty,
          s"$name: listener captured no batch plans — the audit surface " +
            "vanished (interiors no longer fire QueryExecutionListener?)")
        val it = plans.iterator()
        var bad = 0
        while (it.hasNext) bad += globalWindows(it.next())
        if (bad > 0) offenders(name) = bad
      }
    } finally spark.listenerManager.unregister(listener)
    val unreviewed = offenders.keySet -- whitelist.keySet
    assert(unreviewed.isEmpty,
      s"unpartitioned WindowExec inside replay batch plans: " +
        s"${unreviewed.toSeq.sorted.map(n => s"$n(${offenders(n)})").mkString(", ")}" +
        " — partition the window or add a justified whitelist entry")
    val stale = whitelist.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale replay-window whitelist entries: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  /** The two corpus-derived sketch parameters are pinned as functions:
    * their small-sf anchor values must never drift (the sf0.01/sf0.1
    * oracles were hash-checked at exactly these widths), and their growth
    * must follow the documented rule (occupancy-constant bits, √n
    * clusters). A change here is a change to every LSH/semdedup result. */
  test("auto-tuned sketch parameters: anchors and growth law") {
    import operators.Similarity.{autoBits, autoK}
    // sign-LSH bits: ~25/bucket occupancy, anchored at the driver corpora
    assert(autoBits(500) == 4)   // sf0.001 / sf0.01 embeddings
    assert(autoBits(2000) == 6)  // sf0.1 — the old hand-set default
    assert(autoBits(20000) == 10)
    assert(autoBits(100000) == 12) // the Stress ladder rung
    assert(autoBits(1) == 2 && autoBits(0) == 2, "clamped low")
    assert(autoBits(Long.MaxValue / 2) == 24, "clamped high")
    // one more bit per corpus doubling (occupancy-constant growth)
    assert(autoBits(200000) == autoBits(100000) + 1)
    // semdedup clusters: k = sqrt(n/31.25), anchored so the gate corpora
    // keep their original k = 8
    assert(autoK(500) == 8 && autoK(2000) == 8)
    assert(autoK(20000) == 25)
    // sqrt growth: 4x corpus -> 2x clusters (±1 for rounding)
    assert(math.abs(autoK(80000) - 2 * autoK(20000)) <= 1)
  }

  /** ScaleGen invariants, pinned at K=2 over sf0.001 — each line is a
    * defect the sf1 rehearsal actually hit:
    *  - event ids stay event-time-ordered (the CDC per-key ordering
    *    contract scd2/dedup replays build on; block-shifted ids broke it);
    *  - cross-copy doc vocabularies are (near-)disjoint so the duplicate
    *    rate scales, not multiplies (sequence rotation kept the shingles
    *    and exploded pair mass 100×);
    *  - referential joins survive (orders ⋈ customer, lineitem ⋈ orders);
    *  - fixed dimensions stay fixed. */
  test("ScaleGen: order invariant, vocab disjointness, referential " +
      "integrity at K=2") {
    val dst = java.nio.file.Files.createTempDirectory("graft_scalegen").toString
    try {
      ScaleGen.generate(spark, sf(), dst, 2)
      def t(n: String) = spark.read.parquet(s"$dst/$n.parquet")
      // 1. zero event-time inversions in event_id order
      val inv = t("events")
        .selectExpr("ts", "lag(ts) OVER (ORDER BY event_id) AS p")
        .filter(col("p") > col("ts")).count()
      assert(inv == 0, s"$inv event-time inversions — CDC order broken")
      // 2. token sets of copy 0 and copy 1 share (almost) nothing: only
      // single-char tokens survive the char rotation identically
      val toks = t("documents")
        .selectExpr("doc_id >= 100000000 AS c1",
          "explode(split(text, '\\\\s+')) AS tk")
      val shared = toks.filter(!col("c1")).select("tk").distinct()
        .join(toks.filter(col("c1")).select("tk").distinct(), "tk")
        .filter(length(col("tk")) > 1).count()
      val total = toks.select("tk").distinct().count()
      assert(shared * 20 < total,
        s"cross-copy vocab overlap $shared of $total — dup rate multiplies")
      // 3. referential integrity: every order resolves its customer, every
      // lineitem its order
      assert(t("orders").join(t("customer"),
        col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
      assert(t("lineitem").join(t("orders"),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
      // 4. dimensions stay fixed; facts double
      assert(t("region").count() == 5 && t("nation").count() == 25)
      assert(t("events").count() ==
        2 * G.table(spark, sf(), "events").count())
    } finally SessionMemo.deleteTree(dst)
  }

  test("SessionMemo: two live sessions never share an entry") {
    val memo = new SessionMemo[String]()
    val other = spark.newSession()
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_sess")
    try {
      java.nio.file.Files.writeString(dir.resolve("a"), "x")
      assert(memo.getOrBuild(spark, dir.toString) { "mine" } == "mine")
      assert(memo.getOrBuild(other, dir.toString) { "theirs" } == "theirs",
        "second live session was served the first session's artifact")
      assert(memo.getOrBuild(spark, dir.toString) { "rebuilt" } == "mine")
    } finally SessionMemo.deleteTree(dir.toString)
  }
}
