package graft

import graft.operators.{Curation, Dedup, Multimodal, Relational, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Round-7 wave: Bloom-filter dedup (BFF), DSIR importance selection,
  * diagonal-Mahalanobis OOD pruning, VAD segmentation, and the forward
  * as-of join — algebraic laws, reference-implementation parity, and the
  * planted false-positive that proves the Bloom semantics are real.
  */
class Round7hOpsSpec extends SparkSpec {

  // ---------------------------------------------------------- bloom dedup

  test("bloom: packed-bitmap probe ≡ relational position-set membership") {
    // dense-ish index so false positives exist and both forms must agree
    // on them, not just on true hits
    val index = (0L until 50000L).toArray
    val probe = (40000L until 60000L).toArray // overlaps + fresh grams
    val viaBitmap = Dedup.bloomBitmapSeen(index, probe)
    // independent position-set reference (the relational form's math)
    val P = 1000000007L; val M = 1L << 20
    def p1(g: Long) = g % M
    def p2(g: Long) = ((g * 2654435761L + 97L) % P) % M
    val bits = index.flatMap(g => Seq(p1(g), p2(g))).toSet
    val viaSet = probe.map(g => bits.contains(p1(g)) && bits.contains(p2(g)))
    assert(viaBitmap.toSeq == viaSet.toSeq)
    // no false negatives: every indexed gram probes positive
    assert(Dedup.bloomBitmapSeen(index, index).forall(identity))
    // at least one genuine false positive exists in the fresh range —
    // Bloom semantics (reproducible over-dropping), not exact membership
    val fresh = probe.zip(viaBitmap).filter(_._1 >= 50000L)
    assert(fresh.exists(_._2), "expected >=1 false positive on fresh grams")
  }

  test("bloomDedup: probe-side counts are lawful and deterministic") {
    val out = Dedup.bloomDedup(spark, sf()).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("n_seen") > col("n_grams")).count() == 0)
      assert(out.filter(col("doc_id") % 10 < 8).count() == 0,
        "index docs must not appear in the probe output")
      val bad = out.filter(
        col("is_dup") =!= (col("n_seen") * 10 >= col("n_grams") * 8))
      assert(bad.count() == 0, "is_dup must restate the 80% threshold")
      val again = Dedup.bloomDedup(spark, sf())
      assert(out.exceptAll(again).count() == 0 &&
        again.exceptAll(out).count() == 0)
    } finally out.unpersist()
  }

  // --------------------------------------------------------------- DSIR

  test("dsirSelect: dense ranks, monotone scores, target-source lift") {
    val out = Curation.dsirSelect(spark, sf()).cache()
    try {
      val rows = out.orderBy(col("rank")).collect()
      assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
      val scores = rows.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // target sources (src0-3 = 20% of the corpus) must be over-
      // represented among the selected: that IS the importance signal
      val docs = G.table(spark, sf(), "documents")
        .select(col("doc_id"), col("source"))
      val selTarget = out.join(docs, "doc_id")
        .filter(col("source").isin("src0", "src1", "src2", "src3")).count()
      assert(selTarget * 5 > rows.length,
        s"target docs $selTarget/${rows.length} not above the 20% base rate")
    } finally out.unpersist()
  }

  // ----------------------------------------------------- Mahalanobis OOD

  test("oodMahalanobis: matches a plain-Scala reference bit-for-bit-ish") {
    val e = G.table(spark, sf(), "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val d = e.values.head.length
    val n = e.size
    val mu = new Array[Double](d); val s2 = new Array[Double](d)
    for (j <- 0 until d) {
      var sx = 0L; var sxx = 0L
      e.values.foreach { v =>
        sx += math.floor(v(j) * 1e9).toLong
        sxx += math.floor(v(j) * v(j) * 1e9).toLong
      }
      mu(j) = sx.toDouble / n / 1e9
      val m2 = sxx.toDouble / n / 1e9
      s2(j) = m2 - mu(j) * mu(j)
    }
    def score(v: Array[Double]): Double = {
      var a = 0.0
      for (j <- 0 until d)
        a += (v(j) - mu(j)) * (v(j) - mu(j)) / (s2(j) + 1e-9)
      a
    }
    val expected = e.toSeq.map { case (id, v) => (id, score(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(50)
    val got = Similarity.oodMahalanobis(spark, sf()).orderBy(col("rank"))
      .select(col("vec_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == expected.map(_._1), "OOD ranking differs")
    got.zip(expected).foreach { case ((_, g), (_, x)) =>
      assert(math.abs(g - x) < 1e-9, s"score $g vs reference $x")
    }
  }

  // ------------------------------------------------------------- VAD

  test("vadKernel: planted patterns") {
    // 3 frames: quiet, loud, quiet -> one 1-frame segment
    val quiet = Array.fill[Byte](64)(1)
    val loud = Array.fill[Byte](64)(100)
    val b1 = quiet ++ loud ++ quiet
    assert(Multimodal.vadKernel(b1) == (3L, 1L, 1L, 1L))
    // loud, loud, quiet, loud -> segments {0,1} and {3}
    val b2 = loud ++ loud ++ quiet ++ loud ++ Array.fill[Byte](10)(9)
    assert(Multimodal.vadKernel(b2) == (4L, 3L, 2L, 2L))
    // uniform energy: nothing exceeds the mean strictly
    val b3 = loud ++ loud
    assert(Multimodal.vadKernel(b3) == (2L, 0L, 0L, 0L))
    // shorter than one frame
    assert(Multimodal.vadKernel(Array.fill[Byte](63)(5)) == (0L, 0L, 0L, 0L))
  }

  test("vadSegments: island laws hold corpus-wide") {
    val out = Multimodal.vadSegments(spark, sf()).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("n_active") > col("n_frames")).count() == 0)
      assert(out.filter(col("longest_run") > col("n_active")).count() == 0)
      assert(out.filter(col("n_segments") > col("n_active")).count() == 0)
      assert(out.filter((col("n_segments") === 0) =!=
        (col("n_active") === 0)).count() == 0)
      // a run of k active frames needs >= ceil(k) segments-worth of frames:
      // n_active <= n_segments * longest_run
      assert(out.filter(col("n_active") >
        col("n_segments") * col("longest_run")).count() == 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------------ forward as-of

  test("asofJoinForward == brute-force next-signup join") {
    val ev = G.eventsRaw(spark, sf()).withColumn("ms", expr("ts_ns DIV 1000000"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("signup_id"))
      .select(col("user_id").as("su"), col("ms").as("sms"), col("signup_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val brute = purchases.join(signups,
        col("user_id") === col("su") && col("sms") > col("ms"))
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY event_id ORDER BY sms, signup_id)"))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"),
        col("signup_id").as("next_signup"), (col("sms") - col("ms")).as("gap_ms"))
    val got = Relational.asofJoinForward(spark, sf())
    assert(got.exceptAll(brute).count() == 0 &&
      brute.exceptAll(got).count() == 0,
      "forward as-of differs from brute force")
  }

  // ------------------------------------------------------- MERGE upsert

  test("mergeUpsert: clause laws — deletes gone, updates +100, inserts new") {
    val target = G.table(spark, sf(), "customer")
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
    val out = Relational.mergeUpsert(spark, sf()).cache()
    try {
      // every key%13=0 target row deleted (and not re-inserted)
      assert(out.filter(col("key") % 13 === 0 && col("key") < 1000000)
        .count() == 0)
      // updated rows: exactly the %7 non-deleted keys, bal shifted +100
      val upd = out.filter(col("action") === "updated")
      val expUpd = target.filter(col("key") % 7 === 0 && col("key") % 13 =!= 0)
      assert(upd.count() == expUpd.count())
      val drift = upd.join(expUpd.select(col("key"), col("bal").as("old")), "key")
        .filter(abs(col("bal") - col("old") - 100.0) > 1e-9)
      assert(drift.count() == 0)
      // inserted rows: one per %11 key, at key+1000000 with bal 0
      assert(out.filter(col("action") === "inserted").count() ==
        target.filter(col("key") % 11 === 0).count())
      // kept rows untouched
      val kept = out.filter(col("action") === "kept")
        .join(target.select(col("key"), col("bal").as("old")), "key")
        .filter(col("bal") =!= col("old"))
      assert(kept.count() == 0)
    } finally out.unpersist()
  }

  // -------------------------------------------------- seventh-wave laws

  test("simpsonDiversity: probability and TTR laws corpus-wide") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.simpsonDiversity(spark, sf()).cache()
    try {
      assert(out.count() > 0)
      // 1/n_types <= repeat_p <= 1 (equality at single-type docs)
      assert(out.filter(col("repeat_p") > 1.0 + 1e-12).count() == 0)
      assert(out.filter(col("repeat_p") * col("n_types") < 1.0 - 1e-9)
        .count() == 0)
      assert(out.filter(col("n_types") > col("n_toks")).count() == 0)
      val ttrBad = out.filter(
        abs(col("ttr") - col("n_types").cast("double") / col("n_toks")) > 1e-12)
      assert(ttrBad.count() == 0)
    } finally out.unpersist()
  }

  test("epochShuffle: dense per-shard positions, total bijection, stable") {
    val out = Curation.epochShuffle(spark, sf()).cache()
    try {
      val docs = G.table(spark, sf(), "documents").count()
      assert(out.count() == docs, "every doc gets exactly one slot")
      assert(out.select(col("doc_id")).distinct().count() == docs)
      // positions are dense 1..|shard| within every shard
      val bad = out.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
          min(col("pos")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
      assert(bad.count() == 0, "positions not dense in some shard")
      val again = Curation.epochShuffle(spark, sf())
      assert(out.exceptAll(again).count() == 0)
    } finally out.unpersist()
  }

  test("crossModalAgreement: marginals match the two source pipelines") {
    import graft.operators.{Dedup, Multimodal, Similarity}
    val row = Multimodal.crossModalAgreement(spark, sf()).collect()(0)
    val nText = Dedup.simhashNearDups(spark, sf())
      .filter(col("doc_a") < 300 && col("doc_b") < 300).count()
    val nEmbed = Similarity.embeddingNearDups(spark, sf()).count()
    assert(row.getLong(0) + row.getLong(2) == nText)
    assert(row.getLong(1) + row.getLong(2) == nEmbed)
  }

  test("mergeReplay: incremental per-batch MERGE == one-shot batch MERGE") {
    val stream = graft.streaming.StreamingJobs.mergeReplay(spark, sf())
    val batch = Relational.mergeUpsert(spark, sf())
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "streamed MERGE snapshot diverged from the batch MERGE")
  }

  test("profileReplay: incremental profile == one-shot batch profile") {
    import graft.operators.Validation
    val stream = graft.streaming.StreamingJobs.profileReplay(spark, sf())
    val batch = Validation.profile(spark, sf())
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0,
      "incrementally-maintained profile diverged from the batch profile")
  }

  // ------------------------------------------------------- plan pins

  private def executedPlan(df: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bloomDedup plan: no text crosses a shuffle — positions and ids only") {
    val plan = executedPlan(Dedup.bloomDedup(spark, sf()))
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty)
    shuffles.foreach { e =>
      val strings = e.output.filter(_.dataType == StringType)
      assert(strings.isEmpty,
        s"string column ${strings.map(_.name).mkString(",")} crossed a shuffle")
    }
  }

  test("oodMahalanobis plan: corpus vectors never cross a shuffle") {
    val plan = executedPlan(Similarity.oodMahalanobis(spark, sf()))
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    shuffles.foreach { e =>
      assert(!e.output.exists(_.name == "v"),
        s"vector column crossed a shuffle:\n$e")
    }
  }

  test("dsirSelect plan: count frames broadcast, token stream never SMJ'd") {
    val plan = executedPlan(Curation.dsirSelect(spark, sf()))
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$s")
    assert(!s.contains("SortMergeJoin"),
      s"token-level sort-merge join crept in:\n$s")
  }

  test("asofJoinForward plan uses the native merge operator") {
    val plan: SparkPlan = {
      val df: DataFrame = Relational.asofJoinForward(spark, sf())
      df.collect()
      df.queryExecution.executedPlan
    }
    assert(plan.toString.contains("AsOfJoin"),
      s"expected AsOfJoinExec in:\n$plan")
  }
}
