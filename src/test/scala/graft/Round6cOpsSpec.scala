package graft

import graft.operators.{Curation, DashboardQueries, Dedup, Graph, Similarity, Validation}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Round-6 fourth wave: cohort retention, temperature-based mixture
  * resampling, and int8-quantized ANN search with exact rescoring —
  * algebraic laws on the real tables plus the scale-critical plan shapes
  * (per-user-summary shuffles only; no vector array ever crosses a shuffle
  * exchange), in the Round5OpsSpec style.
  */
class Round6cOpsSpec extends SparkSpec {

  private def executed(df: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ------------------------------------------------------------- retention

  test("retention: offset-0 diagonal counts every user exactly once") {
    val ret = DashboardQueries.retention(spark, sf()).cache()
    try {
      val day0 = ret.filter(col("day_offset") === 0L)
        .agg(sum(col("n_users"))).collect()(0).getLong(0)
      val users = G.events(spark, sf()).select(col("user_id"))
        .distinct().count()
      assert(day0 == users,
        s"offset-0 total $day0 != distinct users $users")
      // nobody can be active before their cohort day
      assert(ret.filter(col("day_offset") < 0L).count() == 0)
      // a cohort's returning count never exceeds its day-0 size
      val viol = ret.as("r")
        .join(ret.filter(col("day_offset") === 0L)
          .select(col("cohort_day"), col("n_users").as("size0")), "cohort_day")
        .filter(col("n_users") > col("size0")).count()
      assert(viol == 0, "retention count above cohort size")
    } finally ret.unpersist()
  }

  test("retention plan: shuffles carry per-user summaries, not events") {
    // two hash exchanges (user_id, then cohort/offset) + the output sort's
    // range exchange — the 4-exchange distinct/window/join formulation
    // must not creep back in
    val plan = executed(DashboardQueries.retention(spark, sf()))
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 3, s"expected <=3 exchanges, got:\n$plan")
  }

  // -------------------------------------------------------- temperatureMix

  test("temperatureMix: targets honor the sqrt-weight allocation and caps") {
    val out = Curation.temperatureMix(spark, sf(), k = 300).cache()
    try {
      val bySource = out.groupBy(col("source"))
        .agg(count(lit(1)).as("kept"), max(col("target")).as("target"),
          max(col("share")).as("share"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      val n = G.table(spark, sf(), "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      bySource.foreach { case (src, kept, target, share) =>
        assert(kept == target, s"$src kept $kept != target $target")
        assert(target == math.min(n(src), math.ceil(300.0 * share).toLong),
          s"$src target law broken")
      }
      // shares form a (decimal-rounded) probability vector
      val shareSum = bySource.map(_._4).sum
      assert(math.abs(shareSum - 1.0) < 1e-6, s"share sum $shareSum")
      // temperature flattening: every source's keep-rate is >= the raw
      // uniform rate K/N that proportional sampling would give it, iff its
      // share exceeds its raw frequency (small sources are upsampled)
      val total = n.values.sum.toDouble
      bySource.foreach { case (src, kept, _, share) =>
        if (n(src).toDouble / total < share)
          assert(kept.toDouble / n(src) >= 300.0 / total - 1e-9,
            s"$src small source not upsampled")
      }
      // selection is content-addressed: stable under re-run
      val again = Curation.temperatureMix(spark, sf(), k = 300)
      assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------------------ int8Search

  test("int8Search: exact-rescored top-5 is dominated by brute-force top-5") {
    val approx = Similarity.int8Search(spark, sf())
      .select(col("query_id"), col("rank"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.knnBruteForce(spark, sf())
      .select(col("query_id"), col("rank"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(approx.nonEmpty && approx.size == exact.size)
    approx.foreach { case ((q, rk), sim) =>
      // at every rank, rescored-from-candidates sim <= true kth-best sim
      assert(sim <= exact((q, rk)) + 1e-12,
        s"query $q rank $rk: approx $sim beats exact ${exact((q, rk))}")
    }
    // and the quantized candidate stage keeps recall high on this corpus
    val hits = approx.keys.count { case (q, rk) =>
      math.abs(approx((q, rk)) - exact((q, rk))) < 1e-12 }
    assert(hits >= (approx.size * 0.8).toInt,
      s"recall@5 too low: $hits/${approx.size}")
  }

  // -------------------------------------------------------------- triangles

  test("triangles: degree-oriented count agrees with brute force") {
    val out = Graph.triangles(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // independent brute force from the same edge definition
    val li = G.table(spark, sf(), "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { lines =>
      val ps = lines.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val triPerNode = collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- edges; w <- adj(u) if w > v && adj(v).contains(w)) {
      triPerNode(u) += 1; triPerNode(v) += 1; triPerNode(w) += 1
    }
    val got = out.map(r => r._1 -> r._3).toMap
    assert(got == triPerNode.toMap, "per-node triangle counts differ")
    out.foreach { case (n, deg, tri, cc) =>
      assert(deg == adj(n).size, s"degree mismatch at $n")
      assert(math.abs(cc - 2.0 * tri / (deg * (deg - 1.0))) < 1e-12)
      assert(cc >= 0.0 && cc <= 1.0)
    }
  }

  // ------------------------------------------------------------ transitions

  test("transitions: counts conserve events and shares normalize") {
    val out = DashboardQueries.transitions(spark, sf()).cache()
    try {
      val ev = G.eventsRaw(spark, sf())
      val totalN = out.agg(sum(col("n"))).collect()(0).getLong(0)
      val nEvents = ev.count()
      val nUsers = ev.select(col("user_id")).distinct().count()
      // each user with k events contributes exactly k-1 transitions
      assert(totalN == nEvents - nUsers,
        s"$totalN transitions != $nEvents events - $nUsers users")
      val rowShares = out.groupBy(col("from_type"))
        .agg(sum(col("share")).as("s")).collect()
      rowShares.foreach(r =>
        assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
          s"${r.getString(0)} shares sum to ${r.getDouble(1)}"))
    } finally out.unpersist()
  }

  // ------------------------------------------------------------- editVerify

  test("editVerify: matches an independent Levenshtein brute force") {
    val out = Dedup.editVerify(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty, "no candidate pairs under the edit threshold")
    out.foreach { case ((a, b), (d, s)) =>
      assert(a < b && d >= 0 && d <= 80)
      assert(math.abs(s - (1.0 - d / 200.0)) < 1e-12)
    }
    // reference DP, no engine involved
    def lev(x: String, y: String): Int = {
      var prev = Array.tabulate(y.length + 1)(identity)
      for (i <- 1 to x.length) {
        val cur = new Array[Int](y.length + 1)
        cur(0) = i
        for (j <- 1 to y.length)
          cur(j) = math.min(math.min(cur(j - 1), prev(j)) + 1,
            prev(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        prev = cur
      }
      prev(y.length)
    }
    val pre = G.table(spark, sf(), "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), substring(col("text"), 1, 200))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val expect = (for {
      i <- pre.indices; j <- i + 1 until pre.length
      d = lev(pre(i)._2, pre(j)._2) if d <= 80
    } yield (pre(i)._1, pre(j)._1) -> d).toMap
    assert(out.keySet == expect.keySet, "pair sets differ from brute force")
    expect.foreach { case (k, d) =>
      assert(out(k)._1 == d, s"$k: engine ${out(k)._1} != reference $d")
    }
  }

  // -------------------------------------------------------------- freshness

  test("freshness: day counts conserve events; trailing stats recompute") {
    val out = Validation.freshness(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3),
        r.getLong(4)))
    val total = out.map(_._2).sum
    assert(total == G.events(spark, sf()).count(), "day counts lose events")
    // reference trailing mean over the previous <=7 rows
    val cnts = out.map(_._2)
    out.zipWithIndex.foreach { case ((day, cnt, avg, low, gap), i) =>
      val win = cnts.slice(math.max(0, i - 7), i)
      if (win.isEmpty) assert(avg.isEmpty)
      else {
        val expect = win.sum.toDouble / win.size
        assert(math.abs(avg.get - expect) < 1e-12, s"$day trailing mean")
        val expLow = if (win.size >= 3 && cnt < expect * 0.5) 1L else 0L
        assert(low == expLow, s"$day low flag")
      }
      if (i > 0) {
        val expGap =
          if (out(i - 1)._1.until(day, java.time.temporal.ChronoUnit.DAYS) > 1)
            1L else 0L
        assert(gap == expGap, s"$day gap flag")
      }
    }
  }

  // ------------------------------------------------------------- alsoBought

  test("alsoBought: common-neighbor counts match brute force") {
    val out = Graph.alsoBought(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty && out.length <= 100)
    val li = G.table(spark, sf(), "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { lines =>
      val ps = lines.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    out.foreach { case (x, y, common, jac) =>
      val inter = adj(x).intersect(adj(y)).size
      assert(inter == common, s"($x,$y) common $common != $inter")
      val expJac = common.toDouble / (adj(x).size + adj(y).size - common)
      assert(math.abs(jac - expJac) < 1e-12)
    }
    // top-100 is genuinely the strongest: min reported common >= the
    // 100th-largest brute-force common count
    val allCommon = (for {
      x <- adj.keys; y <- adj(x).flatMap(adj(_)) if x < y
    } yield adj(x).intersect(adj(y)).size).toSeq.filter(_ >= 3)
      .sorted(Ordering[Int].reverse)
    if (allCommon.size >= 100)
      assert(out.map(_._3).min >= allCommon(99))
  }

  // --------------------------------------------------------- qualityDeciles

  test("qualityDeciles: partition the corpus with strictly rising buckets") {
    val rows = Curation.qualityDeciles(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = G.table(spark, sf(), "documents").count()
    assert(rows.map(_._2).sum == total, "deciles lose documents")
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 10))
    assert(rows.map(_._1).distinct.length == rows.length)
    // strict > assignment puts ties in the lower bucket, so score ranges
    // must be strictly separated across deciles
    rows.sortBy(_._1).sliding(2).foreach {
      case Array((_, _, _, hiMax), (_, _, loMin, _)) =>
        assert(loMin > hiMax, s"decile ranges overlap: $loMin <= $hiMax")
      case _ =>
    }
    rows.foreach { case (_, _, mn, mx) => assert(mn <= mx) }
  }

  // -------------------------------------------------------------- labelProp

  test("labelProp: 3 synchronous rounds match a reference implementation") {
    val out = Graph.labelProp(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = G.table(spark, sf(), "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { lines =>
      val ps = lines.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, xs) => l -> xs.size }
        val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }
    }
    val expect = labels.values.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }
    assert(out == expect, "community histogram differs from reference")
    assert(out.values.sum == adj.size.toLong, "nodes lost or duplicated")
  }

  // ------------------------------------------------------------- silhouette

  test("silhouette: per-label averages match a plain-double reference") {
    val out = Similarity.silhouette(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { case (_, n, s) =>
      assert(n > 0 && s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
    val vecs = G.table(spark, sf(), "embeddings")
      .filter(col("vec_id") < 500)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      1.0 - d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byLabel = collection.mutable.Map.empty[Int, List[Double]]
      .withDefaultValue(Nil)
    vecs.foreach { case (id, la, va) =>
      val mean = vecs.filter(o => o._1 != id)
        .groupBy(_._2)
        .map { case (lb, os) =>
          lb -> os.map(o => cosDist(va, o._3)).sum / os.size }
      if (mean.contains(la) && mean.size > 1) {
        val ai = mean(la)
        val bi = mean.filter(_._1 != la).values.min
        byLabel(la) = ((bi - ai) / math.max(ai, bi)) :: byLabel(la)
      }
    }
    val expect = byLabel.map { case (l, ss) => l -> (ss.sum / ss.size) }
    assert(out.map(_._1).toSet == expect.keySet)
    out.foreach { case (l, n, s) =>
      assert(n == byLabel(l).size)
      assert(math.abs(s - expect(l)) < 1e-9, s"label $l: $s vs ${expect(l)}")
    }
  }

  test("int8Search plan: no vector array crosses a shuffle exchange") {
    // codes/vectors live scan-side or in tiny broadcasts; every shuffle
    // (candidate-ranking window, final sort) ships scalar scores only
    val plan = executed(Similarity.int8Search(spark, sf()))
    val shuffled = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffled.nonEmpty)
    shuffled.foreach { e =>
      val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"array-typed ${arrays.map(_.name).mkString(",")} crossed a shuffle")
    }
  }
}
