package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-7 second-wave operators. */
class Round7bOpsSpec extends SparkSpec {

  test("bfs: planted graph distances match hand-computed BFS") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a branch 3-6 and an unreachable island 7-8
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L),
      (7L, 8L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("s")
    val got = Graph.bfsFromEdges(edges, seeds, 3)
      .as[(Long, Long)].collect().toMap
    // radius 3: node 5 is 4 hops away and the island is unreachable —
    // neither may appear
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 6L -> 3L))
  }

  test("bfs: seeds outside the graph's node set are dropped") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val seeds = Seq(1L, 99L).toDF("s") // 99 has no bulk co-purchase edge
    val got = Graph.bfsFromEdges(edges, seeds, 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("bfs: sf0.001 distances match an in-memory reference BFS") {
    import spark.implicits._
    val li = G.table(spark, sf(), "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.select(col("ok"), col("pk").as("u"))
    val b = li.select(col("ok"), col("pk").as("v"))
    val edges = a.join(b, "ok").filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val seedSet = G.table(spark, sf(), "part")
      .filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey")).as[Long].collect().toSet
      .intersect(adj.keySet.toSet)
    var dist = seedSet.map(_ -> 0L).toMap
    for (r <- 1 to 3) {
      val frontier = dist.filter(_._2 == r - 1).keys
      frontier.foreach { n =>
        adj(n).foreach { nb => if (!dist.contains(nb)) dist += nb -> r.toLong }
      }
    }
    val got = Graph.bfs(spark, sf()).as[(Long, Long)].collect().toMap
    assert(got == dist, s"got ${got.size} rows, expected ${dist.size}")
  }

  test("power iteration: planted dominant axis is recovered") {
    import spark.implicits._
    import graft.operators.Similarity
    // 20 vectors strongly aligned with axis 2, mild noise on axis 0
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array(0.01 * (i % 3), 0.0, 5.0 + 0.1 * (i % 2), 0.0))
    }.toDF("vec_id", "v")
    val out = Similarity.powerIterVecs(vecs, 4, 3)
      .as[(Long, Double, Double)].collect()
    val byDim = out.map(r => r._1 -> r._2).toMap
    assert(math.abs(byDim(2L)) > 0.999, s"dominant axis not found: $byDim")
    val norm = out.map(r => r._2 * r._2).sum
    assert(math.abs(norm - 1.0) < 1e-9, s"direction not unit: $norm")
  }

  test("sorted-neighborhood: planted adjacent dups found, far pair excluded") {
    import spark.implicits._
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base + " alpha"),
      (2L, base + " alpha beta"),          // near-dup of 1, same prefix
      (3L, "zzz completely different text about spark catalyst engines"),
      (4L, "zzz completely different text about spark catalyst engines!"),
      (5L, "mmm unrelated middle document standing alone entirely here")
    ).toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodDocs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"shared-prefix near-dup missed: $got")
    assert(got.contains((3L, 4L)), s"punctuation-only edit missed: $got")
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L),
      s"singleton doc falsely paired: $got")
  }

  test("sorted-neighborhood: every reported pair is a true tau>=0.5 pair") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = G.table(spark, sf(), "documents")
    val reported = Dedup.sortedNeighborhoodDocs(docs)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    def gset(s: String): Set[String] =
      (1 to s.length - 2).map(i => s.substring(i - 1, i + 2)).toSet
    reported.foreach { case (a, b, j) =>
      val (ga, gb) = (gset(texts(a)), gset(texts(b)))
      val truth = ga.intersect(gb).size.toDouble / ga.union(gb).size
      assert(truth >= 0.5, s"pair ($a,$b) reported but true jaccard=$truth")
      assert(math.abs(truth - j) < 5e-5, s"($a,$b): $j vs $truth")
    }
    assert(reported.nonEmpty)
  }

  test("plan audit: y16 power round is one 64-group keyed exchange") {
    import graft.operators.Similarity
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = G.table(spark, sf(), "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val w = Similarity.powerRound(e, Array.fill(64)(0.125))
      w.collect()
      val plan = w.queryExecution.executedPlan
      val exchanges = plan.collect {
        case ex: org.apache.spark.sql.execution.exchange.Exchange => ex }
      assert(exchanges.length == 1, s"expected one exchange:\n$plan")
      assert(plan.toString.contains("partial_sum"),
        s"no map-side partial agg:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("plan audit: x13 candidate join is keyed, never nested-loop") {
    import graft.operators.Dedup
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Dedup.sortedNeighborhoodDocs(
        G.table(spark, sf(), "documents"))
      out.collect()
      val s = out.queryExecution.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"),
        s"non-equi join in sorted-neighborhood plan:\n$s")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("table stats: histogram partitions rows, ranges rise, MCV is true top") {
    import spark.implicits._
    import graft.operators.Validation
    val rep = Validation.tableStats(spark, sf())
      .as[(String, Long, Option[Double], Option[Double], Long)].collect()
    val rows = rep.find(_._1 == "rows").get._5
    val hist = rep.filter(_._1 == "hist").sortBy(_._2)
    assert(hist.map(_._5).sum == rows, "histogram bins must partition rows")
    // equi-depth: every bin within 2x of the ideal tenth (ties can skew)
    hist.foreach { b =>
      assert(b._5 > 0 && b._5 < rows / 3, s"degenerate bin: $b") }
    // bin ranges rising and non-overlapping
    hist.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4.get <= b._3.get, s"overlapping bins: $a $b")
      case _ => ()
    }
    // MCV = true top-10 of l_quantity recomputed independently
    val truth = G.table(spark, sf(), "lineitem")
      .groupBy(col("l_quantity").cast("double").as("qty"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("qty"))
      .limit(10).as[(Double, Long)].collect()
    val mcv = rep.filter(_._1 == "mcv").sortBy(_._2)
      .map(r => (r._3.get, r._5))
    assert(mcv.toSeq == truth.toSeq, s"MCV mismatch:\n$mcv\nvs\n$truth")
    // NDV scalars match exact distinct counts
    val ndvP = rep.find(_._1 == "ndv_partkey").get._5
    assert(ndvP == G.table(spark, sf(), "lineitem")
      .select("l_partkey").distinct().count())
  }

  test("keywords: top-1 maximizes tf*idf, recomputed independently") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val out = TextAnalysis.keywords(spark, sf())
      .as[(Long, Int, String, Long, Long, Double)].collect()
    // independent recompute from raw text
    val texts = G.table(spark, sf(), "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val tf = texts.flatMap { case (id, t) =>
      t.toLowerCase.split("\\s+").filter(_.length >= 4).map((id, _)) }
      .groupBy(identity).map { case ((id, term), xs) => (id, term, xs.length.toLong) }
    val df = tf.groupBy(_._2).map { case (term, xs) => term -> xs.size.toLong }
    val nDocs = tf.map(_._1).toSeq.distinct.size.toLong
    val bestByDoc = tf.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, term, f) =>
        (f * ((nDocs.toDouble - df(term) + 0.5) / (df(term) + 0.5)), term)
      }.toSeq.sortBy { case (s, t) => (-s, t) }.head
    }
    out.filter(_._2 == 1).foreach { case (id, _, term, _, _, score) =>
      val (bs, bt) = bestByDoc(id)
      assert(bt == term && math.abs(bs - score) < 1e-9,
        s"doc $id: got ($term, $score), expected ($bt, $bs)")
    }
    assert(out.count(_._2 == 1) == bestByDoc.size)
  }

  test("ivf+pq search: shape invariants and shortlist monotonicity") {
    import spark.implicits._
    import graft.operators.Similarity
    val out = Similarity.ivfPqSearch(spark, sf())
      .as[(Long, Int, Long, Double, Double)].collect()
    val byQ = out.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"ranks not dense for query $q")
      assert(rows.forall(r => r._3 != q), s"self-match for query $q")
      assert(rows.forall(r => r._4 >= 0.0 && math.abs(r._5) <= 1.0 + 1e-12))
      assert(rows.map(_._3).distinct.length == rows.length)
    }
    // growing the rescore shortlist can only improve the best true sim
    val small = Similarity.ivfPqSearch(spark, sf(), shortlist = 5)
      .as[(Long, Int, Long, Double, Double)].collect()
      .filter(_._2 == 1).map(r => r._1 -> r._5).toMap
    val large = Similarity.ivfPqSearch(spark, sf(), shortlist = 50)
      .as[(Long, Int, Long, Double, Double)].collect()
      .filter(_._2 == 1).map(r => r._1 -> r._5).toMap
    small.keys.foreach { q =>
      assert(large(q) >= small(q) - 1e-12,
        s"query $q: shortlist 50 top-1 sim ${large(q)} < shortlist 5 ${small(q)}")
    }
  }

  test("leak-free split: no near-dup pair straddles train/eval") {
    import spark.implicits._
    import graft.operators.Dedup
    val perDoc = Dedup.leakFreeSplitDocs(spark, sf())
      .as[(Long, Long, String)].collect()
    val splitOf = perDoc.map(r => r._1 -> r._3).toMap
    // every x3c near-dup pair must land on one side
    val pairs = Dedup.simhashNearDups(spark, sf())
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b),
        s"pair ($a,$b) straddles: ${splitOf(a)} vs ${splitOf(b)}")
    }
    assert(pairs.nonEmpty)
    // both sides populated and every doc assigned exactly once
    assert(perDoc.map(_._3).toSet == Set("train", "eval"))
    assert(perDoc.map(_._1).distinct.length == perDoc.length)
  }

  test("sliding distinct: 4x incidence law and windowed-recompute check") {
    import spark.implicits._
    import graft.operators.DashboardQueries
    val out = DashboardQueries.slidingDistinct(spark, sf())
      .as[(Long, Long, Long)].collect()
    val nEvents = G.events(spark, sf()).count()
    assert(out.map(_._2).sum == 4 * nEvents,
      "every event must land in exactly 4 sliding windows")
    out.foreach { case (_, ne, nu) => assert(nu <= ne && nu > 0) }
    // independent recompute for one mid-range window
    val probe = out(out.length / 2)._1
    val expect = G.eventsRaw(spark, sf())
      .filter(expr(s"ts_ns DIV 1000000 >= $probe AND " +
        s"ts_ns DIV 1000000 < $probe + 3600000"))
      .select("user_id").distinct().count()
    assert(out.find(_._1 == probe).get._3 == expect,
      s"window $probe distinct mismatch")
  }

  test("power iteration: Rayleigh estimate is monotone over rounds") {
    import spark.implicits._
    import graft.operators.Similarity
    val e = G.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    val lambdas = (1 to 3).map { r =>
      Similarity.powerIterVecs(e, 64, r)
        .select(col("lambda")).distinct().as[Double].head()
    }
    assert(lambdas(0) <= lambdas(1) + 1e-9 && lambdas(1) <= lambdas(2) + 1e-9,
      s"||Av|| must be nondecreasing under power iteration: $lambdas")
  }
}
