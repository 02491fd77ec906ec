package graft

import graft.operators.{Curation, Dedup, Similarity, TextAnalysis, Validation}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeLike}
import org.apache.spark.sql.functions._

/** Round-7 fourth wave: binary-code ANN, referential integrity, and the
  * plan-shape pins for the whole x15/t20/v8/y19 wave. */
class Round7dOpsSpec extends SparkSpec {

  private def executed(df: => org.apache.spark.sql.DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("y19: hamming matches an in-memory sign-code recompute") {
    val out = Similarity.binarySearch(spark, sf()).collect()
    assert(out.nonEmpty)
    val vecs = G.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def code(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach(i => if (v(i) >= 0.0) lo |= (1L << i))
      (32 until 64).foreach(i => if (v(i) >= 0.0) hi |= (1L << (i - 32)))
      (lo, hi)
    }
    out.foreach { r =>
      val q = code(vecs(r.getLong(0)))
      val c = code(vecs(r.getLong(2)))
      val ham = java.lang.Long.bitCount(q._1 ^ c._1) +
        java.lang.Long.bitCount(q._2 ^ c._2)
      assert(r.getInt(3) == ham, s"row $r expected hamming $ham")
    }
  }

  test("y19: rescored top-1 never beats the exact brute-force top-1") {
    val bf = Similarity.knnBruteForce(spark, sf()).collect()
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    Similarity.binarySearch(spark, sf()).collect()
      .filter(_.getInt(1) == 1)
      .foreach { r =>
        assert(r.getDouble(4) <= bf(r.getLong(0)) + 1e-12)
      }
  }

  test("v9: orphan counts match a brute-force recompute per edge") {
    val out = Validation.refIntegrity(spark, sf()).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 7)
    def longs(t: String, c: String): Array[Long] =
      G.table(spark, sf(), t).select(col(c))
        .collect().map(_.getAs[Number](0).longValue())
    Seq(
      ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .foreach { case (edge, ct, fk, pt, pk) =>
        val fks = longs(ct, fk)
        val pks = longs(pt, pk).toSet
        val r = out(edge)
        assert(r.getLong(1) == fks.length)
        assert(r.getLong(3) == fks.distinct.count(!pks.contains(_)))
        assert(r.getLong(4) == fks.count(!pks.contains(_)))
        assert(r.getBoolean(5) == (fks.count(!pks.contains(_)) == 0))
      }
  }

  test("plan audit: x15 base re-shingle is a semi-join pushdown") {
    val s = executed(Dedup.incrementalLsh(spark, sf())).toString
    assert(s.contains("LeftSemi"), s"no left-semi candidate pushdown:\n$s")
  }

  test("plan audit: t20 unigram lookups broadcast, no sort-merge join") {
    val s = executed(TextAnalysis.collocations(spark, sf())).toString
    assert(s.contains("BroadcastHashJoin"), s"no broadcast join:\n$s")
    assert(!s.contains("SortMergeJoin"), s"unexpected SMJ:\n$s")
    assert(s.contains("TakeOrderedAndProject"), s"top-50 is a global sort:\n$s")
  }

  test("plan audit: v8 denormalization is a broadcast join") {
    val s = executed(Validation.fdAudit(spark, sf())).toString
    assert(s.contains("BroadcastHashJoin"), s"customer side not broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s"unexpected SMJ:\n$s")
  }

  test("y20: recall is monotone in the shortlist and k_total is fixed") {
    val out = Similarity.hammingRecall(spark, sf()).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(5, 10, 20))
    assert(out.forall(_.getLong(2) == 50L)) // 10 queries x top-5
    val recalls = out.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: ${recalls.toSeq}")
    // hits can never exceed k and the full-rescore point must find some
    assert(out.forall(r => r.getLong(1) <= r.getLong(2)))
    assert(out.last.getDouble(3) > 0.0)
  }

  test("c24: matrix matches an in-memory recompute of the planted population") {
    val out = Curation.crossSourceDups(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val docsRaw = G.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val all = docsRaw.map { case (_, t, s) => (t, s) } ++
      docsRaw.filter(_._1 % 5 == 0).map { case (_, t, _) => (t, "recrawl") } ++
      docsRaw.filter(_._1 % 7 == 0).map { case (_, t, s) => (t, s) }
    val grouped = all.groupBy(identity).map { case ((t, s), rs) =>
      (t, s, rs.length.toLong) }.toSeq
    val cross = for {
      (t1, s1, c1) <- grouped; (t2, s2, c2) <- grouped
      if t1 == t2 && s1 < s2
    } yield ((s1, s2), c1 * c2)
    val within = grouped.filter(_._3 >= 2).map { case (_, s, c) =>
      ((s, s), c * (c - 1) / 2) }
    val expect = (cross ++ within).groupBy(_._1).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._2).sum) }
    assert(out == expect, s"got ${out.size} cells, expected ${expect.size}")
  }

  test("plan audit: y19 hamming stage never shuffles full vectors") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val d = Similarity.binarySearch(spark, sf())
    d.collect()
    val plan = d.queryExecution.executedPlan
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    plan.collect { case e: ShuffleExchangeLike => e }.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("v") && !names.contains("qv"),
        s"full vectors in a shuffle: $names")
    }
  }
}
