package graft

import graft.operators.{Curation, Dedup, Graph, Similarity, TextAnalysis, Validation}
import org.apache.spark.sql.functions._

/** Round-7 third-wave additions: incremental index maintenance (x15 LSH
  * delta probe, y18 IVF centroid refresh). */
class Round7cOpsSpec extends SparkSpec {

  /** The delta namespaces are now DERIVED from the corpus: off = max
    * doc_id + 1, dropFirst at +off, novel at +2·off, dropLast at +3·off
    * (hard-coded +2M/+3M/+4M collided with base ids on scale-up corpora —
    * caught by the sf1 correctness pass). */
  private def x15Off: Long = G.table(spark, sf(), "documents")
    .agg(max(col("doc_id"))).head().getLong(0) + 1

  test("x15: planted families drop, reversed docs keep, batch dups flagged") {
    val off = x15Off
    val out = Dedup.incrementalLsh(spark, sf()).collect()
    assert(out.nonEmpty)
    // reversed-token docs (+2·off) are novel: no index or batch match
    val rev = out.filter(r => r.getLong(0) >= 2 * off && r.getLong(0) < 3 * off)
    assert(rev.nonEmpty)
    assert(rev.forall(_.getString(4) == "keep"),
      rev.filter(_.getString(4) != "keep").mkString(","))
    // drop-first copies (+off): J = (n-1)/n >= 7/8 at >= 10 tokens —
    // every one must hit its base doc in the index
    val df1 = out.filter(r => r.getLong(0) >= off && r.getLong(0) < 2 * off)
    assert(df1.nonEmpty)
    assert(df1.forall(r => r.getLong(1) >= 1 && r.getString(4) == "drop"))
    // drop-last copies (+3·off) match the index AND their +off twin
    // within the batch (both sides of the pair get the batch flag)
    val df2 = out.filter(r => r.getLong(0) >= 3 * off)
    assert(df2.nonEmpty)
    assert(df2.forall(r => r.getLong(1) >= 1))
    assert(df2.forall(r => r.getLong(2) >= 1))
    assert(df1.forall(r => r.getLong(2) >= 1))
    // best_jaccard present whenever an index match fired
    assert(out.forall(r => (r.getLong(1) > 0) == (r.getDouble(3) >= 0.5)))
  }

  test("x15: delta output covers exactly the signable delta docs") {
    val off = x15Off
    val out = Dedup.incrementalLsh(spark, sf())
      .select(col("doc_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val base = G.table(spark, sf(), "documents")
    // docs are 10..99 tokens, so every transformed variant stays >= 3
    // tokens and must appear in the report
    val exp =
      base.filter(col("doc_id") % 7 === 0).select(col("doc_id") + off)
        .union(base.filter(col("doc_id") % 7 === 0).select(col("doc_id") + 3 * off))
        .union(base.filter(col("doc_id") % 7 === 3).select(col("doc_id") + 2 * off))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(out == exp)
  }

  test("y18: every vector assigned once; zero-delta cells have zero drift") {
    val out = Similarity.centroidRefresh(spark, sf()).collect()
    val nVec = G.table(spark, sf(), "embeddings").count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == nVec)
    // cells that received no delta recompute the identical mean
    out.filter(_.getLong(2) == 0L).foreach(r => assert(r.getDouble(3) == 0.0))
    // at least one cell absorbed deltas and drifted
    assert(out.exists(r => r.getLong(2) > 0 && r.getDouble(3) > 0.0))
    // drift is a squared distance: never negative
    assert(out.forall(_.getDouble(3) >= 0.0))
  }

  test("t20: lift matches an independent in-memory recompute") {
    val out = TextAnalysis.collocations(spark, sf()).collect()
    assert(out.nonEmpty && out.length <= 50)
    // support floors and descending order
    assert(out.forall(r => r.getLong(2) >= 5 && r.getLong(3) >= 10 &&
      r.getLong(4) >= 10))
    val lifts = out.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    // independent recompute of every reported row from raw text
    val texts = G.table(spark, sf(), "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val bi = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    var nu = 0L; var nb = 0L
    texts.foreach { tx =>
      val t = tx.toLowerCase.split("\\s+")
      t.foreach { w => uni(w) += 1; nu += 1 }
      t.sliding(2).filter(_.length == 2).foreach { p =>
        bi((p(0), p(1))) += 1; nb += 1 }
    }
    out.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(bi((w1, w2)) == r.getLong(2))
      assert(uni(w1) == r.getLong(3) && uni(w2) == r.getLong(4))
      val lift = (bi((w1, w2)).toDouble / nb) /
        ((uni(w1).toDouble / nu) * (uni(w2).toDouble / nu))
      assert(math.abs(lift - r.getDouble(5)) < 1e-4)
    }
  }

  test("c23: selection is exactly the greedy quality-first prefix") {
    val out = Curation.tokenBudget(spark, sf()).collect()
    assert(out.nonEmpty)
    // per-source: budget respected, ranks contiguous from 1
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.forall(_.getLong(4) <= 800L))
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to rows.length))
    }
    // reference greedy fill per source from the scored docs
    val scored = TextAnalysis.qualityScore(spark, sf())
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(G.table(spark, sf(), "documents").select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .collect()
      .map(r => (r.getString(3), r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
    val expect = scored.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(r => (-r._4, r._2)).takeWhile { r =>
        cum += r._3; cum <= 800L }.map(r => (src, r._2)).toSeq
    }.toSet
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSet == expect)
  }

  test("v8: declared keys hold; non-FDs report brute-force violation counts") {
    val out = Validation.fdAudit(spark, sf()).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 5)
    // true keys: zero violations, RHS unique in every group
    Seq("o_orderkey->o_custkey", "o_custkey->c_nationkey").foreach { fd =>
      assert(out(fd).getLong(2) == 0L && out(fd).getLong(3) == 1L
        && out(fd).getBoolean(4))
    }
    // brute-force recompute of one non-FD from the raw tables
    val den = G.table(spark, sf(), "orders")
      .join(G.table(spark, sf(), "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"))
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
    val perNation = den.groupBy(_._1).map { case (_, rs) =>
      rs.map(_._2).distinct.length }
    val fd = out("c_nationkey->c_mktsegment")
    assert(fd.getLong(1) == perNation.size)
    assert(fd.getLong(2) == perNation.count(_ > 1))
    assert(fd.getLong(3) == perNation.max)
    assert(fd.getBoolean(4) == (perNation.count(_ > 1) == 0))
  }

  test("g6: authority matches an in-memory HITS recompute; order descending") {
    val out = Graph.hits(spark, sf()).collect()
    assert(out.nonEmpty)
    val auths = out.map(_.getDouble(2))
    assert(auths.zip(auths.tail).forall { case (a, b) => a >= b })
    // reference 2-round HITS on the collected edge list
    val edges = {
      val li = G.table(spark, sf(), "lineitem")
        .filter(col("l_quantity") >= 30)
        .select(col("l_orderkey"), col("l_partkey"))
      val ord = G.table(spark, sf(), "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val byPart = edges.groupBy(_._2)
    val a1 = byPart.map { case (p, es) => p -> es.length.toDouble }
    val ta1 = a1.values.sum
    val na1 = a1.map { case (p, v) => p -> v / ta1 }
    val h1 = edges.groupBy(_._1).map { case (c, es) =>
      c -> es.map(e => na1(e._2)).sum }
    val th1 = h1.values.sum
    val nh1 = h1.map { case (c, v) => c -> v / th1 }
    val a2 = byPart.map { case (p, es) =>
      p -> es.map(e => nh1(e._1)).sum }
    val ta2 = a2.values.sum
    out.foreach { r =>
      val p = r.getLong(0)
      assert(r.getLong(1) == byPart(p).length) // n_buyers = in-degree
      val ref = a2(p) / ta2
      assert(math.abs(r.getDouble(2) - ref) <= 1e-9 * math.max(ref, 1e-12))
    }
  }

  test("stream_backfill: both layers contribute, seam has no dup or gap") {
    val out = graft.streaming.StreamingJobs.backfillReplay(spark, sf())
      .collect()
    assert(out.nonEmpty)
    // no candle appears in both layers (seam overlap would double a key)
    val keys = out.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
    // the cutoff the replay used (same arithmetic): both sides populated
    val mm = graft.operators.CdcParser.eventsAsEnvelopeJsonTs(spark, sf())
      .agg(min(col("src_ms")), max(col("src_ms"))).head()
    val mid = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    val cutoff = mid - java.lang.Math.floorMod(mid, 900000L)
    assert(out.exists(_.getLong(1) < cutoff))   // batch layer
    assert(out.exists(_.getLong(1) >= cutoff))  // speed layer
    // and the union IS the one-shot batch candle set
    val full = graft.operators.DashboardQueries.ohlcCandles(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(keys.toSet == full.toSet)
  }
}
