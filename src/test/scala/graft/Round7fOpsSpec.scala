package graft

import graft.operators.{DashboardQueries, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Round-7 sixth wave: k-means‖ seeding (y21), cross-video frame-hash
  * dedup (m8), fixed-point EWMA bands (a21). */
class Round7fOpsSpec extends SparkSpec {

  test("y21: seed structure, one-assignment law, kept = top-k by weight") {
    val out = Similarity.kmeansParallelInit(spark, sf()).collect()
    assert(out.nonEmpty)
    // round 0 is exactly the deterministic seed vector
    val r0 = out.filter(_.getLong(1) == 0L)
    assert(r0.map(_.getLong(0)).toSeq == Seq(0L))
    // every corpus vector is assigned to exactly one candidate
    val n = G.table(spark, sf(), "embeddings").count()
    assert(out.map(_.getLong(2)).sum == n)
    // kept flags mark the top-min(k, candidates) by (weight desc, cid)
    val k = math.min(8, out.length)
    val top = out.map(r => (r.getLong(2), r.getLong(0)))
      .sortBy { case (w, c) => (-w, c) }.take(k)
      .map(_._2).toSet
    assert(out.count(_.getBoolean(3)) == k)
    assert(out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet == top)
    // oversampling stays ~l per round, not a corpus fraction (the
    // uniform-coin property the md5 threshold exists for)
    assert(out.length <= 1 + 2 * 4 * 4, s"${out.length} candidates")
  }

  test("m8: trimmed clips are caught with containment 1.0") {
    val out = Multimodal.videoFrameDedup(spark, sf()).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = G.table(spark, sf(), "documents")
      .filter(col("doc_id") % 11 === 0 && length(col("text")) > 256)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(pairs.contains((id, id + 5000000)), s"missing planted $id")
    }
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    planted.foreach { id =>
      val r = byPair((id, id + 5000000))
      assert(r.getDouble(5) == 1.0, s"containment for $id: ${r.getDouble(5)}")
      // the trimmed copy has one frame-block fewer (or equal, when the
      // dropped first block's hash also appears later)
      assert(r.getLong(2) == math.min(r.getLong(3), r.getLong(4)))
    }
    out.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      assert(r.getDouble(5) >= 0.6 && r.getDouble(5) <= 1.0)
    }
  }

  test("a21: fold matches an in-memory fixed-point recompute exactly") {
    val series = G.table(spark, sf(), "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 100.0) AS BIGINT)").as("cents"),
        expr("unix_millis(CAST(ts AS TIMESTAMP)) DIV 60000").as("minute"))
      .groupBy(col("event_type"), col("minute"))
      .agg(sum(col("cents")).as("v"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).map(_._2)
      }
    val exp = series.map { case (t, vs) =>
      var (e, b, i, na) = (-1L, 0L, 0L, 0L)
      vs.foreach { x =>
        val xm = 1000L * x
        if (e < 0) { e = xm; b = 0; i = 1; na = 0 }
        else {
          val d = math.abs(xm - e)
          if (i >= 8 && d > 4 * b) na += 1
          e = (7 * e + xm) / 8
          b = (7 * b + d) / 8
          i += 1
        }
      }
      t -> (vs.length.toLong, na, e, b)
    }
    val got = DashboardQueries.ewmaBands(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp)
    // anomalies exist somewhere, else the band test is vacuous
    assert(got.values.map(_._2).sum > 0)
  }
}
