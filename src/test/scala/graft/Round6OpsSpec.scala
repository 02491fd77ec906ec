package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-6 operators: the log-idf BM25 production scorer pinned against its
  * hash-checked rational-idf twin (q_t10 / q_t10b — the x2/x2b pattern). */
class Round6OpsSpec extends SparkSpec {

  test("bm25 log-idf twin: same hit set, consistent ranking with q_t10") {
    val rat = TextAnalysis.bm25(spark, sf())
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val log = TextAnalysis.bm25LogIdf(spark, sf())
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rat.nonEmpty)
    // identical hit sets (the idf choice never changes WHICH docs match)
    assert(rat.map(_._1).toSet == log.map(_._1).toSet)
    // all scores strictly positive under both idfs (df <= N)
    assert(log.forall(_._2 > 0.0))
    // ranking agreement: ln is monotone per TERM, but a sum of per-term
    // monotone transforms is not monotone in the sum, so docs with
    // different term mixes can swap locally (measured: first swap at
    // rank 5 on sf0.001). Pin what actually holds: the head of the
    // ranking and near-total rank correlation.
    assert(rat.map(_._1).take(5) == log.map(_._1).take(5))
    val rr = rat.map(_._1).zipWithIndex.toMap
    val lr = log.map(_._1).zipWithIndex.toMap
    val n = rr.size.toDouble
    val d2 = rr.map { case (id, r) =>
      val d = (r - lr(id)).toDouble; d * d }.sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    assert(rho > 0.99, s"spearman rho $rho")
  }
}
