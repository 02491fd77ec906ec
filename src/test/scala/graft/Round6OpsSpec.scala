package graft

import graft.operators.{Curation, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-6 operators: the log-idf BM25 production scorer pinned against its
  * hash-checked rational-idf twin (q_t10 / q_t10b — the x2/x2b pattern),
  * and the product-quantization build/search pair (q_y7 / q_y8). */
class Round6OpsSpec extends SparkSpec {

  test("pq build: every vector coded in every subspace, inertia non-negative") {
    val r = Similarity.pqBuild(spark, sf()).cache()
    val n = G.table(spark, sf(), "embeddings").count()
    val m = 8
    assert(r.count() > 0 && r.count() <= m * 16)
    // each of the m subspaces codes all n vectors exactly once
    val perSub = r.groupBy(col("m")).agg(sum(col("n_vecs")).as("s"))
      .collect().map(_.getLong(1))
    assert(perSub.length == m && perSub.forall(_ == n))
    assert(r.filter(col("inertia") < 0.0).count() == 0)
    r.unpersist()
  }

  test("pq search: 5 ADC neighbors per query, distances non-negative and ranked") {
    val r = Similarity.pqSearch(spark, sf()).cache()
    assert(r.count() == 50) // 10 queries x top-5
    assert(r.filter(col("adist") < 0.0).count() == 0)
    // ranks are 1..5 per query and adist is non-decreasing in rank
    val byQ = r.collect().groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      val d = sorted.map(_.getDouble(3))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
    r.unpersist()
  }

  test("fuzzy decontamination: every planted bench near-dup is recovered") {
    val r = Curation.fuzzyDecontaminate(spark, sf()).cache()
    // planted: bench doc (id+3000000) is its source train doc minus the
    // first token -> jaccard (n-3)/(n-2) for n tokens, well above 0.5 for
    // any doc with >= 5 tokens; LSH banding must recover ALL of them
    val planted = G.table(spark, sf(), "documents")
      .filter(col("doc_id") % 53 === 0 &&
        size(split(col("text"), "\\s+")) >= 5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val found = r.filter(col("bench_id") - 3000000 === col("train_id"))
      .select(col("train_id")).collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty && planted.subsetOf(found),
      s"missed planted contamination: ${planted -- found}")
    assert(r.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() == 0)
    r.unpersist()
    spark.catalog.clearCache()
  }

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
