package graft

import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Round-5 operators (BM25, weighted sampling) + plan-shape regression
  * audit: the scale-critical physical-plan properties SCALE.md argues from
  * (single keyed exchange, broadcast dims, pushed filters, pruned scans)
  * pinned as tests so a refactor cannot silently regress them. AQE is
  * disabled per-query so scans/exchanges are directly collectable. */
class Round5OpsSpec extends SparkSpec {

  private def executed(df: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bm25: hits bounded by query size, scores positive, ranking consistent") {
    val r = TextAnalysis.bm25(spark, sf()).cache()
    assert(r.count() > 0)
    assert(r.filter(col("n_terms_hit") < 1 || col("n_terms_hit") > 4).count() == 0)
    assert(r.filter(col("score") <= 0.0).count() == 0)
    // rational idf keeps per-term contributions positive, so a doc hitting
    // all 4 terms cannot score below the minimum single-term contribution
    // of its own terms — weak sanity: top row hits at least 2 terms
    assert(r.head().getLong(2) >= 2)
    r.unpersist()
  }

  test("weighted sample: deterministic subset, threshold law, full-weight docs kept") {
    val r = Curation.weightedSample(spark, sf()).cache()
    val d = G.table(spark, sf(), "documents")
    assert(r.count() > 0 && r.count() <= d.count())
    // kept rows obey the bucket < floor(10000 * min(1, n_chars/2000)) law
    assert(r.filter(col("bucket") >= col("threshold")).count() == 0)
    // determinism under re-evaluation
    assert(r.exceptAll(Curation.weightedSample(spark, sf())).count() == 0)
    // every full-weight doc (n_chars >= 2000 -> threshold 10000) is kept
    val full = d.filter(col("n_chars") >= 2000).count()
    assert(r.filter(col("threshold") === 10000).count() == full)
    r.unpersist()
  }

  // ---------------------------------------------------------------- plans

  test("plan audit: q_a1 window agg is one keyed exchange + presentation sort") {
    val plan = executed(
      operators.TradeAggregates.windowAgg5m(spark, sf()))
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.length == 2,
      s"expected hash (agg) + range (orderBy) exchanges only, got:\n$plan")
    val kinds = exchanges.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(kinds.exists(_.contains("Hash")) && kinds.exists(_.contains("Range")),
      s"unexpected partitionings: $kinds")
    // partial->final agg: two HashAggregate nodes around the hash exchange
    assert(plan.toString.split("HashAggregate").length - 1 >= 2)
  }

  test("plan audit: q_r1 pushes the shipdate filter into the parquet scan") {
    val plan = executed(operators.Relational.pricingSummary(spark, sf()))
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "[]"))
    assert(pushed.exists(p => p.contains("LessThanOrEqual(l_shipdate")),
      s"shipdate filter not pushed: $pushed")
    // column pruning: the 16-column lineitem scan reads only the 7 needed
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.length <= 7,
        s"lineitem scan reads ${s.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("plan audit: q_r2 keeps the part dimension broadcast (no sort-merge join)") {
    val plan = executed(operators.Relational.revenueByBrand(spark, sf()))
    val str = plan.toString
    assert(str.contains("BroadcastHashJoin"), s"no broadcast join in:\n$str")
    assert(!str.contains("SortMergeJoin"),
      "fact-dim join degraded to sort-merge — dim side no longer broadcast")
  }

  test("plan audit: q_t10 broadcasts df/stats; documents scan prunes to id+text") {
    val plan = executed(TextAnalysis.bm25(spark, sf()))
    val str = plan.toString
    assert(str.contains("BroadcastHashJoin") ||
      str.contains("BroadcastNestedLoopJoin"))
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet.subsetOf(Set("doc_id", "text")),
        s"documents scan reads ${s.requiredSchema.fieldNames.mkString(",")}")
    }
    // doc length is a projection and tf is cached: the corpus is tokenized
    // ONCE (inside the cached tf build — was four explode lineages when dl
    // and avgdl re-exploded and tf/df each re-derived the scan). The outer
    // plan must therefore contain NO Generate and read tf via the
    // in-memory relation.
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.isEmpty,
      s"explode leaked out of the cached tf build (${gens.length}):\n$plan")
    assert(plan.toString.contains("InMemoryTableScan"),
      s"tf not served from cache:\n$plan")
    spark.catalog.clearCache()
  }
}
