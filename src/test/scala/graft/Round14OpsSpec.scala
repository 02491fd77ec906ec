package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Round-8 wave: bench-credibility and silent-scale-killer pins.
  *
  *  - q_g6_hits plan pin: the round-7 bench flagged a 1.6× run-to-run
  *    drift on HITS with no plan explanation; these assertions freeze the
  *    plan shape (cached edge reuse, broadcast 1-row normalizers, no
  *    cartesian, bounded exchange count, TakeOrderedAndProject output) so
  *    any future drift that IS a plan change fails here instead of being
  *    a bench footnote.
  *  - global-window audit: `WindowExec` with an empty partition spec moves
  *    the ENTIRE input to one partition — fine on a provably O(small)
  *    frame (BPE merge candidates, 20-source waterfill states), fatal on a
  *    data-proportional one. The sweep plans every batch query and fails
  *    if an unpartitioned window appears outside the reviewed whitelist.
  *  - COVERAGE.md totals: single-sourced against SparkEntry at test time
  *    (the round-7 doc carried two conflicting hand-maintained blocks).
  */
class Round14OpsSpec extends SparkSpec {

  private def executed(df: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("g6 hits: plan shape is pinned — cached edges, broadcast " +
      "normalizers, no cartesian, bounded exchanges") {
    val plan = executed(operators.Graph.hits(spark, sf()))
    // na1 and a2 both feed TWO consumers, so both are localCheckpoint-
    // materialized: their subtrees (edge-cache scans, degree/hub aggs,
    // na1/nh1 normalizer BNLJs) run ONCE in build jobs and the FINAL plan
    // reads the materialized frames — it carries exactly ta2's normalizer
    // BNLJ and nothing of the half-step machinery.
    val bnlj = plan.collect { case e: BroadcastNestedLoopJoinExec => e }
    assert(bnlj.size == 1, s"expected 1 broadcast normalizer join, got " +
      s"${bnlj.size}")
    assert(plan.collect { case e: CartesianProductExec => e }.isEmpty,
      "normalizer join degraded to CartesianProduct")
    // top-100 must be TakeOrderedAndProject (never global sort + limit)
    assert(plan.collect { case e: TakeOrderedAndProjectExec => e }.size == 1)
    // exchange budget: upper bound, not equality — FEWER exchanges (e.g.
    // future exchange reuse) is fine, more is the regression this test
    // exists to catch. The final plan over the two checkpointed frames
    // needs only ta2's single-partition agg exchange and the final joins.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 4,
      s"exchange count grew: ${shuffles.size} > 4")
  }

  /** Queries REVIEWED as safe to run a global (unpartitioned) window:
    * every entry's window input is O(small) by construction, never
    * data-proportional. Keep each justification next to its name. */
  private val globalWindowWhitelist: Map[String, String] = Map(
    // share normalizers over ALREADY-AGGREGATED tiny frames
    "q_a22_dow_hour_heatmap" -> "7x24=168 (dow, hour) bucket rows",
    "q_v12_benford" -> "9 first-digit rows",
    "q_t25_zipf" -> "~20 log2 frequency-bucket rows",
    // rank column computed AFTER TakeOrderedAndProject bounds the frame
    "q_c25_dsir_select" -> "row_number after limit(100)",
    "q_y23_ood_mahalanobis" -> "row_number after limit(k)",
    "q_v7_table_stats" -> "MCV rank after limit(10)",
    // windows over per-group reductions bounded by construction
    "q_v5_freshness" -> "trailing-mean over O(distinct days) daily counts",
    "q_p11_late_audit" -> "watermark base over O(6h slices) slice maxima",
    "q_c30_waterfill" -> "<=20 source availability rows",
    "q_y21_kmeanspp_init" -> "k-means|| candidate set, O(l*rounds) rows",
    "q_t18_vocab_growth" -> "cumulative sums over 10 prefix checkpoints",
  )

  test("global-window audit: every unpartitioned WindowExec in a batch " +
      "query plan sits on a reviewed O(small) frame") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val offenders = scala.collection.mutable.Map[String, Int]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1)
        // streaming replays EXECUTE on build (micro-batch machinery, ~90 s
        // of wall per bench run) — their stateful aggregations go through
        // the state store, not WindowExec, so the sweep's target class
        // cannot hide there; planning the 234 batch queries covers it.
        .filterNot(_._1.startsWith("q_stream_"))
        .foreach { case (name, fn) =>
          val plan = fn(spark, sf()).queryExecution.executedPlan
          val globals = plan.collectWithSubqueries {
            case w: WindowExec if w.partitionSpec.isEmpty => 1
            case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => 1
          }.sum
          if (globals > 0) offenders(name) = globals
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val unreviewed = offenders.keySet -- globalWindowWhitelist.keySet
    assert(unreviewed.isEmpty,
      s"unpartitioned WindowExec in un-reviewed queries: " +
        s"${unreviewed.toSeq.sorted.mkString(", ")} — either partition the " +
        "window or add a justified whitelist entry")
    // keep the whitelist honest: an entry whose query no longer plans a
    // global window is stale and must be dropped
    val stale = globalWindowWhitelist.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale whitelist entries (no global window anymore): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("replay shuffle lever: results are partition-count independent " +
      "and the session conf is restored") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // same replay at two state-store widths must produce identical rows
    // (the lever is a cost knob, never a semantics knob)
    val prevWidth = streaming.StreamingJobs.replayShufflePartitions
    streaming.StreamingJobs.replayShufflePartitions = "3"
    val rows3 =
      try streaming.StreamingJobs.windowAggReplay(spark, sf()).collect().toSeq
      finally streaming.StreamingJobs.replayShufflePartitions = prevWidth
    assert(spark.conf.get(key) == before,
      "startReplay leaked the replay partition count into the session")
    val rowsDefault =
      streaming.StreamingJobs.windowAggReplay(spark, sf()).collect().toSeq
    assert(rows3 == rowsDefault,
      "replay output depends on the state-store partition count")
    assert(rows3.nonEmpty)
  }

  test("memoized replay fixtures are immutable: a consumer that arranges " +
      "its own arrival order must not mutate the shared stage") {
    // resumeReplay splits the staged fixture into two arrival phases; it
    // shares the (sentinels=1, parts=4) stage with slidingDistinctReplay,
    // so it must COPY — a move would empty the stage for the next
    // consumer and for its own second call. Run resume twice and a
    // sharing consumer after it: all three must succeed with stable rows.
    val r1 = streaming.StreamingJobs.resumeReplay(spark, sf()).collect()
    val r2 = streaming.StreamingJobs.resumeReplay(spark, sf()).collect()
    assert(r1.toSeq == r2.toSeq && r1.nonEmpty,
      "resumeReplay is not idempotent over the shared stage")
    val sliding =
      streaming.StreamingJobs.slidingDistinctReplay(spark, sf()).collect()
    assert(sliding.nonEmpty,
      "sharing consumer found an emptied/mutated stage")
  }

  test("coverage totals are single-sourced: COVERAGE.md machine line " +
      "matches SparkEntry") {
    val line = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("COVERAGE.md"),
        java.nio.charset.StandardCharsets.UTF_8)
      .stream().filter(_.contains("COVERAGE_TOTALS")).findFirst()
      .map[Option[String]](Some(_)).orElse(None)
      .getOrElse(fail("COVERAGE.md lost its <!-- COVERAGE_TOTALS --> line"))
    def field(k: String): Int =
      s"$k=(\\d+)".r.findFirstMatchIn(line)
        .getOrElse(fail(s"$k missing from totals line")).group(1).toInt
    assert(field("TOTAL_QUERIES") == SparkEntry.queries.size,
      s"COVERAGE.md TOTAL_QUERIES=${field("TOTAL_QUERIES")} but " +
        s"SparkEntry.queries.size=${SparkEntry.queries.size}")
    assert(field("ORACLE_CHECKED") == SparkEntry.oracleSql.size,
      s"COVERAGE.md ORACLE_CHECKED=${field("ORACLE_CHECKED")} but " +
        s"SparkEntry.oracleSql.size=${SparkEntry.oracleSql.size}")
    assert(field("ROWS_ONLY") ==
      SparkEntry.queries.size - SparkEntry.oracleSql.size)
  }
}
