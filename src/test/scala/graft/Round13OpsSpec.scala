package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Round-8 wave: the join-condition hygiene audit. A filter on a computed
  * similarity column (`j >= tau`) implies IsNotNull(j); predicate pushdown
  * clones that constraint into the upstream join's condition, where the
  * heavy pair expression (shingle-array intersect, 128-dim dot product)
  * re-evaluates for every ORDERED joined pair — ahead of the cheap
  * `id_a < id_b` ordering predicate, so twice the unordered-pair count,
  * and pure waste because the real `j >= tau` check runs anyway. Measured
  * 3.7× on the threshold sweep when removed (the coalesce fix).
  *
  * What these tests pin, precisely:
  *  - no join condition anywhere in the pair-verify queries contains an
  *    `isnotnull(<heavy expr>)` clone — the defect shape;
  *  - the threshold sweep's cross join (whose tau is a GENERATED column,
  *    so the real filter cannot push down) carries no heavy expression at
  *    all in its condition.
  * The `j >= tau` predicate itself landing in a literal-tau join condition
  * is CORRECT optimizer behavior (it filters pairs early, inside the join,
  * behind the short-circuiting ordering predicate) and is not flagged. */
class Round13OpsSpec extends SparkSpec {

  private def executed(df: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { val d = df; d.collect(); d.queryExecution.executedPlan }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private val heavy = Seq("array_intersect", "array_union", "vector_dot")

  private def conditions(plan: SparkPlan): Seq[String] =
    plan.collect { case j: BaseJoinExec => j.condition }
      .flatten.map(_.sql.toLowerCase)

  /** No isnotnull(...) wrapping a heavy expression in any join condition. */
  private def auditNoNullCheckClones(plan: SparkPlan): Unit =
    conditions(plan).foreach { s =>
      val notnulls = "isnotnull\\(".r.findAllMatchIn(s).map(_.start).toSeq
      notnulls.foreach { i =>
        // the isnotnull argument span: up to the matching close paren
        var depth = 0; var j = s.indexOf('(', i)
        val start = j
        while (j < s.length && (depth > 0 || j == start)) {
          if (s(j) == '(') depth += 1
          if (s(j) == ')') depth -= 1
          j += 1
        }
        val arg = s.substring(start, j)
        heavy.foreach { h =>
          assert(!arg.contains(h),
            s"isnotnull clone of heavy expression '$h' in join condition: $s")
        }
      }
    }

  test("threshold sweep: cross-join condition carries no gram intersect " +
    "at all (generated tau cannot push the real filter down)") {
    val plan = executed(operators.Dedup.thresholdSweep(spark, sf()))
    conditions(plan).foreach { s =>
      heavy.foreach { h =>
        assert(!s.contains(h),
          s"heavy expression '$h' in the sweep's join condition: $s")
      }
    }
  }

  test("simjoin: no isnotnull clone of the shingle intersect in any join " +
    "condition") {
    auditNoNullCheckClones(executed(operators.Dedup.simJoin(spark, sf())))
  }

  test("embedding near-dup + semdedup: no isnotnull clone of the dot " +
    "product in any join condition") {
    auditNoNullCheckClones(
      executed(operators.Similarity.embeddingNearDups(spark, sf())))
    auditNoNullCheckClones(
      executed(operators.Similarity.semDedup(spark, sf())))
  }
}
