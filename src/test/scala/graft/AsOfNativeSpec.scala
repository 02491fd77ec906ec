package graft

import graft.operators.Relational
import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.functions._

/** Native as-of join (custom LogicalPlan/Strategy/SparkPlan): equivalence
  * with the compositional encoding, plan shape, and edge semantics. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of == union-window as-of on the events corpus") {
    val native = Relational.asofJoinNative(spark, sf()).collect().map(_.toSeq)
    val window = Relational.asofJoin(spark, sf()).collect().map(_.toSeq)
    assert(native.length == window.length && native.length > 0)
    assert(native.toSeq == window.toSeq)
  }

  test("plan uses AsOfJoinExec with one exchange per side") {
    val df = Relational.asofJoinNative(spark, sf())
    // executedPlan is AQE-wrapped (AdaptiveSparkPlanExec holds the inner
    // plan in a field, not children) — assert on the rendered tree
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin"), planStr)
    // hash exchanges: one per join side + one for the signups pre-agg
    // (grouped by (user, ms), which cannot satisfy the join's user-only
    // clustering); the only other exchange is the presentation range sort
    assert("Exchange hashpartitioning".r.findAllIn(planStr).size == 3, planStr)
  }

  test("edge semantics: strict inequality, latest prior, key isolation") {
    val left = Seq(
      (1L, 10L, 100L),  // event 1, key 10, t=100
      (2L, 10L, 200L),
      (3L, 20L, 150L),
      (4L, 30L, 500L)   // key with no signups at all
      ).toDF("event_id", "user_id", "ms")
    val right = Seq(
      (10L, 100L, 7L),  // same ms as event 1 → strict: NOT matched to it
      (10L, 150L, 8L),
      (20L, 149L, 9L)
      ).toDF("s_user", "s_ms", "signup_id")
    val r = AsOfJoin.asof(left, right, "user_id", "s_user", "ms", "s_ms")
      .select(col("event_id"), col("signup_id"), col("s_ms"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // event 1: signup at exactly t=100 is not strictly before → dropped
    // event 2 (t=200): latest prior among {100, 150} → 150/id 8
    // event 3 (key 20, t=150): prior 149/id 9
    // event 4: no right rows for key 30 → dropped
    assert(r == Set((2L, 8L, 150L), (3L, 9L, 149L)))
  }

  test("many keys / random times: native == brute force") {
    val rnd = new scala.util.Random(42)
    val leftRows = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
    val rightRows = Seq.tabulate(100)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong))
    // dedup right times per key (as-of needs a unique latest-prior)
    val rightDedup = rightRows.groupBy(t => (t._1, t._2))
      .map { case (_, vs) => vs.maxBy(_._3) }.toSeq
    val native = AsOfJoin.asof(
        leftRows.toDF("event_id", "user_id", "ms"),
        rightDedup.toDF("s_user", "s_ms", "signup_id"),
        "user_id", "s_user", "ms", "s_ms")
      .select("event_id", "signup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = leftRows.flatMap { case (e, k, t) =>
      val prior = rightDedup.filter(r => r._1 == k && r._2 < t)
      if (prior.isEmpty) None
      else Some((e, prior.maxBy(r => (r._2, r._3))._3))
    }.toSet
    assert(native == brute)
  }
}
