package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Round-7 eighth wave: TPC-H-shaped relational classics. */
class Round9OpsSpec extends SparkSpec {

  test("r26 shipping priority: plan pin — customer broadcasts, top-10 is " +
    "TakeOrderedAndProject (no global sort), date filters pushed") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = Relational.shippingPriority(spark, sf())
        d.collect()
        d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s"customer not broadcast:\n$s")
    assert(s.contains("TakeOrderedAndProject"), s"top-10 ran a global sort:\n$s")
    // both date predicates reach the parquet scans as pushed filters
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("o_orderdate") && pushed.contains("l_shipdate"),
      s"date filters not pushed: $pushed")
  }

  test("r26 shipping priority: revenue descends and keys are distinct") {
    val rows = Relational.shippingPriority(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("o_orderkey")).distinct.length == rows.length)
  }
}
