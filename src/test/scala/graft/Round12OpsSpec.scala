package graft

import org.apache.spark.sql.functions._

/** Round-8 wave: dynamic partition pruning through real storage (st7). */
class Round12OpsSpec extends SparkSpec {

  test("st7 dpp: the fact scan carries a dynamicpruning partition filter " +
    "— runtime pruning, not static — and the result covers exactly the " +
    "quarter") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (rows, plan) =
      try {
        val d = Tables.dppJoin(spark, sf())
        val r = d.collect()
        (r, d.queryExecution.executedPlan)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(rows.nonEmpty && rows.length <= 3)
    assert(rows.forall(_.getString(0).startsWith("1997-0")))
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val pf = scans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString
    assert(pf.contains("dynamicpruning"),
      s"fact scan has no runtime pruning subquery: $pf\n$plan")
    // and the reconciliation: the pruned scan lost no rows vs the
    // unpartitioned recompute
    val want = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .filter(col("ship_month").isin("1997-01", "1997-02", "1997-03"))
      .groupBy(col("ship_month")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_lines") == want(r.getString(0)))
    }
  }
}
