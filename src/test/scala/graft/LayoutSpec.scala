package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed-layout co-located join: both sides bucketed on the join key →
  * the join plans with NO shuffle Exchange (SCALE.md join section). */
class LayoutSpec extends SparkSpec {

  test("bucketed fact-to-fact join is shuffle-free") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val li = G.table(spark, sf(), "lineitem")
    val ord = G.table(spark, sf(), "orders")
    Tables.writeBucketed(li.select(col("l_orderkey"), col("l_extendedprice")),
      "li_b", s"$base/li", "l_orderkey", 8)
    Tables.writeBucketed(ord.select(col("o_orderkey"), col("o_totalprice")),
      "ord_b", s"$base/ord", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("IVF cell layout: probe scans only its partition (partition pruning)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = Files.createTempDirectory("graft_ivf").toString
    G.table(spark, sf(), "embeddings")
      .write.partitionBy("label").parquet(s"$base/ivf")
    val nCells = G.table(spark, sf(), "embeddings")
      .select("label").distinct().count()
    // the IVF probe: restrict to the query's coarse cell
    val probe = spark.read.parquet(s"$base/ivf").filter(col("label") === 3)
    val scan = probe.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"cell predicate must become a partition filter:\n${probe.queryExecution}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"probe must read 1 of $nCells cells, read ${scan.selectedPartitions.partitionCount}")
    assert(probe.count() > 0)
  }

  test("Graft facade: open registers views + vector_dot, query() resolves") {
    Graft.open(spark, sf())
    assert(spark.sql("SELECT count(*) FROM events_v").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
    assert(Graft.query("q_r1_pricing_summary")(spark, sf()).count() > 0)
    assert(Graft.queryNames.size == SparkEntry.queries.size)
  }

  test("spark.sql panel surface runs every panel") {
    operators.SqlSurface.createViews(spark, sf())
    operators.SqlSurface.panels.foreach { case (name, sql) =>
      val n = spark.sql(sql).count()
      assert(n > 0, s"panel $name returned no rows")
    }
  }
}
