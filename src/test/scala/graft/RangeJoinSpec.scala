package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Binned range join equals the naive theta-join formulation. */
class RangeJoinSpec extends SparkSpec {

  test("binned interval join == naive cross-product range join") {
    val HOUR = 3600000L
    val ev = G.eventsRaw(spark, sf())
      .select(expr("ts_ns DIV 1000000").as("ms"), col("user_id"))
    val hot = ev.groupBy(expr(s"ms DIV $HOUR").as("hr"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("hr"))
      .limit(20)
      .select((col("hr") * HOUR - HOUR / 2).as("window_start"),
        (col("hr") * HOUR + 3 * HOUR / 2).as("window_end"))
    val naive = ev.crossJoin(hot)
      .filter(col("ms") >= col("window_start") && col("ms") < col("window_end"))
      .groupBy(col("window_start"), col("window_end"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val binned = Relational.rangeJoinBinned(spark, sf())
    assert(binned.count() > 0)
    assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty)
  }

  test("every interval's bin expansion covers exactly its range") {
    // an interval [s, e) spans bins s/H .. (e-1)/H; any event in the range
    // falls in one of those bins (soundness of the residual-filter shape)
    val HOUR = 3600000L
    val s = 5L * HOUR - HOUR / 2
    val e = 5L * HOUR + 3 * HOUR / 2
    val bins = (s / HOUR) to ((e - 1) / HOUR)
    (s until e by 60000L).foreach { ms =>
      assert(bins.contains(ms / HOUR))
    }
    assert(!bins.contains((s - 1) / HOUR) || (s - 1) / HOUR == s / HOUR)
  }
}
