package graft

import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query by name: rows, elapsed, optional plan.
  * Usage: runMain graft.RunOne <query_name> [sfDir] [explain]. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    val n = df.count()
    println(f"RUNONE $name rows=$n elapsed=${(System.nanoTime() - t0) / 1e9}%.2fs")
    df.show(10, truncate = false)
    spark.stop()
  }
}
