package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: a bare session (none of our configs
  * pre-set) calling `SparkEntry.entry` — guards the runtime-settable
  * parquet-nanos handling in G.events and rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.printSchema()
    df.show(5, truncate = false)
    println(s"SMOKE rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
  }
}
