package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway profiling main — not part of the driver contract; deleted
// after use
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/region.parquet").count()
    t("full") {
      graft.operators.Dedup.thresholdSweep(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    val grams = G.table(spark, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        expr("""array_distinct(transform(sequence(1, length(text)-2),
               |  i -> substring(text, i, 3)))""".stripMargin).as("grams"))
      .cache()
    t("grams_count")(grams.count())
    val a = grams.select(col("doc_id").as("doc_a"), col("grams").as("g_a"))
      .repartition(col("doc_a"))
    val b = grams.select(col("doc_id").as("doc_b"), col("grams").as("g_b"))
    val pairs = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("j",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))))
      .select(col("doc_a"), col("doc_b"), col("j"))
    t("pairs")(pairs.write.mode("overwrite").format("noop").save())
    t("pairs2")(pairs.write.mode("overwrite").format("noop").save())
    val swept = pairs
      .select(col("doc_a"), col("doc_b"), col("j"),
        explode(expr("array(0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D)"))
          .as("tau"))
      .filter(col("j") >= col("tau"))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_docs_removed"))
    t("swept")(swept.write.mode("overwrite").format("noop").save())
    t("swept2")(swept.write.mode("overwrite").format("noop").save())
    println(swept.queryExecution.executedPlan.toString.take(6000))
    t("full2") {
      graft.operators.Dedup.thresholdSweep(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
