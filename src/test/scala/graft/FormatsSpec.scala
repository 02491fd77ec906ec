package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._

/** Interchange round-trip fidelity: beyond the oracle hash (which pins
  * all three rows to the parquet truth), the in-test law is that the
  * CSV, JSON and ORC fingerprints are IDENTICAL — a codec that loses
  * type precision diverges from the other two even if the oracle data
  * happened to dodge the lossy case. Plus the negative control: the
  * default millis timestamp pattern is genuinely lossy on micros, i.e.
  * the explicit format in Formats is load-bearing, not cargo cult.
  */
class FormatsSpec extends SparkSpec {

  test("csv/json/orc round-trip fingerprints are identical") {
    val rows = Formats.roundTrip(spark, sf()).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq == Seq("csv", "json", "orc"))
    val payloads = rows.map(r => r.toSeq.drop(1))
    assert(payloads.distinct.length == 1,
      s"codec fingerprints diverge:\n${rows.mkString("\n")}")
    assert(rows(0).getLong(1) > 0) // n_rows
  }

  test("negative control: micros survive CSV only with the explicit format") {
    val spk = spark
    import spk.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt_neg")
    val df = Seq("2024-01-02 03:04:05.123456").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val schema = df.schema
    // default pattern truncates to millis on write
    df.write.mode("overwrite").option("header", "true").csv(s"$tmp/bad")
    val bad = spark.read.schema(schema).option("header", "true")
      .csv(s"$tmp/bad").select(col("ts").cast("string")).as[String].head()
    assert(bad == "2024-01-02 03:04:05.123",
      s"expected millis truncation, got $bad")
    // the Formats pattern round-trips micros exactly
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    df.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", fmt).csv(s"$tmp/good")
    val good = spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", fmt)
      .csv(s"$tmp/good").select(col("ts").cast("string")).as[String].head()
    assert(good == "2024-01-02 03:04:05.123456")
  }
}
