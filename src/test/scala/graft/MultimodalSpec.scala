package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: resize stage semantics + metadata-only pruning. */
class MultimodalSpec extends SparkSpec {

  test("resize halves the payload and metadata consistently") {
    val r = Multimodal.resize(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val orig = row.getAs[Long]("orig_bytes")
      val neu = row.getAs[Long]("new_bytes")
      assert(neu == (orig + 1) / 2)
      assert(row.getAs[String]("resized_hex").length == neu * 2)
    }
    // spot-check bytes: the resized payload is every 2nd byte of the text
    val doc = G.table(spark, sf(), "documents")
      .filter(col("doc_id") === 1).select("text").head().getString(0)
    val expected = doc.getBytes("UTF-8").indices.collect {
      case i if i % 2 == 0 => f"${doc.getBytes("UTF-8")(i)}%02X"
    }.mkString
    val got = r.find(_.getAs[Long]("doc_id") == 1L).get
      .getAs[String]("resized_hex")
    assert(got == expected)
  }

  test("metadata predicates never read the blob column (column pruning)") {
    val base = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.withMedia(spark, sf()).write.parquet(s"$base/media")
    val q = spark.read.parquet(s"$base/media")
      .filter(col("media_meta.n_bytes") >= 50)
      .select(col("doc_id"), col("media_meta.width"))
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val read = scan.requiredSchema.fieldNames.toSet
    assert(!read.contains("media"), s"blob read unnecessarily: $read")
  }
}
