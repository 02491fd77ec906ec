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

  test("phash48 kernel: positional, median-balanced, dup-invariant") {
    val a = "the quick brown fox jumps over the lazy dog, twice over".getBytes("UTF-8")
    // identical bytes -> identical hash (the planted-dup guarantee)
    assert(Multimodal.phash48(a) == Multimodal.phash48(a.clone()))
    // positional sensitivity: same multiset of bytes, different order
    val rev = a.reverse
    assert(Multimodal.phash48(a) != Multimodal.phash48(rev),
      "byte order must matter (a value histogram would collapse here)")
    // median split keeps the signature balanced: strictly-above-median
    // bits can never exceed 24 of 48
    val bits = java.lang.Long.bitCount(Multimodal.phash48(a))
    assert(bits > 0 && bits <= 24, s"unbalanced signature: $bits bits")
    // degenerate input: single byte -> exactly one non-empty segment
    assert(java.lang.Long.bitCount(Multimodal.phash48(Array[Byte](65))) == 1)
  }

  test("q_m6: banding finds every planted exact-dup pair") {
    val r = Multimodal.phashNearDups(spark, sf()).collect()
    val planted = r.filter(row => row.getAs[Long]("doc_b") ==
      row.getAs[Long]("doc_a") + 4000000L)
    // every 9th doc_id re-keyed verbatim must surface at hamming 0
    assert(planted.length == 56, s"expected 56 planted pairs, got ${planted.length}")
    assert(planted.forall(_.getAs[Long]("hamming") == 0L))
    assert(r.forall(_.getAs[Long]("hamming") <= 1L))
  }

  test("q_m6: no exchange ever carries the blob (sig computed in scan stage)") {
    // AQE off so exchanges are directly collectable (Round5OpsSpec pattern)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = Multimodal.phashNearDups(spark, sf())
        d.collect()
        d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.nonEmpty, "expected at least the banding-join exchange")
    exchanges.foreach { e =>
      val binCols = e.output.filter(
        _.dataType == org.apache.spark.sql.types.BinaryType)
      assert(binCols.isEmpty,
        s"binary column crosses an exchange: ${binCols.map(_.name)}")
    }
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
