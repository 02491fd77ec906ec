package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Dedup/similarity/text operator semantics on sf0.001. */
class DedupSimilaritySpec extends SparkSpec {

  test("minhash LSH recovers every planted near-dup pair") {
    val planted = G.table(spark, sf(), "documents")
      .filter(col("doc_id") % 7 === 0)
      .filter(size(split(col("text"), "\\s+")) >= 4)
      .count()
    val recovered = Dedup.minhashLshPairs(spark, sf())
      .filter(col("doc_b") === col("doc_a") + 2000000)
      .count()
    assert(recovered == planted)
    assert(planted > 0)
  }

  test("exact dedup collapses planted duplicates to n_copies=2") {
    val r = Dedup.dedupExact(spark, sf())
    assert(r.filter(col("n_copies") === 2).count() ==
      G.table(spark, sf(), "documents").filter(col("doc_id") % 5 === 0).count())
    assert(r.filter(col("n_copies") > 2).count() == 0)
  }

  test("simhash of near-identical docs is close in hamming distance") {
    import spark.implicits._
    val base = G.table(spark, sf(), "documents")
      .filter(col("doc_id") === 42).select(col("text")).as[String].head()
    val perturbed = base.split(" ").drop(1).mkString(" ")
    val df = Seq((1L, base), (2L, perturbed), (3L, "completely different words entirely"))
      .toDF("doc_id", "text")
    // reuse the operator's expressions by writing docs to a temp view path:
    val sigs = Dedup.simhashOn(df).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
    assert(hamming(sigs(1L), sigs(2L)) <= 8)
  }

  test("checked minhash twin also recovers every planted near-dup pair") {
    val planted = G.table(spark, sf(), "documents")
      .filter(col("doc_id") % 7 === 0)
      .filter(size(split(col("text"), "\\s+")) >= 4)
      .count()
    val recovered = Dedup.minhashLshPairsChecked(spark, sf())
      .filter(col("doc_b") === col("doc_a") + 2000000)
      .count()
    assert(recovered == planted)
    assert(planted > 0)
  }

  test("simhash30 sigs fit in 30 bits and correlate with 64-bit simhash") {
    val s30 = Dedup.simhash30(spark, sf()).collect()
    assert(s30.nonEmpty)
    s30.foreach { r =>
      val sig = r.getAs[Long]("simhash30")
      assert(sig >= 0L && sig < (1L << 30))
      assert(r.getAs[Long]("n_tokens") > 0)
    }
    // identical docs (planted exact dups every 5th id share text elsewhere)
    // must hash identically — determinism across partitions
    val again = Dedup.simhash30(spark, sf()).collect()
    assert(s30.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("knn: brute-force rank-1 has max similarity; IVF stays in cell") {
    val bf = Similarity.knnBruteForce(spark, sf()).collect()
    val byQuery = bf.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    val labels = G.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    Similarity.knnIvf(spark, sf()).collect().foreach { r =>
      assert(labels(r.getAs[Long]("vec_id")) == labels(r.getAs[Long]("query_id")))
    }
  }

  test("IVF results are a subset of brute-force candidates' scores") {
    // within the same cell, IVF top-1 similarity can never exceed the
    // brute-force top-1 for the same query
    val bf1 = Similarity.knnBruteForce(spark, sf())
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("sim")).toMap
    Similarity.knnIvf(spark, sf()).filter(col("rank") === 1).collect()
      .foreach { r =>
        assert(r.getAs[Double]("sim") <= bf1(r.getAs[Long]("query_id")) + 1e-12)
      }
  }

  test("sign-LSH near-dups are a subset of brute force; nontrivial candidate reduction") {
    val brute = Similarity.embeddingNearDups(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDups(spark, sf())
      .filter(col("id_a") < 300 && col("id_b") < 300)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute)) // verification stage guarantees precision
    assert(lsh.nonEmpty)        // and some near-dups do survive the banding
  }

  test("checked sign-LSH twin is also a subset of brute force") {
    val brute = Similarity.embeddingNearDups(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupsChecked(spark, sf())
      .filter(col("id_a") < 300 && col("id_b") < 300)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty)
  }

  test("capBuckets drops a poisoned hot bucket, keeps uniform buckets intact") {
    import spark.implicits._
    // 50 rows colliding in one "hot" bucket (boilerplate text at scale)
    // plus uniform buckets of size <= 3
    val hot = (1L to 50L).map(id => (id, 999L))
    val uniform = (100L to 120L).map(id => (id, id % 7))
    val banded = (hot ++ uniform).toDF("doc_id", "bucket")
    val capped = Dedup.capBuckets(banded, Seq("bucket"), maxBucketSize = 10)
    assert(capped.filter(col("bucket") === 999L).count() == 0)     // hot dropped
    assert(capped.count() == uniform.size)                         // rest intact
    // uniform data below the cap passes through unchanged (row-identical)
    val noCap = Dedup.capBuckets(banded, Seq("bucket"), maxBucketSize = 1000)
    assert(noCap.count() == banded.count())
  }

  test("text quality scores are bounded and fingerprints discriminate") {
    val q = TextAnalysis.qualityScore(spark, sf()).collect()
    assert(q.forall { r =>
      val s = r.getAs[Double]("quality_score"); s >= 0.0 && s <= 1.0 })
    val fp = TextAnalysis.fingerprint(spark, sf())
      .select(countDistinct(col("fp"))).head().getLong(0)
    assert(fp > 450) // 500 docs, collisions rare
  }
}
