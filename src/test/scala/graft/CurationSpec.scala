package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Corpus-curation operator semantics on sf0.001. */
class CurationSpec extends SparkSpec {

  test("hash sample is deterministic and ~7.8% of the corpus") {
    val total = G.table(spark, sf(), "documents").count()
    val a = Curation.hashSample(spark, sf())
    val b = Curation.hashSample(spark, sf())
    val n = a.count()
    assert(n == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // 20/256 expected; allow wide tolerance at small SF
    assert(n > 0 && n < total / 4)
    assert(a.filter(col("bucket") >= "14").count() == 0)
  }

  test("source caps keep at most k docs per source, longest first") {
    val r = Curation.sourceCaps(spark, sf(), k = 10)
    val per = r.groupBy(col("source")).count().collect()
    assert(per.forall(_.getAs[Long]("count") <= 10))
    // within a source, rnk order is non-increasing n_chars
    r.collect().groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val byRnk = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("n_chars"))
      assert(byRnk.zip(byRnk.tail).forall { case (x, y) => x >= y })
    }
  }

  test("chunking covers every document with 20-char overlap and no gaps") {
    val docs = G.table(spark, sf(), "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val chunks = Curation.chunk(spark, sf()).collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
      // starts are 0, 100, 200, ... and the last chunk reaches the doc end
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_start") == i * 100L)
      }
      val last = sorted.last
      assert(last.getAs[Long]("chunk_start") + last.getAs[Long]("chunk_len")
        >= docs(id))
      // every chunk but possibly the last is full-width-or-tail ≤ 120
      assert(sorted.forall(_.getAs[Long]("chunk_len") <= 120))
    }
  }

  test("bigram stats: counts match a hand count on one document") {
    import spark.implicits._
    val df = Seq((1L, "a b a b a"), (2L, "a b c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("curation").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Curation.bigramStats(spark, tmp).collect()
      .map(x => x.getAs[String]("bigram") -> x.getAs[Long]("cnt")).toMap
    // "a b a b a": a-b ×2, b-a ×2; "a b c": a-b, b-c
    assert(r == Map("a b" -> 3L, "b a" -> 2L, "b c" -> 1L))
  }

  test("decontamination flags docs sharing 5-grams with the benchmark set") {
    val flagged = Curation.decontaminate(spark, sf()).collect()
    // no benchmark doc flags itself; every flagged doc shares >= 1 gram
    flagged.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 != 0)
      assert(r.getAs[Long]("n_contaminated_grams") >= 1)
    }
    // ground truth on a planted overlap: a corpus doc that IS a benchmark
    // doc's text (if any exact text dup exists, it must be flagged)
    import spark.implicits._
    val d = G.table(spark, sf(), "documents")
    val benchTexts = d.filter(col("doc_id") % 97 === 0)
      .filter(size(split(col("text"), "\\s+")) >= 5)
      .select("text").as[String].collect().toSet
    val expectedHits = d.filter(col("doc_id") % 97 =!= 0)
      .filter(size(split(col("text"), "\\s+")) >= 5)
      .as[(Long, String, String, String, Long)]
      .collect().count(t => benchTexts.contains(t._2))
    assert(flagged.length >= expectedHits)
  }

  test("shard packing: shards respect the token budget per source") {
    val packed = Curation.packShards(spark, sf(), budget = 2000L).collect()
    packed.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("shard_id") == cum / 2000L)
        cum += r.getAs[Long]("n_tokens")
      }
      // shard ids are non-decreasing in doc order
      val ids = sorted.map(_.getAs[Long]("shard_id"))
      assert(ids.zip(ids.tail).forall { case (a, b) => a <= b })
    }
  }

  test("mix rebalance: kept tokens per lang approach the smallest lang") {
    val r = Curation.mixRebalance(spark, sf()).collect()
    assert(r.nonEmpty)
    val totals = G.table(spark, sf(), "documents")
      .withColumn("n", size(split(col("text"), "\\s+")).cast("long"))
      .groupBy("lang").agg(sum("n").as("total")).collect()
      .map(x => x.getAs[String]("lang") -> x.getAs[Long]("total")).toMap
    val target = totals.values.min
    r.foreach { row =>
      val lang = row.getAs[String]("lang")
      val kept = row.getAs[Long]("kept_tokens")
      // subsample: never exceeds the original, lands near target (hash
      // sampling variance at 500 docs is generous)
      assert(kept <= totals(lang))
      assert(kept <= target * 2)
      // the smallest language keeps (nearly) everything: threshold 10000
      if (totals(lang) == target)
        assert(row.getAs[Long]("threshold") == 10000L)
    }
  }

  test("seq packing: lossless, capacity-respecting, offsets are prefix sums") {
    val cap = 512L
    val rows = Curation.seqPack(spark, sf(), cap).collect()
    val total = G.table(spark, sf(), "documents").count()
    // lossless: every doc packed exactly once
    assert(rows.length == total)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    val byExample = rows.groupBy(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("ex_id")))
    byExample.foreach { case ((shard, ex), ds) =>
      val sorted = ds.sortBy(_.getAs[Long]("doc_id"))
      // a doc never splits: example total fits the capacity unless the
      // example is a single over-long doc
      val tot = sorted.map(_.getAs[Long]("n_tokens")).sum
      assert(tot <= cap || sorted.length == 1,
        s"example ($shard,$ex) overflows with ${sorted.length} docs: $tot")
      // offsets are exact prefix sums of the members in doc_id order
      var run = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("ex_offset") == run)
        run += r.getAs[Long]("n_tokens")
      }
    }
    // ex_ids are contiguous from 0 within each shard
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, ds) =>
      val exs = ds.map(_.getAs[Long]("ex_id")).distinct.sorted
      assert(exs.head == 0L && exs.last == exs.length - 1)
    }
    // greedy is maximal: a new example only opens when the doc would not fit
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, ds) =>
      val sorted = ds.sortBy(_.getAs[Long]("doc_id"))
      sorted.sliding(2).foreach {
        case Array(prev, curr)
          if curr.getAs[Long]("ex_id") == prev.getAs[Long]("ex_id") + 1 =>
          val prevFill = prev.getAs[Long]("ex_offset") +
            prev.getAs[Long]("n_tokens")
          assert(prevFill + curr.getAs[Long]("n_tokens") > cap,
            s"shard $shard opened a new example though the doc fit")
        case _ =>
      }
    }
  }

  test("curation pipeline survivors are en, quality-gated, deduped, sampled") {
    val agg = Curation.curationPipeline(spark, sf()).collect()
    assert(agg.nonEmpty)
    // n_docs and token totals positive; quality_sum consistent with gate
    agg.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n > 0)
      assert(r.getAs[Long]("total_tokens") >= n * 10)
      assert(r.getAs[Double]("quality_sum") >= n * 0.5 - 1e-9)
    }
  }
}
