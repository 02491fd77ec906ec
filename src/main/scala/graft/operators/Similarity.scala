package graft.operators

import graft.G
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embedding column (BASELINE north-star).
  *
  * Vector math is done with higher-order functions (`zip_with` +
  * `aggregate`): a strict left-to-right fold in double precision, which is
  * bit-identical to DuckDB's `list_dot_product` over `DOUBLE[]` — verified
  * empirically — so cosine scores hash-match the oracle with no rounding
  * slack on the filter predicates.
  *
  * Scale design (100 TB / billions of vectors):
  *  - brute-force top-k = broadcast the (small) query set, one pass over the
  *    corpus, per-partition top-k via the rank window — no corpus shuffle
  *    except the final tiny top-k exchange. This is the exact baseline.
  *  - the IVF-style variant prunes by a coarse cell id (here the `label`
  *    column as the pre-computed cluster assignment): the corpus is
  *    partitioned/bucketed by cell, a query probes only its cell(s) —
  *    turning a full scan into a 1/|cells| scan. Same plan shape as a
  *    partition-pruned filter, so Catalyst skips non-matching files when the
  *    corpus is written partitioned by cell (see graft.Tables).
  */
object Similarity {

  /** Sequential-fold dot product — the codegen'd native expression
    * (graft.functions.VectorDot); identical fold order to the
    * `zip_with`+`aggregate` formulation and DuckDB's list_dot_product,
    * but runs as a primitive loop inside whole-stage codegen instead of
    * an interpreted per-element closure. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vector_dot(a, b)

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vector_cosine(a, b)

  /** Corpus with per-vector norm precomputed once — cosine over pairs then
    * costs one dot product, not three (norms recomputed per pair would be
    * O(n²) sqrt work; the precomputed value is the identical double, so
    * oracle parity is unaffected). */
  private def embeddings(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    G.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Brute-force cosine top-5 for query vectors (vec_id < 10) over the whole
    * corpus: broadcast queries, single corpus pass, rank window. */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embeddings(spark, dir)
    val queries = embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val knnBruteForceSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_dot_product(e.v, q.qv) /
      |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      |  FROM e, q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, sim FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** IVF-style pruned top-3: probe only the query's coarse cell (label).
    * Scan cost drops by ~|cells|; recall is exact within the cell. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embeddings(spark, dir)
    val queries = embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("label") === col("qlabel"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val knnIvfSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_dot_product(e.v, q.qv) /
      |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      |  FROM e JOIN q ON e.label = q.qlabel
      |  WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, sim FROM ranked
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** q_y11: MMR diverse top-k — greedy maximal-marginal-relevance selection
    * of k=5 vectors for a query (vec_id 0): score = 0.7·rel − 0.3·max
    * cosine to the already-selected set. This is the "pick a diverse
    * few-shot / eval subset" op; greedy MMR is inherently sequential in k,
    * so the round structure is k tiny jobs — each ONE corpus scan scoring
    * every candidate against the ≤k selected vectors (broadcast, O(k·d)
    * bytes) and reducing to a single argmax row. The PageRank/t16 driver-
    * scalar-state pattern again: at 100 TB each round is scan-bound and
    * nothing shuffles but the top-1 reduction. rel/cosine reuse the exact
    * arithmetic the y1 oracle proved bit-parity for; max over selected is
    * exact (no FP accumulation), so the whole greedy trajectory
    * hash-matches the k-unrolled-CTE DuckDB replay. */
  def mmrSelect(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    val cand = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("v"), col("nrm"),
        (dot(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("rel"))
      .cache()
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    var sel: Seq[(Long, Seq[Double], Double)] = Nil
    (1 to k).foreach { r =>
      val scored =
        if (sel.isEmpty) cand.withColumn("maxsim", lit(0.0))
        else {
          val selDf = broadcast(sel.toDF("sid", "sv", "snrm"))
          val pen = cand.crossJoin(selDf)
            .groupBy(col("vec_id"))
            .agg(max(dot(col("v"), col("sv")) / (col("nrm") * col("snrm")))
              .as("maxsim"))
          cand.join(pen, Seq("vec_id"))
        }
      val best = scored
        .filter(!col("vec_id").isInCollection(sel.map(_._1) :+ -1L))
        .withColumn("score", lit(0.7) * col("rel") - lit(0.3) * col("maxsim"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1).head()
      val id = best.getAs[Long]("vec_id")
      sel = sel :+ ((id, best.getAs[Seq[Double]]("v").toVector,
        best.getAs[Double]("nrm")))
      picks += ((r, id, best.getAs[Double]("rel"), best.getAs[Double]("score")))
    }
    cand.unpersist()
    spark.createDataset(picks.toSeq).toDF("pick", "vec_id", "rel", "score")
  }

  val mmrSelectSql: String = {
    // round K: greatest(cos to p1..p_{K-1}) penalty, argmax with vec_id
    // tiebreak; written-form arithmetic mirrors the Column expressions
    def cos(a: String, b: String) =
      s"list_dot_product($a.v, $b.v) / ($a.nrm * $b.nrm)"
    def roundCte(kk: Int): String = {
      val prev = (1 until kk).map(i => s"p$i")
      val pen =
        if (prev.isEmpty) "0.0"
        else if (prev.size == 1) cos("c", "p1")
        else s"greatest(${prev.map(p => cos("c", p)).mkString(", ")})"
      val joins = prev.map(p => s" CROSS JOIN $p").mkString
      val excl =
        if (prev.isEmpty) ""
        else s"WHERE ${prev.map(p => s"c.vec_id <> $p.vec_id").mkString(" AND ")}\n  "
      s"""p$kk AS (
         |  SELECT c.vec_id, c.v, c.nrm, c.rel,
         |    0.7 * c.rel - 0.3 * ($pen) AS score
         |  FROM cand c$joins
         |  ${excl}ORDER BY score DESC, c.vec_id LIMIT 1)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |qv AS (SELECT v, nrm FROM en WHERE vec_id = 0),
       |cand AS (
       |  SELECT c.vec_id, c.v, c.nrm,
       |    list_dot_product(c.v, qv.v) / (c.nrm * qv.nrm) AS rel
       |  FROM en c CROSS JOIN qv WHERE c.vec_id <> 0),
       |${(1 to 5).map(roundCte).mkString(",\n")}
       |${(1 to 5).map(i => s"SELECT $i AS pick, vec_id, rel, score FROM p$i")
            .mkString("\nUNION ALL\n")}
       |ORDER BY pick""".stripMargin
  }

  /** Sign-LSH (random-hyperplane) bucketed ANN — the second scale path next
    * to IVF: L tables of b sign-bits each; a pair collides in a table with
    * probability (1 − θ/π)^b, so candidates shrink from O(n²) to the bucket
    * joins while high-cosine pairs survive with high probability.
    * Hyperplane components are deterministic ±1 from fnv64(table, bit, dim)
    * — reproducible across runs without storing planes. Signatures are a
    * tight mapPartitions loop (see Dedup.fnv64 note); the only joins are
    * bucket-equality. Rows-only (banding isn't SQL-expressible); the spec
    * asserts outputs ⊆ brute-force pairs at the same threshold. */
  /** The sign-LSH ingest stage: (vec_id, v: array<double>) → per-table
    * bucket ids. Hyperplane sign matrix computed ONCE per partition (the
    * deterministic planes are tiny: tables×bits×dims booleans); shared by
    * [[lshNearDups]] and the Stress throughput harness. */
  private[graft] def signatureStage(df: DataFrame, tables: Int = 16,
      bits: Int = 6): DataFrame = {
    val spark2 = df.sparkSession
    import spark2.implicits._
    val dims = 64 // embedding dimensionality (driver schema)
    val vCol = if (df.columns.contains("v")) "v" else "embedding"
    df.select(col("vec_id"), col(vCol)).as[(Long, Array[Double])]
      .mapPartitions { it =>
        // mix64 finalizer is load-bearing: bare fnv64 parity made every
        // plane ±one shared pattern (buckets/table ≈ 2, candidates ≈ n²/4
        // — measured in the round-8 Stress ladder); see Dedup.mix64
        val planes = Array.tabulate(tables, bits, dims) { (t, b, d) =>
          (Dedup.mix64(Dedup.fnv64(s"$t:$b:$d")) & 1L) == 0L
        }
        it.map { case (id, v) =>
          val buckets = Array.tabulate(tables) { t =>
            var sig = 0L
            var b = 0
            while (b < bits) {
              val signs = planes(t)(b)
              var dot = 0.0
              var d = 0
              val n = math.min(v.length, dims)
              while (d < n) {
                dot += (if (signs(d)) v(d) else -v(d))
                d += 1
              }
              if (dot >= 0) sig |= 1L << b
              b += 1
            }
            (t.toLong << 32) | sig // table-qualified bucket id (collision-free
                                   // for any bits <= 32, not just the default 6)
          }
          (id, buckets)
        }
      }.toDF("vec_id", "buckets")
  }

  /** Sketch width derived from corpus size: bits ≈ log₂(n/25), clamped to
    * [2, 24] (bucket ids pack as (table << 32) | sig, so bits ≤ 32 by
    * construction). Expected bucket occupancy is then ~25 vectors/table,
    * holding candidate pairs ~linear in n as the corpus grows — the round-8
    * Stress ladder measured FROZEN bits going quadratic-candidates
    * (10.5 → 24 → 90 s across 1×/2×/4×, candidates ∝ n²/2^bits) or, past
    * capBuckets, silently losing recall. One `count()` per call (parquet
    * metadata read; at 100 TB, catalog stats). The rounding boundary is a
    * ±ULP cross-engine hazard in principle (DuckDB computes the same
    * formula in its oracle CTE), but real corpus counts sit nowhere near
    * an exact .5 of a log₂. */
  private[graft] def autoBits(n: Long): Int =
    math.max(2, math.min(24,
      math.round(math.log(math.max(1L, n) / 25.0) / math.log(2.0)).toInt))

  /** `bits = 0` (the default) derives the sketch width from the corpus
    * count via [[autoBits]]; pass an explicit positive value only to pin a
    * width (specs, ladder control runs).
    *
    * Operating-point caveat, measured by q_y25 across the 1×/10× scale
    * rehearsal: auto-bits holds the CANDIDATE budget linear in n, and the
    * price is boundary recall. At this query's θ = acos(0.35) the
    * per-bit collision probability is p ≈ 0.61, so per-table recall p^bits
    * falls ~1.6× per added bit and the fixed 16-table OR-amplification
    * decays (measured 0.87 at 500 vecs/4 bits → 0.10 at 20k vecs/10
    * bits on the boundary-band pairs that dominate this corpus). Holding
    * recall would need tables ∝ p^-bits ≈ n^0.7 — converging on brute
    * force, which is the known theory result: sign-LSH earns its keep at
    * HIGH-similarity operating points (dup detection, p ≥ 0.85 per bit),
    * not moderate-threshold similarity joins. For those, use the IVF
    * paths (knnIvf / semDedup), which bucket by data geometry instead of
    * random planes. */
  def lshNearDups(spark: SparkSession, dir: String, tables: Int = 16,
      bits: Int = 0, threshold: Double = 0.35): DataFrame = {
    val e = embeddings(spark, dir)
    val b =
      if (bits > 0) bits
      else autoBits(G.table(spark, dir, "embeddings").count())
    val sigs = signatureStage(e.select(col("vec_id"), col("v")), tables, b)
    // the bucket frame feeds BOTH sides of the self-join — cache it so
    // signatures are computed once (at scale: persist signatures as a table);
    // Bench/Verify clearCache() between queries so these blocks don't
    // accumulate across a 50-query session. capBuckets drops degenerate hot
    // buckets (see Dedup.capBuckets) before the O(size²) self-join.
    val banded = Dedup.capBuckets(
      sigs.select(col("vec_id"), explode(col("buckets")).as("bucket")),
      Seq("bucket"), maxBucketSize = 100000)
      .cache()
    val cand = banded.as("a")
      .join(banded.as("b"), col("a.bucket") === col("b.bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val vecs = e.select(col("vec_id"), col("v"), col("nrm"))
    cand
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(G.simFilter(col("sim"), lit(threshold)))
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Oracle-checked sign-LSH twin of [[lshNearDups]] — same 16 tables ×
    * corpus-tuned sign-bits × 0.35 threshold, but the hyperplane signs come from
    * bit 15 of `Dedup.polyHashMod("t:b:d")²  mod p` instead of FNV-64, so DuckDB can
    * regenerate the exact planes from the same short strings and replay
    * the ENTIRE pipeline: plane generation → sign-bit signatures →
    * table-qualified buckets → bucket-equality candidates → exact cosine
    * verify. Float parity holds because the per-bit dot is a sequential
    * ±v[d] sum, which `list_dot_product` against a ±1.0 plane reproduces
    * term-for-term (the same order-parity that makes q_y1 bit-exact). */
  def lshNearDupsChecked(spark: SparkSession, dir: String, tables: Int = 16,
      bits: Int = 0, threshold: Double = 0.35): DataFrame =
    lshNearDupsCheckedOn(embeddings(spark, dir), tables, bits, threshold)

  /** The full checked sign-LSH pipeline (signatures → capped bucket join
    * → exact-cosine verify) on any (vec_id, v, nrm) frame — shared by the
    * query and the Stress `signlsh_neardup` ladder. `bits = 0` derives the
    * width from the frame's own count (the production rule the round-8
    * ladder proved mandatory); the DuckDB oracle computes the identical
    * formula in its `nbits` CTE, so the two engines stay in lockstep at
    * any corpus size. */
  private[graft] def lshNearDupsCheckedOn(e: DataFrame, tables: Int = 16,
      bits0: Int = 0, threshold: Double = 0.35): DataFrame = {
    val spark = e.sparkSession
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val bits = if (bits0 > 0) bits0 else autoBits(e.count())
    val dims = 64
    val sigs = e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        // sign bit = bit 15 of h² mod p, NOT the raw parity: for these
        // short strings the polynomial never wraps the modulus, so its
        // parity is just the digit-sum parity of "t:b:d" and every plane
        // degenerates to ±one shared pattern (measured: 46 buckets for
        // 100k vectors ≈ n²/4 candidates). Squaring mod the odd prime is
        // a real scrambler (quadratic-residue mixing) that DuckDB replays
        // in exact BIGINT arithmetic (h² < 10¹⁸ < 2⁶³); measured bucket
        // balance matches true-random planes.
        val planes = Array.tabulate(tables, bits, dims) { (t, b, d) =>
          val h = Dedup.polyHashMod(s"$t:$b:$d")
          ((((h * h) % 1000000007L) >> 15) & 1L) == 0L
        }
        it.map { case (id, v) =>
          val buckets = Array.tabulate(tables) { t =>
            var sig = 0L
            var b = 0
            while (b < bits) {
              val signs = planes(t)(b)
              var dot = 0.0
              var d = 0
              val n = math.min(v.length, dims)
              while (d < n) {
                dot += (if (signs(d)) v(d) else -v(d))
                d += 1
              }
              if (dot >= 0) sig |= 1L << b
              b += 1
            }
            (t.toLong << 32) | sig
          }
          (id, buckets)
        }
      }.toDF("vec_id", "buckets")
    val banded = Dedup.capBuckets(
      sigs.select(col("vec_id"), explode(col("buckets")).as("bucket")),
      Seq("bucket"), maxBucketSize = 100000)
      .cache()
    val cand = banded.as("a")
      .join(banded.as("b"), col("a.bucket") === col("b.bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val vecs = e.select(col("vec_id"), col("v"), col("nrm"))
    cand
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(G.simFilter(col("sim"), lit(threshold)))
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Unordered body — [[signLshRecallSql]] embeds it as a subquery
    * (factored, not string-surgered: the cdcParseBodySql lesson). */
  val lshNearDupsCheckedBodySql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |nbits AS (
      |  SELECT GREATEST(2, LEAST(24,
      |    CAST(round(log2(GREATEST(1, count(*)) / 25.0)) AS INT))) AS nb
      |  FROM e),
      |planes0 AS (
      |  SELECT t, b,
      |    list_transform(range(0, 64), d ->
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(0, length(t || ':' || b || ':' || d)),
      |          i -> CAST(unicode(substr(t || ':' || b || ':' || d,
      |                 CAST(i+1 AS INT), 1)) AS BIGINT))),
      |        (a, c) -> (a * 31 + c) % 1000000007)) AS hs
      |  FROM (SELECT unnest(range(0, 16)) AS t) tt,
      |       (SELECT unnest(range(0, (SELECT nb FROM nbits))) AS b) bb),
      |planes AS (
      |  SELECT t, b,
      |    list_transform(hs, h ->
      |      CASE WHEN ((h * h) % 1000000007) // 32768 % 2 = 0
      |           THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)
      |      AS plane
      |  FROM planes0),
      |bits AS (
      |  SELECT e.vec_id, p.t,
      |    CASE WHEN list_dot_product(e.v, p.plane) >= 0
      |         THEN CAST(1 AS BIGINT) << p.b ELSE CAST(0 AS BIGINT) END AS bit
      |  FROM e CROSS JOIN planes p),
      |buckets AS (
      |  SELECT vec_id, t * 4294967296 + CAST(SUM(bit) AS BIGINT) AS bucket
      |  FROM bits GROUP BY vec_id, t),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM buckets a JOIN buckets b
      |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      |SELECT c.id_a, c.id_b,
      |  list_dot_product(x.v, y.v) /
      |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
      |FROM cand c JOIN e x ON x.vec_id = c.id_a JOIN e y ON y.vec_id = c.id_b
      |WHERE list_dot_product(x.v, y.v) /
      |      (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) >= 0.35""".stripMargin

  val lshNearDupsCheckedSql: String =
    s"$lshNearDupsCheckedBodySql\nORDER BY id_a, id_b"

  /** q_y25: SIGN-LSH RECALL, measured as a query — the fraction of TRUE
    * cosine ≥ 0.35 pairs (within y3's bounded brute-force window,
    * vec_id < 300) that the banded sketch actually surfaces. The round-8
    * plane fix (see the plane comment in [[lshNearDupsCheckedOn]]) made
    * recall a property of the HYPERPLANES, not of accidental
    * bucket collapse — degenerate planes had "caught" pairs by throwing
    * half the corpus into one bucket; this query pins the honest number
    * the sketch earns, next to q_y10's IVF recall. Counts and the
    * count/count division are exact cross-engine. */
  def signLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val brute = embeddingNearDups(spark, dir).select(col("id_a"), col("id_b"))
    val lsh = lshNearDupsChecked(spark, dir)
      .filter(col("id_a") < 300 && col("id_b") < 300)
      .select(col("id_a"), col("id_b"))
    val caught = brute.join(lsh, Seq("id_a", "id_b"), "left_semi")
    brute.agg(count(lit(1)).as("n_true"))
      .crossJoin(caught.agg(count(lit(1)).as("n_caught")))
      .withColumn("recall",
        col("n_caught").cast("double") / col("n_true").cast("double"))
  }

  val signLshRecallSql: String =
    s"""WITH brute AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |        WHERE vec_id < 300) a,
       |       (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |        WHERE vec_id < 300) b
       |  WHERE a.vec_id < b.vec_id
       |    AND list_dot_product(a.v, b.v) /
       |        (sqrt(list_dot_product(a.v, a.v))
       |         * sqrt(list_dot_product(b.v, b.v))) >= 0.35),
       |lsh AS (
       |  SELECT id_a, id_b FROM ($lshNearDupsCheckedBodySql) t
       |  WHERE id_a < 300 AND id_b < 300),
       |caught AS (
       |  SELECT b.id_a, b.id_b FROM brute b
       |  JOIN lsh l ON b.id_a = l.id_a AND b.id_b = l.id_b)
       |SELECT (SELECT count(*) FROM brute) AS n_true,
       |  (SELECT count(*) FROM caught) AS n_caught,
       |  CAST((SELECT count(*) FROM caught) AS DOUBLE)
       |    / CAST((SELECT count(*) FROM brute) AS DOUBLE) AS recall""".stripMargin

  /** q_y26: IVF-bucketed embedding near-dup JOIN — the production
    * moderate-threshold (τ≈0.35) semantic near-dup path that sign-LSH
    * cannot serve at scale (q_y25 measured the banded sketch's boundary
    * recall collapsing 0.87 → 0.10 at 10× — an LSH theory limit at
    * moderate τ, see the scaladoc on [[lshNearDups]]; this operator is
    * the redirect target made real).
    *
    * Shape: `tables` INDEPENDENTLY-SEEDED k-means partitions of the
    * corpus (table t seeds from vec_ids [t·k, (t+1)·k) — disjoint seed
    * sets give quasi-independent Voronoi structures, the LSH-forest
    * insight applied to IVF). Per table: INDEX each vector in its home
    * cell, PROBE its `nprobe` nearest cells (rank over the exact centroid
    * distances, ties (dist2, cid) — deterministic cross-engine),
    * candidates = (prober, home-indexed) sharing a cell. Candidate pairs
    * union across tables, dedupe to unordered (id_a < id_b), then verify
    * with EXACT cosine ≥ τ. No false positives by construction; recall is
    * a measured quantity (q_y27), not an assumption.
    *
    * Why multiple tables instead of deeper probing: at the SAME candidate
    * budget (T·np·n²/k), independent partitions dominate — measured at
    * 10× under the √n k-law (k=25): 1 table × np=8 → recall 0.833;
    * 2 tables × np=4 → 0.933 (miss events decorrelate across partitions:
    * 1−(1−r)^T). The same sweep measured single-table np=2 collapsing
    * 0.70 → 0.53 across 1×→10× as the cells narrowed, which is why the
    * default budget is 2×4, not the minimal 1×2.
    *
    * Cell law: k = [[autoKNearDup]] (n/200, CONSTANT ~200-vector cells),
    * NOT semdedup's √n [[autoK]] — the two operators have different cost
    * models. Semdedup verifies ALL within-cell pairs, so √n cells
    * equalize assignment (n·k) against pair volume (n²/k) at Θ(n^1.5).
    * Here the pair volume is the whole cost at scale, and constant cells
    * make candidates LINEAR: T·np·c·n = 1600·n — measured 4× fewer
    * candidates at 10× than the √n law AND better recall (0.978 vs
    * 0.933; finer partitions make each probe rank more informative:
    * 1.000 / 0.978 / 0.978 at 1×/sf0.1-10×... i.e. sf0.01/sf0.1/sf1).
    * The price is assignment cost n·k = n²/200 — negligible through the
    * measured rungs (k ≤ 10³ broadcasts ≤ 0.5 MB of centroids); past
    * k ≈ 10⁴ a deployment routes through a two-level index (√k coarse
    * cells pick the candidate fine cells — the IMI move), which changes
    * the probe ranking only, not the pair/verify machinery here.
    *
    * At 100 TB: per table the corpus shuffles ONCE on cid (pair
    * generation is a keyed self-join, never all-pairs); candidates are
    * id-pairs only, payload vectors rejoin for the verify at
    * O(candidates)·d; a hot cell is an AQE skew-join split. The
    * (tables, nprobe) pair is the latency/recall dial; q_y27 prices it
    * honestly at every scale rung. */
  def ivfNearDups(spark: SparkSession, dir: String, k: Int = 0,
      iters: Int = 2, nprobe: Int = 4, tables: Int = 2,
      tau: Double = 0.35): DataFrame = {
    val kk =
      if (k > 0) k
      else autoKNearDup(G.table(spark, dir, "embeddings").count())
    val tabs = (0 until tables).map(t =>
      ivfAssignCentSeeded(spark, dir, kk, iters, t))
    ivfNearDupPairsOf(tabs, embeddings(spark, dir),
      math.min(nprobe, kk), tau)
  }

  /** [[ivfNearDups]] over a caller-supplied (vec_id, v, nrm) frame — the
    * Stress ladder drives synthetic corpora through it (no memo; each
    * table's k-means trains inline). */
  private[graft] def ivfNearDupsOn(e: DataFrame, k: Int, iters: Int = 2,
      nprobe: Int = 4, tables: Int = 2, tau: Double = 0.35): DataFrame = {
    val tabs = (0 until tables).map(t =>
      ivfAssignCentOn(e.select(col("vec_id"), col("v")), k, iters, t))
    ivfNearDupPairsOf(tabs, e, math.min(nprobe, k), tau)
  }

  /** The probe → per-table candidates → union-dedupe → exact-cosine
    * verify tail shared by the memoized and On variants. */
  private def ivfNearDupPairsOf(tabs: Seq[(DataFrame, DataFrame)],
      e: DataFrame, np: Int, tau: Double): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(e.sparkSession)
    val cand = tabs.map { case (assign, cent) =>
      val corpus = assign.select(col("vec_id"), col("cid"), col("v"))
      // the window ranks a v-FREE (vec_id, pcid, pdist2) frame: pdist2 is
      // computed in the crossJoin projection and the 512 B vector payload
      // never enters the n·k sort (the same spill class as the wide-k
      // argmin above; probes only need ids)
      val probes = corpus.select(col("vec_id"), col("v"))
        .crossJoin(broadcast(cent.select(col("cid").as("pcid"), col("c"))))
        .select(col("vec_id"), col("pcid"), graft.functions.VectorExpressions
          .vector_dist2(col("v"), col("c")).as("pdist2"))
        .withColumn("prank", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("pdist2"), col("pcid"))))
        .filter(col("prank") <= np)
        .select(col("vec_id").as("qid"), col("pcid").as("cid"))
      probes.join(corpus.select(col("vec_id").as("hid"), col("cid")), "cid")
        .filter(col("qid") =!= col("hid"))
        .select(least(col("qid"), col("hid")).as("id_a"),
          greatest(col("qid"), col("hid")).as("id_b"))
    }.reduce(_ unionByName _).distinct()
    val x = e.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val y = e.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    cand.join(x, "id_a").join(y, "id_b")
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(G.simFilter(col("sim"), lit(tau)))
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** DuckDB replay of [[ivfNearDups]]: one k-means CTE chain per table
    * (prefix `t<i>` for i > 0; the probe ranking reads straight off each
    * final round's all-centroid distance frame d_iters), the same
    * least/greatest per-table candidates, a UNION (distinct) across
    * tables, the same exact-cosine verify. */
  /** Constant-cell-size law for the near-dup join (see the cell-law
    * paragraph on [[ivfNearDups]]); 200 anchors k(2000) = 10 ≈ the sf0.1
    * bench corpus. The oracle derives the identical k in SQL. */
  private[graft] def autoKNearDup(n: Long): Int =
    math.max(8, (n / 200).toInt)

  private val autoKNearDupSql: String =
    "(SELECT GREATEST(8, CAST(count(*) / 200 AS INT)) FROM e)"

  def ivfNearDupsSql(k: Int = 0, iters: Int = 2, nprobe: Int = 4,
      tables: Int = 2, tau: Double = 0.35): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${ivfNearDupCandCtes(if (k > 0) k.toString else autoKNearDupSql,
          iters, nprobe, tables)},
       |${ivfNearDupVerifyCte(tau)}
       |SELECT id_a, id_b, sim FROM ivfp ORDER BY id_a, id_b""".stripMargin

  /** Per-table k-means + probe + candidate CTEs, and the cross-table
    * `cand` union — shared by q_y26 and the q_y27 recall oracle. */
  private def ivfNearDupCandCtes(kSql: String, iters: Int, nprobe: Int,
      tables: Int): String = {
    val chains = (0 until tables).map { t =>
      val p = if (t == 0) "" else s"t$t"
      val seedPred =
        if (t == 0) s"vec_id < $kSql"
        else s"vec_id >= $t * $kSql AND vec_id < ${t + 1} * $kSql"
      s"""${ivfCtesSeeded(kSql, iters, 64, p, seedPred)},
         |${p}probe AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
         |    FROM ${p}d$iters) t
         |  WHERE rn <= $nprobe),
         |${p}cand0 AS (
         |  SELECT DISTINCT least(p.qid, h.vec_id) AS id_a,
         |                  greatest(p.qid, h.vec_id) AS id_b
         |  FROM ${p}probe p JOIN ${p}a$iters h
         |    ON p.cid = h.cid AND p.qid <> h.vec_id)""".stripMargin
    }.mkString(",\n")
    val union = (0 until tables).map { t =>
      val p = if (t == 0) "" else s"t$t"
      s"SELECT id_a, id_b FROM ${p}cand0"
    }.mkString("\n  UNION\n  ")
    s"$chains,\ncand AS (\n  $union)"
  }

  private def ivfNearDupVerifyCte(tau: Double): String =
    s"""ivfp AS (
       |  SELECT c.id_a, c.id_b,
       |    list_dot_product(x.v, y.v) /
       |      (sqrt(list_dot_product(x.v, x.v))
       |       * sqrt(list_dot_product(y.v, y.v))) AS sim
       |  FROM cand c JOIN e x ON x.vec_id = c.id_a
       |              JOIN e y ON y.vec_id = c.id_b
       |  WHERE list_dot_product(x.v, y.v) /
       |        (sqrt(list_dot_product(x.v, x.v))
       |         * sqrt(list_dot_product(y.v, y.v))) >= $tau)""".stripMargin

  /** q_y27: the IVF near-dup path's RECALL, measured as a query against
    * the y3 bounded brute-force truth window (vec_id < 300, cosine ≥
    * 0.35) — the same honest-measurement contract as q_y25 gives the
    * sign-LSH sketch, so the two operating points sit side by side in
    * every correctness/bench run at every scale. Counts and the
    * count/count division are exact cross-engine. */
  def ivfNearDupRecall(spark: SparkSession, dir: String): DataFrame = {
    val brute = embeddingNearDups(spark, dir).select(col("id_a"), col("id_b"))
    val ivf = ivfNearDups(spark, dir)
      .filter(col("id_a") < 300 && col("id_b") < 300)
      .select(col("id_a"), col("id_b"))
    val caught = brute.join(ivf, Seq("id_a", "id_b"), "left_semi")
    brute.agg(count(lit(1)).as("n_true"))
      .crossJoin(caught.agg(count(lit(1)).as("n_caught")))
      .withColumn("recall",
        col("n_caught").cast("double") / col("n_true").cast("double"))
  }

  def ivfNearDupRecallSql(iters: Int = 2, nprobe: Int = 4,
      tables: Int = 2, tau: Double = 0.35): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${ivfNearDupCandCtes(autoKNearDupSql, iters, nprobe, tables)},
       |${ivfNearDupVerifyCte(tau)},
       |lvf AS (
       |  SELECT id_a, id_b FROM ivfp WHERE id_a < 300 AND id_b < 300),
       |brute AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM e a JOIN e b
       |    ON a.vec_id < b.vec_id AND a.vec_id < 300 AND b.vec_id < 300
       |  WHERE list_dot_product(a.v, b.v) /
       |        (sqrt(list_dot_product(a.v, a.v))
       |         * sqrt(list_dot_product(b.v, b.v))) >= $tau),
       |caught AS (
       |  SELECT b.id_a, b.id_b FROM brute b
       |  JOIN lvf l ON b.id_a = l.id_a AND b.id_b = l.id_b)
       |SELECT (SELECT count(*) FROM brute) AS n_true,
       |  (SELECT count(*) FROM caught) AS n_caught,
       |  CAST((SELECT count(*) FROM caught) AS DOUBLE)
       |    / CAST((SELECT count(*) FROM brute) AS DOUBLE) AS recall""".stripMargin

  /** IVF index BUILD — the missing half of the ANN story (q_y2 assumes the
    * coarse cells exist; this constructs them): k-means with deterministic
    * seeding (centroids ← vectors 0..k-1) and a FIXED number of Lloyd
    * rounds, unrolled declaratively — assignment is a broadcast cross join
    * (k centroid rows against the corpus, corpus never shuffled) + argmin
    * window; the centroid update is posexplode → per-(cell,dim) exact mean
    * (k·d tiny groups) — the new centroids are again a broadcast-sized
    * frame. At 100 TB this is exactly the shape you want: per round, one
    * corpus scan, one k·d-group aggregate, no corpus shuffle at all.
    * Fixed rounds (not convergence-tested) keep the plan static and the
    * cross-engine replay exact; every distance is the same sequential
    * squared-diff fold both engines run term-for-term. */
  def ivfBuild(spark: SparkSession, dir: String, k: Int = 8, iters: Int = 2)
      : DataFrame =
    ivfAssign(spark, dir, k, iters).groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), G.dsum(col("dist2")).as("inertia"))
      .orderBy(col("cid"))

  /** The k-means core of [[ivfBuild]] (and [[semDedup]]'s clustering
    * stage): returns the final per-vector assignment
    * (vec_id, cid, dist2, v). */
  private def ivfAssign(spark: SparkSession, dir: String, k: Int,
      iters: Int): DataFrame =
    ivfAssignCent(spark, dir, k, iters)._1

  /** [[ivfAssign]] plus the centroid frame that produced the final
    * assignment — the probe sweep (q_y15) needs the same centroids to
    * route queries that routed the corpus.
    *
    * Session-scoped MATERIALIZED INTERMEDIATE (the Dedup
    * sharedNearDupPairs pattern): y6/y9/y15/y17 all train the identical
    * (k, iters) k-means over the same corpus — first caller computes and
    * localCheckpoints (survives Bench's catalog.clearCache between
    * queries; persist() would not), later callers reuse. The per-corpus
    * index build a production vector store runs once per snapshot, not
    * once per query. */
  private val ivfMemo = // onEvict: release both checkpoint frames on sweep
    new graft.SessionMemo[(DataFrame, DataFrame)]({ case (a, c) =>
      graft.SessionMemo.unpersistCheckpointed(a)
      graft.SessionMemo.unpersistCheckpointed(c)
    })
  private def ivfAssignCent(spark: SparkSession, dir: String, k: Int,
      iters: Int): (DataFrame, DataFrame) =
    ivfAssignCentSeeded(spark, dir, k, iters, 0)

  /** [[ivfAssignCent]] with a seed OFFSET: table `off` seeds its k-means
    * from vec_ids [off·k, (off+1)·k) — disjoint seed sets per table, the
    * quasi-independent partitions [[ivfNearDups]] unions. off = 0 is the
    * seeding every other IVF query trains, so its memo entry is shared
    * with y6/y9/y15/y17. */
  private def ivfAssignCentSeeded(spark: SparkSession, dir: String, k: Int,
      iters: Int, off: Int): (DataFrame, DataFrame) =
    // (k, iters, off) fold into the memo tag; SessionMemo sweeps entries
    // from stopped sessions on every access (identityHashCode reuse guard)
    ivfMemo.getOrBuild(spark,
        s"$dir#k=$k#it=$iters${if (off == 0) "" else s"#off=$off"}") {
      val (a, c) = ivfAssignCentOn(
        embeddings(spark, dir).select(col("vec_id"), col("v")), k, iters,
        off)
      (a.localCheckpoint(), c.localCheckpoint())
    }

  /** [[ivfAssignCent]] over a caller-supplied (vec_id, v) frame — the
    * incremental refresh (q_y18) trains on the BASE slice only. */
  private[graft] def ivfAssignCentOn(e: DataFrame, k: Int,
      iters: Int, off: Int = 0): (DataFrame, DataFrame) = {
    var cent = e
      .filter(col("vec_id") >= lit(off.toLong * k) &&
        col("vec_id") < lit((off + 1).toLong * k))
      .select(col("vec_id").as("cid"), col("v").as("c"))
    graft.functions.VectorExpressions.ensureRegistered(e.sparkSession)
    var assign: DataFrame = e.sparkSession.emptyDataFrame
    for (round <- 1 to iters) {
      // vector_dist2: the codegen'd native fold (bit-identical to the HOF
      // zip_with+aggregate and the oracle's list_reduce formulation; the
      // HOF's per-row array allocation dominated wide-k assignment)
      val d = e.crossJoin(broadcast(cent))
        .withColumn("dist2", graft.functions.VectorExpressions
          .vector_dist2(col("v"), col("c")))
      // argmin stays a row_number window, DELIBERATELY: min(struct(...))
      // would partial-aggregate the k candidates map-side, but Min over a
      // struct falls to SortAggregate with interpreted comparisons (and
      // copies the payload per candidate) — measured 3.0× slower at
      // 500k×16 (Stress kmeans_argmin vs kmeans_argmin_window; the
      // narrow-struct + join-back variant still loses 2×). One window
      // sort of the candidate frame is the cheapest argmin Spark has.
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cid"))
      assign =
        if (k <= 64)
          d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select(col("vec_id"), col("cid"), col("dist2"), col("v"))
        else {
          // wide-k regime (the near-dup tables' constant-cell law can put
          // k in the hundreds): the 512 B vector payload must NOT ride the
          // n·k window sort — at k = 500, n = 100k that is a ~27 GB sort
          // that spills (measured 303 s on the Stress rung; v-free rank
          // frame is 24 B/row, then ONE n-row join rehydrates v). The
          // join-back loses 2× at small k (the measurement above), so the
          // narrow path is gated, not unconditional.
          d.select(col("vec_id"), col("cid"), col("dist2"))
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .drop("rn")
            .join(e, "vec_id")
            .select(col("vec_id"), col("cid"), col("dist2"), col("v"))
        }
      if (round < iters)
        cent = assign
          .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("cid"), col("dim"))
          .agg(G.davg(col("x")).as("m"))
          .groupBy(col("cid"))
          .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)")
            .as("c"))
    }
    (assign, cent)
  }

  /** q_y15: IVF PROBE SWEEP — recall@5 vs brute force as a function of
    * nprobe ∈ {1, 2, 4}, the tuning table every IVF deployment reads
    * before picking its latency/recall point. Queries route through the
    * SAME final centroids that routed the corpus (ivfAssignCent);
    * candidates are only the vectors in the query's nprobe nearest
    * cells — the scan-fraction knob — ranked by exact cosine; hits are
    * counted against the y1 brute-force truth. All counts integer,
    * recall a single BIGINT division: hash-exact.
    *
    * Scale shape per probe setting: one broadcast of (query, probed cid)
    * rows, one keyed join on cid (no corpus shuffle — the corpus is
    * already cell-assigned), one bounded top-k window. The sweep is
    * |probes| small plans over one cached assignment. */
  def probeSweep(spark: SparkSession, dir: String,
      probes: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val (assignRaw, cent) = ivfAssignCent(spark, dir, 8, 2)
    val corpus = assignRaw.select(col("vec_id"), col("cid"), col("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v")))).cache()
    val qd = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
      .crossJoin(broadcast(cent.select(col("cid").as("pcid"), col("c"))))
      .withColumn("qdist2", expr(
        """aggregate(zip_with(qv, c, (x, y) -> (x - y) * (x - y)),
          |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin))
      .withColumn("cellrank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("qdist2"), col("pcid"))))
      .cache()
    val bf = knnBruteForce(spark, dir)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    probes.map { np =>
      val cells = qd.filter(col("cellrank") <= np)
        .select(col("query_id"), col("pcid").as("cid"), col("qv"),
          col("qnrm"))
      val cand = corpus.join(cells, "cid")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", dot(col("v"), col("qv")) /
          (col("nrm") * col("qnrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id"))
      cand.join(bf, Seq("query_id", "vec_id"), "left")
        .agg(count(lit(1)).as("k_total"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(lit(np).as("nprobe"), col("n_hits"), col("k_total"),
          (col("n_hits").cast("double") / col("k_total")).as("recall"))
    }.reduce(_.unionByName(_)).orderBy(col("nprobe"))
  }

  val probeSweepSql: String = {
    val rounds = ivfRoundsSql(8, 2, 64)
    def one(np: Int): String =
      s"""SELECT $np AS nprobe,
         |  CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_hits,
         |  count(*) AS k_total,
         |  CAST(CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS DOUBLE) / count(*) AS recall
         |FROM (
         |  SELECT query_id, vec_id FROM (
         |    SELECT cl.query_id, a2.vec_id,
         |      row_number() OVER (PARTITION BY cl.query_id ORDER BY
         |        list_dot_product(a2.v, cl.qv) /
         |          (sqrt(list_dot_product(a2.v, a2.v))
         |           * sqrt(list_dot_product(cl.qv, cl.qv))) DESC,
         |        a2.vec_id) AS rank
         |    FROM a2 JOIN (SELECT query_id, cid, qv FROM qd
         |                  WHERE cellrank <= $np) cl
         |      ON a2.cid = cl.cid
         |    WHERE a2.vec_id <> cl.query_id) t WHERE rank <= 5) c
         |LEFT JOIN bf b ON c.query_id = b.query_id AND c.vec_id = b.vec_id""".stripMargin
    s"""$rounds,
       |qd AS (
       |  SELECT q.vec_id AS query_id, q.v AS qv, c1.cid, c1.c,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(range(0, 64), i ->
       |          (q.v[CAST(i+1 AS INT)] - c1.c[CAST(i+1 AS INT)])
       |        * (q.v[CAST(i+1 AS INT)] - c1.c[CAST(i+1 AS INT)]))),
       |        (a, b) -> a + b), c1.cid) AS cellrank
       |  FROM (SELECT vec_id, v FROM e WHERE vec_id < 10) q
       |  CROSS JOIN c1),
       |bfr AS (
       |  SELECT q.query_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY
       |      list_dot_product(e.v, q.qv) /
       |        (sqrt(list_dot_product(e.v, e.v))
       |         * sqrt(list_dot_product(q.qv, q.qv))) DESC, e.vec_id) AS rank
       |  FROM e CROSS JOIN
       |    (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10) q
       |  WHERE e.vec_id <> q.query_id),
       |bf AS (SELECT query_id, vec_id FROM bfr WHERE rank <= 5)
       |${Seq(1, 2, 4).map(one).mkString("\nUNION ALL\n")}
       |ORDER BY nprobe""".stripMargin
  }

  /** q_y25: FILTERED VECTOR SEARCH — ANN under a metadata predicate, the
    * production shape every vector store wrestles with (filtered search:
    * Weaviate/pgvector/FAISS IDSelector all special-case it). Two
    * strategies on the same index, compared per query: PRE-FILTER exact
    * (brute top-3 cosine over only the predicate-passing corpus — the
    * ground truth, affordable when the predicate is selective) vs
    * POST-FILTER IVF (route to nprobe=2 cells via the SHARED
    * [[ivfAssignCent]] memo, drop candidates failing the predicate, top-3
    * of what survives). The output row per query carries the surviving
    * candidate count and recall@3 — the table that shows the
    * filtered-search failure mode: when the predicate thins a probed cell,
    * post-filtering silently loses neighbors that pre-filtering keeps
    * (recall < 1 rows). Predicate is `vec_id % 3 = 0` (a deterministic
    * metadata stand-in, selectivity 1/3).
    *
    * Scale shape: the pre-filter path is one predicate-pushed corpus scan
    * against broadcast queries; the post-filter path joins the
    * cell-assigned corpus on cid (no corpus shuffle) with the predicate
    * applied before the join. Counts integer; recall is one double
    * division by the literal 3. */
  def filteredSearch(spark: SparkSession, dir: String): DataFrame = {
    val (assignRaw, cent) = ivfAssignCent(spark, dir, 8, 2)
    val corpus = assignRaw.select(col("vec_id"), col("cid"), col("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val pred = pmod(col("vec_id"), lit(3L)) === 0L
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    // pre-filter exact truth
    val exact = corpus.filter(pred)
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    // post-filter IVF: route to 2 cells, filter, re-rank
    val cells = queries
      .crossJoin(broadcast(cent.select(col("cid").as("pcid"), col("c"))))
      .withColumn("qdist2", expr(
        """aggregate(zip_with(qv, c, (x, y) -> (x - y) * (x - y)),
          |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin))
      .withColumn("cellrank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("qdist2"), col("pcid"))))
      .filter(col("cellrank") <= 2)
      .select(col("query_id"), col("pcid").as("cid"), col("qv"),
        col("qnrm"))
    val cand = corpus.filter(pred).join(cells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .cache()
    val nCand = cand.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_postfilter_cand"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id"))
      .join(exact, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .join(nCand, "query_id")
      .select(col("query_id"), col("n_postfilter_cand"),
        col("k_returned"), col("n_hits"),
        (col("n_hits").cast("double") / lit(3.0)).as("recall_at_3"))
      .orderBy(col("query_id"))
  }

  val filteredSearchSql: String = {
    val rounds = ivfRoundsSql(8, 2, 64)
    s"""$rounds,
       |qd AS (
       |  SELECT q.vec_id AS query_id, q.v AS qv, c1.cid, c1.c,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(range(0, 64), i ->
       |          (q.v[CAST(i+1 AS INT)] - c1.c[CAST(i+1 AS INT)])
       |        * (q.v[CAST(i+1 AS INT)] - c1.c[CAST(i+1 AS INT)]))),
       |        (a, b) -> a + b), c1.cid) AS cellrank
       |  FROM (SELECT vec_id, v FROM e WHERE vec_id < 10) q
       |  CROSS JOIN c1),
       |ex AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        list_dot_product(e.v, q.qv) /
       |          (sqrt(list_dot_product(e.v, e.v))
       |           * sqrt(list_dot_product(q.qv, q.qv))) DESC,
       |        e.vec_id) AS rank
       |    FROM e CROSS JOIN
       |      (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10) q
       |    WHERE e.vec_id % 3 = 0 AND e.vec_id <> q.query_id) t
       |  WHERE rank <= 3),
       |cand AS (
       |  SELECT cl.query_id, a2.vec_id,
       |    list_dot_product(a2.v, cl.qv) /
       |      (sqrt(list_dot_product(a2.v, a2.v))
       |       * sqrt(list_dot_product(cl.qv, cl.qv))) AS sim
       |  FROM a2 JOIN (SELECT query_id, cid, qv FROM qd
       |                WHERE cellrank <= 2) cl
       |    ON a2.cid = cl.cid
       |  WHERE a2.vec_id % 3 = 0 AND a2.vec_id <> cl.query_id),
       |nc AS (SELECT query_id, count(*) AS n_postfilter_cand
       |       FROM cand GROUP BY query_id),
       |top AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, vec_id) AS rank
       |    FROM cand) t WHERE rank <= 3)
       |SELECT c.query_id, nc.n_postfilter_cand,
       |  count(*) AS k_returned,
       |  CAST(SUM(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hits,
       |  CAST(CAST(SUM(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS DOUBLE) / 3.0 AS recall_at_3
       |FROM top c JOIN nc ON c.query_id = nc.query_id
       |LEFT JOIN ex ON c.query_id = ex.query_id AND c.vec_id = ex.vec_id
       |GROUP BY c.query_id, nc.n_postfilter_cand
       |ORDER BY c.query_id""".stripMargin
  }

  /** SemDeDup (q_y9, Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = k-means cluster the embedding space, then search for
    * near-duplicates ONLY within each cluster — the trick that turns the
    * O(n²) all-pairs cosine scan into O(Σ|cluster|²), which is how
    * semantic dedup runs over web-scale corpora. A vector is REMOVED when
    * some lower-id member of its cluster is cosine-similar above `tau`
    * (the paper keeps one representative per semantic group; lowest id is
    * the deterministic choice). Output: one row per removed vector with
    * its cluster, the representative that displaced it, and its dup
    * stats.
    *
    * Scale shape: clustering is [[ivfAssign]] (broadcast centroids, no
    * corpus shuffle); the within-cluster pair generation is a self-join
    * keyed on cid — the shuffle is O(n) vector rows, the pair blow-up is
    * bounded by the largest cluster (k scales with n in practice; a hot
    * cluster splits under AQE skew-join). Nothing here is all-pairs. */
  /** Cluster count from corpus size: k ≈ √(n/31.25) (floored at 8) — the
    * same static-parameter fix as [[autoBits]], with the FAISS-classic
    * √n balance. Why √n and not ∝ n: semdedup's cost is broadcast
    * assignment (n·k distance rows) PLUS within-cluster verify (n²/k
    * pairs); k ∝ n makes the assignment itself n²/c quadratic (measured:
    * k=80 ran SLOWER than k=8 at 20 k vectors), while k = √(n/c)
    * equalizes both terms at Θ(n^1.5)·√c — the optimum of n·k + n²/k.
    * 31.25 anchors k(2000) = 8 exactly (the sf0.1 bench corpus), so
    * small-sf results are unchanged; the DuckDB oracle derives the
    * identical k in SQL. */
  private[graft] def autoK(n: Long): Int =
    math.max(8, math.round(math.sqrt(n / 31.25)).toInt)

  /** k-expression for the oracle's seed CTE — MUST stay in lockstep with
    * [[autoK]] (`e` is the embeddings CTE every IVF oracle opens with). */
  private val autoKSql: String =
    "(SELECT GREATEST(8, CAST(round(sqrt(count(*) / 31.25)) AS INT)) FROM e)"

  def semDedup(spark: SparkSession, dir: String, k: Int = 0, iters: Int = 2,
      tau: Double = 0.35): DataFrame = {
    val kk =
      if (k > 0) k
      else autoK(G.table(spark, dir, "embeddings").count())
    val assign = ivfAssign(spark, dir, kk, iters)
      .select(col("vec_id"), col("cid"), col("v"))
    val a = assign.select(col("cid"), col("vec_id").as("id_a"),
      col("v").as("va"))
      .withColumn("na", sqrt(dot(col("va"), col("va"))))
    val b = assign.select(col("cid"), col("vec_id").as("id_b"),
      col("v").as("vb"))
      .withColumn("nb", sqrt(dot(col("vb"), col("vb"))))
    a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(G.simFilter(col("sim"), lit(tau)))
      .groupBy(col("id_b"), col("cid"))
      .agg(min(col("id_a")).as("kept_id"),
        count(lit(1)).as("n_dups"),
        max(col("sim")).as("max_sim"))
      .select(col("id_b").as("vec_id"), col("cid"), col("kept_id"),
        col("n_dups"), col("max_sim"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB replay of [[ivfBuild]], GENERATED from the same (k, iters, dims)
    * so a non-default build (e.g. Round3OpsSpec's iters=1) always has a
    * matching oracle — previously a hand-written k=8/iters=2/dims=64 string
    * that silently mismatched any other parameterization. Structure per
    * Lloyd round r: d_r (squared distance to every centroid, the same
    * term-for-term sequential fold as the Spark zip_with/aggregate), a_r
    * (argmin via row_number), and — before a further round — m_r/c_r (the
    * exact per-(cell,dim) DECIMAL mean and re-assembled centroid list). */
  def ivfBuildSql(k: Int = 8, iters: Int = 2, dims: Int = 64): String =
    s"""${ivfRoundsSql(k, iters, dims)}
       |SELECT cid, count(*) AS n_vecs,
       |  CAST(CAST(SUM(CAST(dist2 AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS inertia
       |FROM a$iters GROUP BY cid ORDER BY cid""".stripMargin

  /** DuckDB replay of [[semDedup]]: the shared k-means rounds feeding the
    * within-cluster pair scan — the same per-pair sequential cosine fold
    * as [[embeddingNearDupsSql]]. */
  def semDedupSql(k: Int = 0, iters: Int = 2, dims: Int = 64,
      tau: Double = 0.35): String =
    s"""${ivfRoundsSqlK(if (k > 0) k.toString else autoKSql, iters, dims)},
       |pairs AS (
       |  SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v))
       |       * sqrt(list_dot_product(b.v, b.v))) AS sim
       |  FROM a$iters a JOIN a$iters b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id)
       |SELECT id_b AS vec_id, cid, min(id_a) AS kept_id,
       |  count(*) AS n_dups, max(sim) AS max_sim
       |FROM pairs WHERE sim >= $tau
       |GROUP BY id_b, cid ORDER BY vec_id""".stripMargin

  /** q_y19: BINARY-CODE ANN search — the 1-bit sibling of the int8
    * two-stage search (y13) and the most compressed point on the
    * quantization ladder (float32 2048 B → int8 64+8 B → HERE 8 B/vector):
    * each vector becomes a 64-bit sign code (bit i = v_i ≥ 0), candidates
    * are ranked by Hamming distance — `bit_count(xor)` over two 32-bit
    * halves, pure integer codegen at memory bandwidth — and only the
    * top-20 shortlist is rescored with exact full-precision cosine.
    * Integer distances + total-order tie-breaks make the whole
    * code→rank→rescore chain hash-exact.
    *
    * The code is stored as TWO 32-bit halves, not one 64-bit word: bit 63
    * of a packed BIGINT is its sign bit, and `1::BIGINT << 63` is
    * engine-defined overflow territory (ANSI Spark would throw on the
    * equivalent arithmetic form); two half-words keep every shift ≤ 31 and
    * every value positive on both engines.
    *
    * Scale shape: the sign-code "index build" is one scan-speed projection
    * (8 bytes out per vector); the query stage broadcasts 10 query codes
    * against the code column only — full vectors are read exclusively for
    * the O(queries·20) rescore join-back, the y13/y17 contract. */
  def binarySearch(spark: SparkSession, dir: String, shortlist: Int = 20,
      topK: Int = 5): DataFrame = {
    val e = embeddings(spark, dir)
    val codeLo = expr(
      """aggregate(sequence(0, 31), 0L,
        |  (acc, i) -> acc + IF(element_at(v, i + 1) >= 0.0,
        |                       shiftleft(1L, i), 0L))""".stripMargin)
    val codeHi = expr(
      """aggregate(sequence(32, 63), 0L,
        |  (acc, i) -> acc + IF(element_at(v, i + 1) >= 0.0,
        |                       shiftleft(1L, i - 32), 0L))""".stripMargin)
    val codes = e.select(col("vec_id"), col("v"), col("nrm"))
      .withColumn("lo", codeLo).withColumn("hi", codeHi).cache()
    val queries = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("lo").as("qlo"),
        col("hi").as("qhi"), col("v").as("qv"), col("nrm").as("qnrm"))
    val wH = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("vec_id"))
    val short = codes.select(col("vec_id"), col("lo"), col("hi"))
      .crossJoin(broadcast(queries.select(col("query_id"), col("qlo"), col("qhi"))))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("hamming",
        expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)"))
      .withColumn("hrank", row_number().over(wH))
      .filter(col("hrank") <= shortlist)
      .select(col("query_id"), col("vec_id"), col("hamming"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    short
      .join(codes.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"), col("qnrm"))),
        "query_id")
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(wS))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id"), col("hamming"),
        col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val binarySearchSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |codes AS (
      |  SELECT vec_id, v,
      |    list_sum(list_transform(range(0, 32), i ->
      |      CASE WHEN v[CAST(i+1 AS INT)] >= 0.0
      |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS lo,
      |    list_sum(list_transform(range(32, 64), i ->
      |      CASE WHEN v[CAST(i+1 AS INT)] >= 0.0
      |           THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)) AS hi
      |  FROM e),
      |queries AS (
      |  SELECT vec_id AS query_id, lo AS qlo, hi AS qhi, v AS qv
      |  FROM codes WHERE vec_id < 10),
      |ham AS (
      |  SELECT q.query_id, c.vec_id,
      |    bit_count(xor(c.lo, q.qlo)) + bit_count(xor(c.hi, q.qhi)) AS hamming
      |  FROM codes c CROSS JOIN queries q
      |  WHERE c.vec_id <> q.query_id),
      |short AS (
      |  SELECT query_id, vec_id, hamming FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY hamming, vec_id) AS hrank FROM ham) t
      |  WHERE hrank <= 20),
      |scored AS (
      |  SELECT s.query_id, s.vec_id, s.hamming,
      |    list_dot_product(c.v, q.qv) /
      |      (sqrt(list_dot_product(c.v, c.v))
      |       * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      |  FROM short s
      |  JOIN codes c ON s.vec_id = c.vec_id
      |  JOIN queries q ON s.query_id = q.query_id)
      |SELECT query_id, rank, vec_id, hamming, sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, vec_id) AS rank FROM scored) t
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** q_y20: binary-code RECALL CALIBRATION — the y15-style tuning table
    * for the y19 search: recall@5 against the exact brute-force truth as
    * a function of the hamming shortlist size (5/10/20), i.e. how much
    * rescoring buys back what 1-bit quantization lost. Integer hit
    * counts, one division — hash-exact.
    *
    * The hamming ranking is computed ONCE at the largest shortlist and
    * cached; each sweep point is a filter + re-rank over that ≤ 20-row-
    * per-query frame, so the sweep costs |sizes| tiny plans over one
    * shared candidate stage (the y15 lesson). */
  def hammingRecall(spark: SparkSession, dir: String,
      sizes: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    val e = embeddings(spark, dir)
    val codeLo = expr(
      """aggregate(sequence(0, 31), 0L,
        |  (acc, i) -> acc + IF(element_at(v, i + 1) >= 0.0,
        |                       shiftleft(1L, i), 0L))""".stripMargin)
    val codeHi = expr(
      """aggregate(sequence(32, 63), 0L,
        |  (acc, i) -> acc + IF(element_at(v, i + 1) >= 0.0,
        |                       shiftleft(1L, i - 32), 0L))""".stripMargin)
    val codes = e.select(col("vec_id"), col("v"), col("nrm"))
      .withColumn("lo", codeLo).withColumn("hi", codeHi).cache()
    val queries = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("lo").as("qlo"),
        col("hi").as("qhi"), col("v").as("qv"), col("nrm").as("qnrm"))
    val wH = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("vec_id"))
    val maxS = sizes.max
    val sims = codes.select(col("vec_id"), col("lo"), col("hi"))
      .crossJoin(broadcast(queries.select(col("query_id"), col("qlo"), col("qhi"))))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("hamming", expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)"))
      .withColumn("hrank", row_number().over(wH))
      .filter(col("hrank") <= maxS)
      .join(codes.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"), col("qnrm"))),
        "query_id")
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .select(col("query_id"), col("vec_id"), col("hrank"), col("sim"))
      .cache()
    val bf = knnBruteForce(spark, dir)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sizes.map { s =>
      sims.filter(col("hrank") <= s)
        .withColumn("rk", row_number().over(wS))
        .filter(col("rk") <= 5)
        .select(col("query_id"), col("vec_id"))
        .join(bf, Seq("query_id", "vec_id"), "left")
        .agg(count(lit(1)).as("k_total"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(lit(s).as("shortlist"), col("n_hits"), col("k_total"),
          (col("n_hits").cast("double") / col("k_total")).as("recall"))
    }.reduce(_.unionByName(_)).orderBy(col("shortlist"))
  }

  val hammingRecallSql: String = {
    def one(s: Int): String =
      s"""SELECT $s AS shortlist,
         |  CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hits,
         |  count(*) AS k_total,
         |  CAST(coalesce(sum(hit), 0) AS DOUBLE) / count(*) AS recall
         |FROM (
         |  SELECT t.query_id, t.vec_id,
         |    CASE WHEN b.vec_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM (
         |    SELECT query_id, vec_id FROM (
         |      SELECT query_id, vec_id, row_number() OVER (
         |        PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
         |      FROM sims WHERE hrank <= $s) r
         |    WHERE rk <= 5) t
         |  LEFT JOIN bf b
         |    ON t.query_id = b.query_id AND t.vec_id = b.vec_id) h""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |codes AS (
       |  SELECT vec_id, v,
       |    list_sum(list_transform(range(0, 32), i ->
       |      CASE WHEN v[CAST(i+1 AS INT)] >= 0.0
       |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS lo,
       |    list_sum(list_transform(range(32, 64), i ->
       |      CASE WHEN v[CAST(i+1 AS INT)] >= 0.0
       |           THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)) AS hi
       |  FROM e),
       |queries AS (
       |  SELECT vec_id AS query_id, lo AS qlo, hi AS qhi, v AS qv
       |  FROM codes WHERE vec_id < 10),
       |ranked AS (
       |  SELECT query_id, vec_id, hamming, row_number() OVER (
       |    PARTITION BY query_id ORDER BY hamming, vec_id) AS hrank
       |  FROM (
       |    SELECT q.query_id, c.vec_id,
       |      bit_count(xor(c.lo, q.qlo)) + bit_count(xor(c.hi, q.qhi)) AS hamming
       |    FROM codes c CROSS JOIN queries q
       |    WHERE c.vec_id <> q.query_id) h),
       |sims AS (
       |  SELECT r.query_id, r.vec_id, r.hrank,
       |    list_dot_product(c.v, q.qv) /
       |      (sqrt(list_dot_product(c.v, c.v))
       |       * sqrt(list_dot_product(q.qv, q.qv))) AS sim
       |  FROM ranked r
       |  JOIN codes c ON r.vec_id = c.vec_id
       |  JOIN queries q ON r.query_id = q.query_id
       |  WHERE r.hrank <= 20),
       |ex AS (
       |  SELECT q.query_id, c.vec_id,
       |    list_dot_product(c.v, q.qv) /
       |      (sqrt(list_dot_product(c.v, c.v))
       |       * sqrt(list_dot_product(q.qv, q.qv))) AS sim
       |  FROM e c CROSS JOIN queries q
       |  WHERE c.vec_id <> q.query_id),
       |bf AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
       |    FROM ex) x
       |  WHERE rk <= 5)
       |${Seq(5, 10, 20).map(one).mkString("\nUNION ALL\n")}
       |ORDER BY shortlist""".stripMargin
  }

  /** q_y18: INCREMENTAL IVF index refresh — the maintenance job a deployed
    * ANN index runs when a new embedding batch lands: k-means is NOT
    * retrained; the delta (vec_id % 5 == 4, excluding the seed ids) is
    * assigned to the centroids the BASE corpus trained (one broadcast of
    * k centroid rows against the delta — O(|delta|·k), the base corpus is
    * never rescanned for assignment), then the refresh report recomputes
    * the would-be centroid means over base∪delta and measures per-cell
    * drift² against the serving centroids — the signal that tells an
    * operator when accumulated drift justifies a full retrain.
    *
    * Every mean is DECIMAL(38,6)-exact and the drift fold is the same
    * sequential zip_with square-diff both engines run term-for-term, so
    * the whole train→assign→recompute→drift chain hash-matches the
    * unrolled DuckDB replay. Cells that received no delta vectors
    * recompute the identical mean, so their drift² is exactly 0.0 —
    * pinned in Round7cOpsSpec. */
  def centroidRefresh(spark: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val eAll = embeddings(spark, dir).select(col("vec_id"), col("v"))
    val isDelta = col("vec_id") % 5 === 4 && col("vec_id") >= 8
    val (assignRaw, centRaw) = ivfAssignCentOn(eAll.filter(!isDelta), k, iters)
    // both frames are consumed twice below; uncached, each reuse would
    // re-run the whole Lloyd lineage from the scan
    val assign = assignRaw.select(col("vec_id"), col("cid"), col("v")).cache()
    val cent = centRaw.cache()
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cid"))
    val dAssign = eAll.filter(isDelta).crossJoin(broadcast(cent))
      .withColumn("dist2", expr(
        """aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)),
          |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("v")).cache()
    val allAss = assign.unionByName(dAssign)
    val newCent = allAss
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim")).agg(G.davg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)")
        .as("c2"))
    val nBase = assign.groupBy(col("cid")).agg(count(lit(1)).as("n_base"))
    val nDelta = dAssign.groupBy(col("cid")).agg(count(lit(1)).as("n_delta"))
    nBase.join(nDelta, Seq("cid"), "left")
      .join(cent, "cid").join(newCent, "cid")
      .withColumn("drift2", expr(
        """aggregate(zip_with(c2, c, (x, y) -> (x - y) * (x - y)),
          |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin))
      .select(col("cid"), col("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"), col("drift2"))
      .orderBy(col("cid"))
  }

  /** DuckDB replay of [[centroidRefresh]]: base-only Lloyd rounds (the
    * shared [[ivfCtes]]), delta assignment against the serving centroids,
    * exact mean recompute over base∪delta, and the same drift fold. */
  def centroidRefreshSql(k: Int = 8, iters: Int = 2, dims: Int = 64): String = {
    val last = iters - 1
    s"""WITH eall AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v FROM eall
       |      WHERE NOT (vec_id % 5 = 4 AND vec_id >= 8)),
       |ed AS (SELECT vec_id, v FROM eall
       |       WHERE vec_id % 5 = 4 AND vec_id >= 8),
       |${ivfCtes(k, iters, dims, "")},
       |dd0 AS (
       |  SELECT ed.vec_id, c$last.cid, ed.v,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(0, $dims), i ->
       |        (ed.v[CAST(i+1 AS INT)] - c$last.c[CAST(i+1 AS INT)])
       |      * (ed.v[CAST(i+1 AS INT)] - c$last.c[CAST(i+1 AS INT)]))),
       |      (a, b) -> a + b) AS dist2
       |  FROM ed CROSS JOIN c$last),
       |da AS (SELECT vec_id, cid, v FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist2, cid) AS rn FROM dd0) t
       |  WHERE rn = 1),
       |allass AS (SELECT vec_id, cid, v FROM a$iters
       |           UNION ALL SELECT vec_id, cid, v FROM da),
       |nm AS (
       |  SELECT allass.cid, dd2.i AS dim,
       |    CAST(CAST(SUM(CAST(allass.v[CAST(dd2.i+1 AS INT)] AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |      / COUNT(allass.v[CAST(dd2.i+1 AS INT)]) AS m
       |  FROM allass CROSS JOIN (SELECT unnest(range(0, $dims)) AS i) dd2
       |  GROUP BY allass.cid, dd2.i),
       |cn AS (SELECT cid, list(m ORDER BY dim) AS c2 FROM nm GROUP BY cid),
       |nb AS (SELECT cid, count(*) AS n_base FROM a$iters GROUP BY cid),
       |nd AS (SELECT cid, count(*) AS n_delta FROM da GROUP BY cid)
       |SELECT nb.cid, nb.n_base,
       |  coalesce(nd.n_delta, CAST(0 AS BIGINT)) AS n_delta,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(0, $dims), i ->
       |      (cn.c2[CAST(i+1 AS INT)] - co.c[CAST(i+1 AS INT)])
       |    * (cn.c2[CAST(i+1 AS INT)] - co.c[CAST(i+1 AS INT)]))),
       |    (a, b) -> a + b) AS drift2
       |FROM nb LEFT JOIN nd ON nb.cid = nd.cid
       |JOIN c$last co ON nb.cid = co.cid
       |JOIN cn ON nb.cid = cn.cid
       |ORDER BY nb.cid""".stripMargin
  }

  /** Shared WITH-prefix of the IVF-family oracles ([[ivfBuildSql]],
    * [[semDedupSql]]), GENERATED from (k, iters, dims) like
    * [[pqRoundsSql]]. */
  private def ivfRoundsSql(k: Int, iters: Int, dims: Int): String =
    ivfRoundsSqlK(k.toString, iters, dims)

  /** `kSql` variant: the seed count may be a scalar-subquery expression
    * (the [[autoKSql]] corpus-derived k) — k is structural ONLY in the
    * `vec_id < k` seed predicate, so the generated CTE chain is identical
    * for literal and derived k. */
  private def ivfRoundsSqlK(kSql: String, iters: Int, dims: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${ivfCtesK(kSql, iters, dims, "")}""".stripMargin

  /** CTE list (no WITH header, references a prior `e` CTE) with every CTE
    * name prefixed by `p` — so the composed IVF+PQ oracle (q_y17) can hold
    * both k-means chains in one WITH without name collisions. */
  private def ivfCtes(k: Int, iters: Int, dims: Int, p: String): String = {
    require(k > 0)
    ivfCtesK(k.toString, iters, dims, p)
  }

  private def ivfCtesK(k: String, iters: Int, dims: Int, p: String): String =
    ivfCtesSeeded(k, iters, dims, p, s"vec_id < $k")

  /** [[ivfCtesK]] with an explicit seed predicate — the per-table seeding
    * of [[ivfNearDupsSql]] (table t seeds vec_ids [t·k, (t+1)·k)). */
  private def ivfCtesSeeded(k: String, iters: Int, dims: Int, p: String,
      seedPred: String): String = {
    require(iters > 0 && dims > 0)
    def dist(r: Int): String =
      s"""${p}d$r AS (
         |  SELECT e.vec_id, ${p}c${r - 1}.cid, e.v,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(0, $dims), i ->
         |        (e.v[CAST(i+1 AS INT)] - ${p}c${r - 1}.c[CAST(i+1 AS INT)])
         |      * (e.v[CAST(i+1 AS INT)] - ${p}c${r - 1}.c[CAST(i+1 AS INT)]))),
         |      (a, b) -> a + b) AS dist2
         |  FROM e CROSS JOIN ${p}c${r - 1}),
         |${p}a$r AS (SELECT vec_id, cid, v, dist2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist2, cid) AS rn FROM ${p}d$r) t
         |  WHERE rn = 1)""".stripMargin
    def recenter(r: Int): String =
      s"""${p}m$r AS (
         |  SELECT ${p}a$r.cid, dd.i AS dim,
         |    CAST(CAST(SUM(CAST(${p}a$r.v[CAST(dd.i+1 AS INT)] AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |      / COUNT(${p}a$r.v[CAST(dd.i+1 AS INT)]) AS m
         |  FROM ${p}a$r CROSS JOIN (SELECT unnest(range(0, $dims)) AS i) dd
         |  GROUP BY ${p}a$r.cid, dd.i),
         |${p}c$r AS (SELECT cid, list(m ORDER BY dim) AS c FROM ${p}m$r GROUP BY cid)""".stripMargin
    val rounds = (1 to iters).map { r =>
      if (r < iters) dist(r) + ",\n" + recenter(r) else dist(r)
    }.mkString(",\n")
    s"""${p}c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE $seedPred),
       |$rounds""".stripMargin
  }

  /** Product-quantization subvector assignment: the shared k-means core of
    * [[pqBuild]] and [[pqSearch]]. The 64-d corpus is split into `m`
    * subspaces of 64/m dims; each subspace trains its own K-centroid
    * codebook with deterministic seeding (centroids ← subvectors of
    * vec_id 0..k-1) and a FIXED number of Lloyd rounds, unrolled
    * declaratively exactly like [[ivfBuild]]: assignment = broadcast join
    * of the (m·k)-row codebook against the subvector frame + argmin
    * window; recenter = per-(subspace, cell, dim) exact DECIMAL mean.
    * Returns (final assignment (vec_id, m, cid, dist2), the codebook that
    * produced it). Per round: one pass over the subvectors, one tiny
    * m·k·d-group aggregate, the corpus never shuffles. */
  private val pqMemo = // onEvict: release both checkpoint frames on sweep
    new graft.SessionMemo[(DataFrame, DataFrame)]({ case (a, c) =>
      graft.SessionMemo.unpersistCheckpointed(a)
      graft.SessionMemo.unpersistCheckpointed(c)
    })
  private def pqAssign(spark: SparkSession, dir: String, m: Int, k: Int,
      iters: Int): (DataFrame, DataFrame) =
    // same session-scoped memo as ivfAssignCent: y7/y8/y17 train the
    // identical codebook; build once per corpus snapshot
    pqMemo.getOrBuild(spark, s"$dir#m=$m#k=$k#it=$iters") {
      val (a, c) = pqAssignComputed(spark, dir, m, k, iters)
      (a.localCheckpoint(), c.localCheckpoint())
    }
  private def pqAssignComputed(spark: SparkSession, dir: String, m: Int,
      k: Int, iters: Int): (DataFrame, DataFrame) = {
    val subDim = 64 / m
    val e = embeddings(spark, dir).select(col("vec_id"), col("v"))
    val sub = e.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${m - 1}), mm -> slice(v, CAST(mm * $subDim + 1 AS INT), $subDim))"))
        .as(Seq("m", "sv")))
    var cent = sub.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("c"))
    var assign: DataFrame = spark.emptyDataFrame
    for (round <- 1 to iters) {
      val d = sub.join(broadcast(cent), Seq("m"))
        .withColumn("dist2", expr(
          """aggregate(zip_with(sv, c, (x, y) -> (x - y) * (x - y)),
            |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin))
      // row_number window argmin — see the ivfAssign note: the
      // min(struct) partial-agg alternative measures 3× slower (Stress
      // kmeans_argmin A/B)
      val w = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("dist2"), col("cid"))
      assign = d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("cid"), col("dist2"), col("sv"))
      if (round < iters)
        cent = assign
          .select(col("m"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
          .groupBy(col("m"), col("cid"), col("dim"))
          .agg(G.davg(col("x")).as("mean"))
          .groupBy(col("m"), col("cid"))
          .agg(expr(
            "transform(array_sort(collect_list(struct(dim, mean))), s -> s.mean)")
            .as("c"))
    }
    (assign, cent)
  }

  /** Product-quantization codebook BUILD (q_y7): per-subspace cell sizes
    * and inertia — the training half of the PQ pipeline a 100 TB vector
    * store runs to compress embeddings 8× further than int8 (64 float64
    * dims → m code bytes). Deterministic twin-free: every distance is the
    * same sequential squared-diff fold in both engines and the means are
    * DECIMAL-exact, so the oracle replays the whole build bit-for-bit. */
  def pqBuild(spark: SparkSession, dir: String, m: Int = 8, k: Int = 16,
      iters: Int = 2): DataFrame = {
    val (assign, _) = pqAssign(spark, dir, m, k, iters)
    assign.groupBy(col("m"), col("cid"))
      .agg(count(lit(1)).as("n_vecs"), G.dsum(col("dist2")).as("inertia"))
      .orderBy(col("m"), col("cid"))
  }

  /** PQ asymmetric-distance top-5 search (q_y8): score the corpus CODES
    * against per-query distance tables without touching a single corpus
    * vector at query time — the PQ payoff. The query's subvectors are
    * joined against the broadcast codebook once (m·k rows → the ADC
    * table), then each corpus code row looks its subspace distance up in
    * the broadcast table and the m partial distances sum per (query,
    * vector). Scale shape: the codes frame carries m small ints per
    * vector; the ADC join is broadcast (no corpus shuffle) and the
    * distance sum partial-aggregates map-side because a vector's m code
    * rows are colocated (posexplode of one row). The sum is DECIMAL-exact
    * so the 8-way add is order-free for the oracle. */
  def pqSearch(spark: SparkSession, dir: String, m: Int = 8, k: Int = 16,
      iters: Int = 2, topK: Int = 5): DataFrame = {
    val (assign, cent) = pqAssign(spark, dir, m, k, iters)
    val codes = assign.select(col("vec_id"), col("m"), col("cid"))
    val subDim = 64 / m
    val e = embeddings(spark, dir).select(col("vec_id"), col("v"))
    val qsub = e.filter(col("vec_id") < 10).select(
      col("vec_id").as("query_id"),
      posexplode(expr(
        s"transform(sequence(0, ${m - 1}), mm -> slice(v, CAST(mm * $subDim + 1 AS INT), $subDim))"))
        .as(Seq("m", "qsv")))
    val table = qsub.join(broadcast(cent), Seq("m"))
      .withColumn("qdist2", expr(
        """aggregate(zip_with(qsv, c, (x, y) -> (x - y) * (x - y)),
          |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin))
      .select(col("query_id"), col("m"), col("cid"), col("qdist2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("vec_id"))
    codes.join(broadcast(table), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(G.dsum(col("qdist2")).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id"), col("adist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Shared WITH-prefix of the PQ oracles, GENERATED from (m, k, iters)
    * like [[ivfBuildSql]]: sub (subvector frame), c0 (seed codebook), and
    * per Lloyd round r the distance/argmin CTEs d_r/a_r plus — before a
    * further round — the DECIMAL-mean recenter m_r/c_r. */
  private def pqRoundsSql(m: Int, k: Int, iters: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${pqCtes(m, k, iters, "")}""".stripMargin

  /** Prefixed CTE-list form, mirroring [[ivfCtes]] — the `sub` subvector
    * frame is prefixed too. */
  private def pqCtes(m: Int, k: Int, iters: Int, p: String): String = {
    require(m > 0 && 64 % m == 0 && k > 0 && iters > 0)
    val subDim = 64 / m
    def dist(r: Int): String =
      s"""${p}d$r AS (
         |  SELECT s.vec_id, s.m, ${p}c${r - 1}.cid, s.sv,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(0, $subDim), i ->
         |        (s.sv[CAST(i+1 AS INT)] - ${p}c${r - 1}.c[CAST(i+1 AS INT)])
         |      * (s.sv[CAST(i+1 AS INT)] - ${p}c${r - 1}.c[CAST(i+1 AS INT)]))),
         |      (a, b) -> a + b) AS dist2
         |  FROM ${p}sub s JOIN ${p}c${r - 1} ON s.m = ${p}c${r - 1}.m),
         |${p}a$r AS (SELECT vec_id, m, cid, sv, dist2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY dist2, cid) AS rn FROM ${p}d$r) t
         |  WHERE rn = 1)""".stripMargin
    def recenter(r: Int): String =
      s"""${p}m$r AS (
         |  SELECT ${p}a$r.m, ${p}a$r.cid, dd.i AS dim,
         |    CAST(CAST(SUM(CAST(${p}a$r.sv[CAST(dd.i+1 AS INT)] AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |      / COUNT(${p}a$r.sv[CAST(dd.i+1 AS INT)]) AS mean
         |  FROM ${p}a$r CROSS JOIN (SELECT unnest(range(0, $subDim)) AS i) dd
         |  GROUP BY ${p}a$r.m, ${p}a$r.cid, dd.i),
         |${p}c$r AS (SELECT m, cid, list(mean ORDER BY dim) AS c
         |        FROM ${p}m$r GROUP BY m, cid)""".stripMargin
    val rounds = (1 to iters).map { r =>
      if (r < iters) dist(r) + ",\n" + recenter(r) else dist(r)
    }.mkString(",\n")
    s"""${p}sub AS (
       |  SELECT e.vec_id, mm.m,
       |    list_transform(range(0, $subDim),
       |      i -> e.v[CAST(mm.m * $subDim + i + 1 AS INT)]) AS sv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $m)) AS m) mm),
       |${p}c0 AS (SELECT m, vec_id AS cid, sv AS c FROM ${p}sub WHERE vec_id < $k),
       |$rounds""".stripMargin
  }

  def pqBuildSql(m: Int = 8, k: Int = 16, iters: Int = 2): String =
    s"""${pqRoundsSql(m, k, iters)}
       |SELECT m, cid, count(*) AS n_vecs,
       |  CAST(CAST(SUM(CAST(dist2 AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS inertia
       |FROM a$iters GROUP BY m, cid ORDER BY m, cid""".stripMargin

  def pqSearchSql(m: Int = 8, k: Int = 16, iters: Int = 2,
      topK: Int = 5): String =
    s"""${pqRoundsSql(m, k, iters)},
       |qt AS (
       |  SELECT s.vec_id AS query_id, s.m, cf.cid,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(0, ${64 / m}), i ->
       |        (s.sv[CAST(i+1 AS INT)] - cf.c[CAST(i+1 AS INT)])
       |      * (s.sv[CAST(i+1 AS INT)] - cf.c[CAST(i+1 AS INT)]))),
       |      (a, b) -> a + b) AS qdist2
       |  FROM sub s JOIN c${iters - 1} cf ON s.m = cf.m
       |  WHERE s.vec_id < 10),
       |adc AS (
       |  SELECT qt.query_id, a$iters.vec_id,
       |    CAST(CAST(SUM(CAST(qt.qdist2 AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS adist
       |  FROM a$iters JOIN qt
       |    ON a$iters.m = qt.m AND a$iters.cid = qt.cid
       |  WHERE a$iters.vec_id <> qt.query_id
       |  GROUP BY qt.query_id, a$iters.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, adist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist, vec_id) AS rank
       |  FROM adc)
       |SELECT query_id, rank, vec_id, adist FROM ranked
       |WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate pairs over a bounded window
    * (vec_id < 300 — the verify kernel LSH/IVF candidates feed at scale;
    * embeddings are random so 0.35 yields a thin non-empty tail). */
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).filter(col("vec_id") < 300)
    // numbered repartition of the streamed side (round-11, guide §2.6):
    // the bounded window arrives as one scan split and the O(pairs) dot
    // products serialize onto one task; width follows the session conf.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na")).repartition(parts)
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(G.simFilter(col("sim"), lit(0.35)))
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Int8 scalar quantization round-trip — the embedding-compression step a
    * 100 TB vector store runs before indexing (4× smaller than float32, 8×
    * smaller than float64): per-vector symmetric scale = 127/max|x|,
    * q = floor(x·scale + 0.5), reported with the saturation count and the
    * reconstruction RMSE. Pure projection (scan-speed, shuffle-free); every
    * step is a sequential fold in double precision, so DuckDB's
    * list_transform/list_reduce replays it bit-for-bit — the error metrics
    * hash-match with no rounding slack. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .withColumn("q", graft.functions.VectorExpressions.quant_stats(col("v")))
      .select(col("vec_id"), col("q.max_abs").as("max_abs"),
        col("q.n_sat").as("n_sat"), col("q.rmse").as("rmse"))
      .orderBy(col("vec_id"))

  /** Higher-order-function formulation of [[quantizeInt8]] — CodegenFallback
    * (closure per element per fold), kept as the readable reference;
    * Round3OpsSpec asserts bit-equality with the codegen QuantStats
    * expression (including the all-zero and NaN degenerate vectors), and
    * graft.Stress quantifies the gap at 1 M vectors. */
  private[graft] def quantizeInt8Hof(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .withColumn("max_abs", expr(
        "aggregate(v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))"))
      // LAZY division: under ANSI (Spark 4's default) an eager
      // lit(127.0)/max_abs is projected before the IF guards below run and
      // throws DIVIDE_BY_ZERO on an all-zero vector. CaseWhen evaluates its
      // arms lazily, so the division only happens when max_abs != 0; the
      // NaN arm is never consumed (the guards short-circuit first).
      .withColumn("scale",
        when(col("max_abs") === 0.0, lit(Double.NaN))
          .otherwise(lit(127.0) / col("max_abs")))
      .select(col("vec_id"), col("max_abs"),
        expr("""IF(max_abs = 0.0d, CAST(0 AS BIGINT),
                   CAST(size(filter(v,
                     x -> abs(floor(x * scale + 0.5d)) >= 127)) AS BIGINT))""")
          .as("n_sat"),
        expr("""IF(max_abs = 0.0d, CAST(0.0 AS DOUBLE),
                   sqrt(aggregate(v, CAST(0.0 AS DOUBLE),
                     (s, x) -> s + (x - floor(x * scale + 0.5d) / scale)
                                 * (x - floor(x * scale + 0.5d) / scale))
                   / CAST(size(v) AS DOUBLE)))""").as("rmse"))
      .orderBy(col("vec_id"))

  /** q_y10: ANN quality evaluation — recall of the IVF cell-pruned search
    * (q_y2, top-3) against the brute-force ground truth (q_y1, top-5), per
    * query. The eval harness every approximate index needs before it
    * replaces the exact scan in production: recall is a QUERY, so it runs
    * on every reindex as part of the pipeline, not as offline tooling.
    * Shape: both inputs are already O(queries × k); the left join and
    * per-query aggregate are driver-free and trivially parallel. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val bf = knnBruteForce(spark, dir)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    val ivf = knnIvf(spark, dir).select(col("query_id"), col("vec_id"))
    ivf.join(bf, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall",
        col("n_hits").cast("double") / col("k_returned"))
      .orderBy(col("query_id"))
  }

  val annRecallSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 10),
      |bfs AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_dot_product(e.v, q.qv) /
      |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      |  FROM e, q WHERE e.vec_id <> q.query_id),
      |bf AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |    FROM bfs) WHERE rank <= 5),
      |ivfs AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_dot_product(e.v, q.qv) /
      |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      |  FROM e JOIN q ON e.label = q.qlabel
      |  WHERE e.vec_id <> q.query_id),
      |ivf AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |    FROM ivfs) WHERE rank <= 3)
      |SELECT i.query_id, count(*) AS k_returned,
      |  CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_hits,
      |  CAST(CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
      |       AS BIGINT) AS DOUBLE) / count(*) AS recall
      |FROM ivf i LEFT JOIN bf b
      |  ON i.query_id = b.query_id AND i.vec_id = b.vec_id
      |GROUP BY i.query_id ORDER BY i.query_id""".stripMargin

  val quantizeInt8Sql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (
      |  SELECT vec_id, v,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(v, x -> abs(x))), (a, b) -> greatest(a, b)) AS max_abs
      |  FROM e),
      |s AS (SELECT vec_id, v, max_abs, 127.0 / max_abs AS scale FROM m)
      |SELECT vec_id, max_abs,
      |  CASE WHEN max_abs = 0 THEN CAST(0 AS BIGINT)
      |       ELSE CAST(len(list_filter(v,
      |         x -> abs(floor(x * scale + 0.5)) >= 127)) AS BIGINT)
      |  END AS n_sat,
      |  CASE WHEN max_abs = 0 THEN CAST(0.0 AS DOUBLE)
      |       ELSE sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |         list_transform(v, x -> (x - floor(x * scale + 0.5) / scale)
      |                              * (x - floor(x * scale + 0.5) / scale))),
      |         (a, b) -> a + b) / CAST(len(v) AS DOUBLE))
      |  END AS rmse
      |FROM s ORDER BY vec_id""".stripMargin

  /** q_y13: int8-quantized ANN search with exact rescoring — the standard
    * two-stage memory-compressed retrieval: (1) quantize every vector to
    * int8 codes (per-vector symmetric scale 127/max_abs, round-half-up,
    * the exact y5 codec), (2) rank candidates by the INTEGER dot product
    * of codes rescaled by 1/(scale_c·scale_q) — a 4×-smaller corpus scan
    * than fp32 and exact integer arithmetic (|code| ≤ 127, so the dot
    * fits a double with no rounding → bit-reproducible and
    * oracle-checkable, unlike fp approximations), (3) rescore only the
    * top-20 survivors per query in full precision and emit the top-5.
    *
    * Plan shape: codes computed in ONE corpus pass; queries broadcast;
    * the candidate ranking window carries only (query_id, vec_id, score)
    * — column pruning drops the code arrays before the exchange. The
    * rescore joins the 20·|Q| candidate ids back to the corpus as a
    * BROADCAST join, so full-precision vectors are fetched for candidates
    * only and never cross an exchange. At 100 TB this is the shape that
    * matters: the scan ships int8-sized codes, the shuffle ships scores,
    * and fp32 vectors move only for the O(k·|Q|) winners. */
  def int8Search(spark: SparkSession, dir: String): DataFrame = {
    val base = embeddings(spark, dir)
      .withColumn("max_abs", expr(
        "aggregate(v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))"))
      .filter(col("max_abs") =!= 0.0)
      .withColumn("scale", lit(127.0) / col("max_abs"))
      .withColumn("code",
        expr("transform(v, x -> CAST(floor(x * scale + 0.5D) AS DOUBLE))"))
    val queries = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("scale").as("qscale"),
        col("code").as("qcode"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_approx").desc, col("vec_id"))
    val cand = base.select(col("vec_id"), col("scale"), col("code"))
      .crossJoin(broadcast(queries.select(col("query_id"), col("qscale"),
        col("qcode"))))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim_approx",
        dot(col("code"), col("qcode")) / (col("scale") * col("qscale")))
      .withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= 20)
      .select(col("query_id"), col("vec_id"), col("sim_approx"))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    embeddings(spark, dir).select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(cand), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"), col("qnrm"))),
        "query_id")
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"),
        col("sim_approx"))
      .orderBy(col("query_id"), col("rank"))
  }

  val int8SearchSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |m AS (
      |  SELECT vec_id, v,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(v, x -> abs(x))), (a, b) -> greatest(a, b)) AS max_abs
      |  FROM e),
      |s AS (
      |  SELECT vec_id, v, 127.0 / max_abs AS scale,
      |    list_transform(v, x -> floor(x * (127.0 / max_abs) + 0.5)) AS code
      |  FROM m WHERE max_abs <> 0),
      |q AS (SELECT vec_id AS query_id, v AS qv, scale AS qscale, code AS qcode
      |      FROM s WHERE vec_id < 10),
      |approx AS (
      |  SELECT q.query_id, s.vec_id,
      |    list_dot_product(s.code, q.qcode) / (s.scale * q.qscale) AS sim_approx
      |  FROM s, q WHERE s.vec_id <> q.query_id),
      |cand AS (
      |  SELECT query_id, vec_id, sim_approx FROM (
      |    SELECT query_id, vec_id, sim_approx,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY sim_approx DESC, vec_id) AS crank
      |    FROM approx) WHERE crank <= 20),
      |rescored AS (
      |  SELECT c.query_id, c.vec_id, c.sim_approx,
      |    list_dot_product(e.v, q.qv) /
      |      (sqrt(list_dot_product(e.v, e.v)) *
      |       sqrt(list_dot_product(q.qv, q.qv))) AS sim
      |  FROM cand c JOIN e ON c.vec_id = e.vec_id
      |              JOIN q ON c.query_id = q.query_id)
      |SELECT query_id, rank, vec_id, sim, sim_approx FROM (
      |  SELECT query_id, vec_id, sim, sim_approx,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY sim DESC, vec_id) AS rank
      |  FROM rescored) WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** q_y14: per-cluster mean silhouette over a bounded evaluation sample
    * (vec_id < 500) — the clustering-quality gate for the `label`
    * assignment the IVF/SemDeDup family keys on: a(i) = mean cosine
    * distance to own cluster, b(i) = min over other clusters of the mean
    * distance, s(i) = (b−a)/max(a,b), reported as per-label averages.
    *
    * The evaluation is all-pairs BY DESIGN and therefore bounded to the
    * sample (the x4/x9 scoped-verify contract): silhouette is a quality
    * metric you compute on a few hundred vectors per snapshot, not a
    * corpus pass. Every mean is an exact DECIMAL(38,9) sum over
    * deterministic pairwise distances divided by an exact count, so the
    * whole metric replays bit-for-bit in DuckDB; b(i) is a MIN (no FP
    * accumulation). Sample singletons (label with one member) drop out of
    * the inner own-join on both engines identically. */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val s = embeddings(spark, dir).filter(col("vec_id") < 500)
    // numbered repartition of the streamed side — see embeddingNearDups
    // (round-11): 250k pairwise dots otherwise run on one scan split
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val a = s.select(col("vec_id").as("ida"), col("label").as("la"),
      col("v").as("va"), col("nrm").as("nra")).repartition(parts)
    val b = s.select(col("vec_id").as("idb"), col("label").as("lb"),
      col("v").as("vb"), col("nrm").as("nrb"))
    val perLabel = a.crossJoin(b).filter(col("ida") =!= col("idb"))
      .withColumn("dist",
        lit(1.0) - dot(col("va"), col("vb")) / (col("nra") * col("nrb")))
      .groupBy(col("ida"), col("la"), col("lb"))
      .agg((G.dsum(col("dist"), 9) / count(lit(1))).as("mdist"))
    val own = perLabel.filter(col("la") === col("lb"))
      .select(col("ida"), col("la"), col("mdist").as("a_i"))
    val other = perLabel.filter(col("la") =!= col("lb"))
      .groupBy(col("ida")).agg(min(col("mdist")).as("b_i"))
    own.join(other, "ida")
      .withColumn("s",
        (col("b_i") - col("a_i")) / greatest(col("a_i"), col("b_i")))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (G.dsum(col("s"), 9) / count(lit(1))).as("avg_sil"))
      .orderBy(col("label"))
  }

  val silhouetteSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
      |           FROM embeddings WHERE vec_id < 500),
      |m AS (SELECT vec_id, label, v,
      |        sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |d AS (
      |  SELECT a.vec_id AS ida, a.label AS la, b.label AS lb,
      |    CAST(1.0 AS DOUBLE) -
      |      list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS dist
      |  FROM m a JOIN m b ON a.vec_id <> b.vec_id),
      |perlabel AS (
      |  SELECT ida, la, lb,
      |    CAST(CAST(SUM(CAST(dist AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) / count(*) AS mdist
      |  FROM d GROUP BY ida, la, lb),
      |own AS (SELECT ida, la, mdist AS a_i FROM perlabel WHERE la = lb),
      |other AS (SELECT ida, min(mdist) AS b_i FROM perlabel
      |          WHERE la <> lb GROUP BY ida),
      |sil AS (
      |  SELECT o.la, (t.b_i - o.a_i) / greatest(o.a_i, t.b_i) AS s
      |  FROM own o JOIN other t USING (ida))
      |SELECT la AS label, count(*) AS n_vecs,
      |  CAST(CAST(SUM(CAST(s AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_sil
      |FROM sil GROUP BY la ORDER BY label""".stripMargin

  val embeddingNearDupsSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |           WHERE vec_id < 300)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
      |FROM e a, e b
      |WHERE a.vec_id < b.vec_id
      |  AND list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
      |ORDER BY id_a, id_b""".stripMargin

  /** q_y12: embedding-space COVERAGE evaluation — how well does a selected
    * subset represent the corpus? For every corpus vector, its max cosine
    * similarity to the deterministic selection (vec_id % 37 == 0 — in
    * production the curated/coreset output, e.g. y11's MMR picks), then a
    * 0.05-wide-bin histogram of those maxima. The facility-location
    * objective data-selection methods optimize (Σ max-sim), reported
    * per-bin with a DECIMAL-exact sum so the oracle matches bit-for-bit.
    * Selection members cover themselves at sim 1.0 by construction.
    *
    * Scale shape: the selection is broadcast (it is the SMALL curated set
    * by definition); one corpus pass computes |S| dots per vector and the
    * per-vector max partial-aggregates map-side, so the only keyed
    * exchange carries (vec_id, max) — O(corpus) rows. The bin agg is
    * O(bins). For selections too big to broadcast, the y2/y4 IVF/LSH
    * pruning applies unchanged — max-sim only needs the best candidate. */
  def coverage(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embeddings(spark, dir)
    val sel = embeddings(spark, dir).filter(col("vec_id") % 37 === 0)
      .select(col("v").as("sv"), col("nrm").as("snrm"))
    val best = corpus.crossJoin(broadcast(sel))
      .withColumn("sim", dot(col("v"), col("sv")) / (col("nrm") * col("snrm")))
      .groupBy(col("vec_id"))
      .agg(max(col("sim")).as("max_sim"))
    best
      .groupBy(floor(col("max_sim") * 20).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_vectors"),
        G.dsum(col("max_sim"), 12).as("sum_max_sim"))
      .orderBy(col("bin"))
  }

  val coverageSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT v AS sv FROM e WHERE vec_id % 37 = 0),
      |best AS (
      |  SELECT e.vec_id, max(list_dot_product(e.v, s.sv) /
      |    (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.sv, s.sv))))
      |    AS max_sim
      |  FROM e, s GROUP BY e.vec_id)
      |SELECT CAST(floor(max_sim * 20) AS BIGINT) AS bin,
      |  count(*) AS n_vectors,
      |  CAST(CAST(SUM(CAST(max_sim AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sum_max_sim
      |FROM best GROUP BY 1 ORDER BY bin""".stripMargin

  /** q_y17: COMPOSED IVF+PQ search — the full FAISS-style index shape a
    * 100 TB vector store actually deploys: (1) route each query to its
    * nearest coarse cell through the SAME trained centroids that routed
    * the corpus (the y15 invariant), (2) ADC-score ONLY that cell's
    * vectors from their 8-byte PQ codes against the query's broadcast
    * distance table — at query time no corpus vector is touched, (3)
    * exact-cosine rescore of the top-20 shortlist via a keyed join-back
    * to full precision, top-5 out. IVF bounds the scan fraction
    * (1/|cells|), PQ bounds the bytes per scanned vector (m codes), the
    * rescore bounds the approximation error to the shortlist — three
    * independent knobs, each already oracle-checked alone (y2/y6, y7/y8,
    * y13's rescore move), composed here end-to-end.
    *
    * Scale shape: both trainings are the unrolled Lloyd rounds; at query
    * time the only corpus-sized work is one broadcast-keyed join on cid
    * (candidates) + one keyed code lookup — no corpus shuffle, no
    * full-precision read outside the O(k·Q) winners. The whole pipeline
    * replays as one WITH chain in DuckDB (both k-means chains prefixed),
    * so the hash compare covers training AND serving together. */
  def ivfPqSearch(spark: SparkSession, dir: String, shortlist: Int = 20,
      topK: Int = 5): DataFrame = {
    val (assign, cent) = ivfAssignCent(spark, dir, 8, 2)
    val (pqA, pqCent) = pqAssign(spark, dir, 8, 16, 2)
    val codes = pqA.select(col("vec_id"), col("m"), col("cid"))
    val e = embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val fold =
      """aggregate(zip_with(%s, c, (x, y) -> (x - y) * (x - y)),
        |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qcdist2"), col("cid"))
    val qroute = queries.crossJoin(broadcast(cent))
      .withColumn("qcdist2", expr(fold.format("qv")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") === 1)
      .select(col("query_id"), col("cid"))
    val cand = assign.select(col("vec_id"), col("cid"))
      .join(broadcast(qroute), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val qsub = queries.select(col("query_id"),
      posexplode(expr(
        "transform(sequence(0, 7), mm -> slice(qv, CAST(mm * 8 + 1 AS INT), 8))"))
        .as(Seq("m", "qsv")))
    val table = qsub.join(broadcast(pqCent), Seq("m"))
      .withColumn("qdist2", expr(fold.format("qsv")))
      .select(col("query_id"), col("m"), col("cid"), col("qdist2"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("vec_id"))
    val short = cand.join(codes, "vec_id")
      .join(broadcast(table), Seq("query_id", "m", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(G.dsum(col("qdist2")).as("adist"))
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    short.join(e.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .join(broadcast(queries), "query_id")
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id"), col("adist"),
        col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  def ivfPqSearchSql(shortlist: Int = 20, topK: Int = 5): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${ivfCtes(8, 2, 64, "i")},
       |${pqCtes(8, 16, 2, "p")},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |qd AS (
       |  SELECT q.query_id, c.cid,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(0, 64), i ->
       |        (q.qv[CAST(i+1 AS INT)] - c.c[CAST(i+1 AS INT)])
       |      * (q.qv[CAST(i+1 AS INT)] - c.c[CAST(i+1 AS INT)]))),
       |      (a, b) -> a + b) AS qcdist2
       |  FROM q CROSS JOIN ic1 c),
       |qroute AS (SELECT query_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY qcdist2, cid) AS rn FROM qd) t WHERE rn = 1),
       |cand AS (
       |  SELECT r.query_id, a.vec_id FROM qroute r JOIN ia2 a
       |  ON a.cid = r.cid WHERE a.vec_id <> r.query_id),
       |qsub AS (
       |  SELECT q.query_id, mm.m,
       |    list_transform(range(0, 8),
       |      i -> q.qv[CAST(mm.m * 8 + i + 1 AS INT)]) AS qsv
       |  FROM q CROSS JOIN (SELECT unnest(range(0, 8)) AS m) mm),
       |qt AS (
       |  SELECT qs.query_id, qs.m, pc1.cid,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(0, 8), i ->
       |        (qs.qsv[CAST(i+1 AS INT)] - pc1.c[CAST(i+1 AS INT)])
       |      * (qs.qsv[CAST(i+1 AS INT)] - pc1.c[CAST(i+1 AS INT)]))),
       |      (a, b) -> a + b) AS qdist2
       |  FROM qsub qs JOIN pc1 ON qs.m = pc1.m),
       |adc AS (
       |  SELECT c.query_id, c.vec_id,
       |    CAST(CAST(SUM(CAST(qt.qdist2 AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS adist
       |  FROM cand c JOIN pa2 k ON c.vec_id = k.vec_id
       |              JOIN qt ON qt.query_id = c.query_id
       |                     AND qt.m = k.m AND qt.cid = k.cid
       |  GROUP BY c.query_id, c.vec_id),
       |short AS (SELECT query_id, vec_id, adist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist, vec_id) AS rn FROM adc) t WHERE rn <= $shortlist),
       |res AS (
       |  SELECT s.query_id, s.vec_id, s.adist,
       |    list_dot_product(ev.v, q.qv) /
       |      (sqrt(list_dot_product(ev.v, ev.v)) *
       |       sqrt(list_dot_product(q.qv, q.qv))) AS sim
       |  FROM short s JOIN e ev ON s.vec_id = ev.vec_id
       |               JOIN q ON s.query_id = q.query_id)
       |SELECT query_id, rank, vec_id, adist, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, vec_id) AS rank FROM res) t
       |WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** q_y16: dominant principal direction of the embedding set by POWER
    * ITERATION — 3 unrolled rounds of v ← normalize(Xᵀ(Xv)) against the
    * uncentered Gram matrix, the covariance-free formulation (the Gram
    * matrix itself, d×d, is never materialized; no d×d shuffle exists in
    * the plan at any d). The whitening/compression primitive behind
    * embedding-quality checks ("is one direction eating the space?" —
    * anisotropy is THE classic contrastive-embedding failure mode) and the
    * first step of PCA-style dimensionality reduction of a vector corpus.
    *
    * Per round, ONE corpus pass: the current direction broadcasts as a
    * 64-double literal, each row computes its projection dt = x·v with the
    * codegen'd sequential fold (bit-identical to DuckDB's
    * list_dot_product — the y1 result), then posexplode + a 64-group
    * hash-agg with map-side partials accumulates wⱼ = Σᵢ xᵢⱼ·dtᵢ in
    * FIXED-POINT micro-units — trunc((val·dt)·10¹²) to LONG, summed
    * exactly through DECIMAL(38,0) (the g7 pattern). Fixed-point, not a
    * DECIMAL(38,12) cast, because the 10× rehearsal caught the cast class
    * diverging: Spark rounds double→decimal through the value's shortest
    * decimal string while DuckDB rounds natively, and at 1.28 M
    * terms/round one boundary term is statistically certain. The IEEE
    * product and toward-zero trunc leave no rounding-mode freedom, and
    * DECIMAL(38,0)→DOUBLE is a single correctly-rounded conversion on
    * both engines (no /10^s double-rounding). The O(d) result folds back
    * to the driver for the next round — the t16-GD pattern: corpus → d
    * scalars per round, never a corpus shuffle. Normalization divides by
    * √(Σwⱼ²) in the same micro-units; sqrt is correctly rounded on both
    * engines (the c19 lesson), so all three rounds replay bit-exact as
    * unrolled CTEs at any corpus size.
    *
    * At 100 TB: 3 scans of the (cached) vector column, each exchanging
    * only d·partitions decimal partials; driver state 64 doubles. */
  def powerIteration(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val e = G.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    powerIterVecs(e, 64, 3)
  }

  /** Round kernel on any (vec_id, v: array<double>) frame — shared by the
    * query and specs (which drive planted vector sets and other round
    * counts through it). */
  private[graft] def powerIterVecs(e: DataFrame, d: Int,
      rounds: Int): DataFrame = {
    val spark = e.sparkSession
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    var v: Array[Double] = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to rounds) {
      val w = powerRound(e, v)
      val collected = w.as[(Long, Double)].collect().sortBy(_._1).map(_._2)
      // fixed-point micro-units (the g7 lesson): trunc(x·10¹²) is
      // engine-identical by construction — the IEEE product and the
      // toward-zero trunc have no rounding-mode freedom — where a
      // double→DECIMAL cast replays only as "whatever rounding THIS
      // engine's cast applies" (the 10× rehearsal caught a 1-term
      // two-step-rounding divergence). Σ over d=64 squares ≤ 64·2e15,
      // exact in Long.
      // guard the fixed-point range: scala (d).toLong SATURATES at
      // Long.MaxValue where DuckDB's trunc→BIGINT cast errors — a silent
      // saturation would replay as a cross-engine mismatch (or worse, a
      // silently wrong λ). |w| stays O(1) on unit-norm inputs; this fires
      // only if a caller feeds unnormalized vectors far outside the
      // operator's contract.
      val norm2 = collected.map { x =>
        val t = x * x * 1e12
        require(t < Long.MaxValue.toDouble,
          s"power-iteration norm term overflows fixed-point range: w=$x")
        t.toLong
      }.sum
      lambda = math.sqrt(norm2.toDouble / 1e12)
      v = collected.map(_ / lambda)
    }
    spark.createDataset(v.toIndexedSeq.zipWithIndex
        .map { case (wj, j) => (j.toLong, wj, lambda) })
      .toDF("dim", "weight", "lambda")
      .orderBy(col("dim"))
  }

  /** One power round's distributed piece: wⱼ = Σᵢ xᵢⱼ·(xᵢ·v) as a (dim →
    * decimal-exact sum) frame. Factored so the plan-shape spec can pin it:
    * one hash exchange on dim, partial_sum map-side, nothing else. */
  private[graft] def powerRound(e: DataFrame, v: Array[Double]): DataFrame = {
    val vlit = array(v.toIndexedSeq.map(lit): _*)
    // per-term fixed-point: trunc((val·dt)·10¹²) to LONG (toward zero,
    // engine-identical), summed exactly through DECIMAL(38,0) — a plain
    // long sum could overflow on a positive run (terms reach ±10¹⁵),
    // and DECIMAL(38,0)→DOUBLE is a single correctly-rounded conversion
    // on both engines (scale 0 skips the /10^s division whose double
    // rounding diverges once the unscaled sum tops 2⁵³)
    e.withColumn("dt", dot(col("v"), vlit))
      .select(posexplode(col("v")).as(Seq("dim", "val")), col("dt"))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg((sum((col("val") * col("dt") * lit(1e12)).cast("long")
          .cast("decimal(38,0)"))
        .cast("double") / lit(1e12)).as("w"))
  }

  val powerIterationSql: String = {
    // DuckDB sums BIGINTs into HUGEINT; HUGEINT→DOUBLE is not guaranteed
    // single-rounded once |sum| > 2^63 (and the norm sum already tops 2^53),
    // so both aggregate conversions route through the fleet-wide VARCHAR
    // bridge (strtod is correctly rounded, matching the JVM's
    // DECIMAL(38,0)→double conversion at every magnitude)
    def round(prevArr: String, w: String, n: String, vv: String,
        arr: String): String =
      s"""$w AS (
         |  SELECT x.dim,
         |    CAST(CAST(SUM(CAST(trunc(x.val * p.dt * 1000000000000.0) AS BIGINT))
         |      AS VARCHAR) AS DOUBLE) / 1000000000000.0 AS w
         |  FROM x JOIN (
         |    SELECT vec_id, list_dot_product(v, $prevArr) AS dt FROM e) p
         |  ON x.vec_id = p.vec_id
         |  GROUP BY x.dim),
         |$n AS (
         |  SELECT sqrt(CAST(CAST(SUM(CAST(trunc(w * w * 1000000000000.0) AS BIGINT))
         |      AS VARCHAR) AS DOUBLE) / 1000000000000.0)
         |    AS n FROM $w),
         |$vv AS (SELECT dim, w / (SELECT n FROM $n) AS vv FROM $w),
         |$arr AS (SELECT list(vv ORDER BY dim) AS arr FROM $vv)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |x AS (SELECT vec_id, unnest(generate_series(0, 63)) AS dim,
       |             unnest(v) AS val FROM e),
       |${round("list_transform(range(64), i -> CAST(0.125 AS DOUBLE))",
                "w1", "n1", "v1", "a1")},
       |${round("(SELECT arr FROM a1)", "w2", "n2", "v2", "a2")},
       |${round("(SELECT arr FROM a2)", "w3", "n3", "v3", "a3")}
       |SELECT dim, vv AS weight, (SELECT n FROM n3) AS lambda
       |FROM v3 ORDER BY dim""".stripMargin
  }

  /** q_y21: k-means‖ INITIALIZATION (Bahmani et al., "Scalable k-means++")
    * — the seeding pass that makes billion-vector clustering tractable:
    * k-means++ needs k SEQUENTIAL corpus passes (one per center, each
    * dependent on the last); k-means‖ replaces them with `rounds` passes
    * that each OVERSAMPLE ~l centers in parallel with probability
    * min(1, l·d²(x)/φ), then reduces the small candidate set by weight.
    * This is the init that feeds the y6 IVF build (which seeds
    * deterministically by id — fine for an oracle, poor for cluster
    * quality) and every FAISS-style index train at scale.
    *
    * Determinism (what makes a RANDOMIZED algorithm hash-checkable): the
    * coin flip for x is a uniform-hash threshold test — the c1/c11 move,
    * content hash in place of rand(): the first 8 md5 hex digits of the
    * vector id (zero-padded to 9) compared against `%09x` of
    * ⌊2³²·l·d²(x)/φ⌋ clamped to 2³² — lexicographic order on zero-padded
    * hex IS numeric order, so the test is exactly
    * `u < min(1, l·d²/φ)` with u uniform on 32 bits, in both engines.
    * (A poly_hash‰ variant measured badly non-uniform on short id
    * strings — 2% of the corpus sampled instead of ~l per round.)
    * d² is the term-for-term sequential squared-diff fold shared with
    * y6; φ is a DECIMAL(38,6) sum. Every stage replays in DuckDB.
    *
    * Scale shape per round: centers stay a broadcast-sized frame (≤ 1+r·l
    * rows), so cost = ONE corpus pass (crossJoin broadcast + per-vector
    * min) + a scalar aggregate — no corpus shuffle, no sequential
    * dependency chain beyond the `rounds` knob. The final weighting is
    * one more broadcast pass + an O(candidates) window. */
  def kmeansParallelInit(spark: SparkSession, dir: String, l: Int = 4,
      rounds: Int = 2, k: Int = 8): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), col("v"))
    val d2expr = expr(
      """aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)),
        |          CAST(0.0 AS DOUBLE), (s, t) -> s + t)""".stripMargin)
    var cent = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("cid"), col("v").as("c"),
        lit(0L).as("round"))
    for (r <- 1 to rounds) {
      val d2 = e.crossJoin(broadcast(cent.select(col("c"))))
        .withColumn("dist2", d2expr)
        .groupBy(col("vec_id")).agg(min(col("dist2")).as("d2"))
      val phi = d2.agg(G.dsum(col("d2")).as("phi"))
      val sampled = e.join(d2, "vec_id").crossJoin(broadcast(phi))
        .filter(
          concat(lit("0"), substring(md5(col("vec_id").cast("string")), 1, 8))
            < format_string("%09x",
                least(floor(lit(4294967296.0 * l) * col("d2") / col("phi")),
                  lit(4294967296.0)).cast("long")))
        .select(col("vec_id").as("cid"), col("v").as("c"),
          lit(r.toLong).as("round"))
      cent = cent.unionByName(sampled)
    }
    val cents = cent.cache()
    val assign = e.crossJoin(broadcast(cents.select(col("cid"), col("c"))))
      .withColumn("dist2", d2expr)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("dist2"), col("cid"))))
      .filter(col("rn") === 1)
    val weights = assign.groupBy(col("cid"))
      .agg(count(lit(1)).as("weight"))
    cents.join(weights, Seq("cid"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(0L)))
      .withColumn("kept", row_number().over(
        Window.orderBy(col("weight").desc, col("cid"))) <= k)
      .select(col("cid"), col("round"), col("weight"), col("kept"))
      .orderBy(col("cid"))
  }

  /** DuckDB replay of [[kmeansParallelInit]], generated from the same
    * (l, rounds, k, dims). */
  def kmeansParallelInitSql(l: Int = 4, rounds: Int = 2, k: Int = 8,
      dims: Int = 64): String = {
    val coin =
      s"""'0' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) <
         |  printf('%09x', CAST(least(floor(${4294967296.0} * L * d2 / phi),
         |                            4294967296.0) AS BIGINT))""".stripMargin
    def d2fold(cRel: String): String =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform(range(0, $dims), i ->
         |    (e.v[CAST(i+1 AS INT)] - $cRel.c[CAST(i+1 AS INT)])
         |  * (e.v[CAST(i+1 AS INT)] - $cRel.c[CAST(i+1 AS INT)]))),
         |  (a, b) -> a + b)""".stripMargin
    def round(r: Int): String =
      s"""d$r AS (
         |  SELECT e.vec_id, min(${d2fold(s"g${r - 1}")}) AS d2
         |  FROM e CROSS JOIN g${r - 1} GROUP BY e.vec_id),
         |p$r AS (SELECT CAST(CAST(SUM(CAST(d2 AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |          AS phi FROM d$r),
         |s$r AS (
         |  SELECT e.vec_id AS cid, e.v AS c, CAST($r AS BIGINT) AS round
         |  FROM e JOIN d$r USING (vec_id) CROSS JOIN p$r
         |  WHERE ${coin.replace("L *", s"$l *")}),
         |g$r AS (SELECT * FROM g${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |g0 AS (SELECT vec_id AS cid, v AS c, CAST(0 AS BIGINT) AS round
       |       FROM e WHERE vec_id = 0),
       |${(1 to rounds).map(round).mkString(",\n")},
       |asg AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, g$rounds.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2fold(s"g$rounds")}, g$rounds.cid) AS rn
       |    FROM e CROSS JOIN g$rounds) t
       |  WHERE rn = 1),
       |w AS (SELECT cid, count(*) AS weight FROM asg GROUP BY cid),
       |cand AS (
       |  SELECT g.cid, g.round, coalesce(w.weight, 0) AS weight
       |  FROM g$rounds g LEFT JOIN w USING (cid))
       |SELECT cid, round, CAST(weight AS BIGINT) AS weight,
       |  row_number() OVER (ORDER BY weight DESC, cid) <= $k AS kept
       |FROM cand ORDER BY cid""".stripMargin
  }

  /** q_y22: MATRYOSHKA truncation recall — recall@5 of cosine search over
    * only the FIRST d dimensions, d ∈ {8, 16, 32, 64}, against the
    * full-dimension y1 truth. The newest point on the compression ladder
    * (y13 int8 = 8× smaller values, y19 binary = 1 bit/dim, y17 PQ =
    * codebook bytes, and now FEWER DIMS — the MRL/Matryoshka serving
    * trick: embed once, search a prefix, rescore later). The table says
    * how much of the ranking signal lives in the leading dims, which is
    * the read a deployment does before switching its ANN index to prefix
    * vectors at ¼ the memory bandwidth.
    *
    * Exactness: per-d cosine is the same sequential fold over the SLICED
    * arrays on both engines; hits vs the y1 truth are integer counts and
    * recall one division. Scale shape per d: broadcast queries, ONE
    * corpus pass, per-query top-5 window — y1's plan with a narrower
    * vector, which is the point. */
  def matryoshkaRecall(spark: SparkSession, dir: String,
      ds: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    val corpus = embeddings(spark, dir).select(col("vec_id"), col("v")).cache()
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val truth = knnBruteForce(spark, dir)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    ds.map { d =>
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      val top = corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("pv", slice(col("v"), 1, d))
        .withColumn("pq", slice(col("qv"), 1, d))
        .withColumn("sim", dot(col("pv"), col("pq")) /
          (sqrt(dot(col("pv"), col("pv"))) * sqrt(dot(col("pq"), col("pq")))))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id"))
      top.join(truth, Seq("query_id", "vec_id"), "left")
        .agg(count(lit(1)).as("k_total"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(lit(d.toLong).as("dims"), col("n_hits"), col("k_total"),
          (col("n_hits").cast("double") / col("k_total")).as("recall"))
    }.reduce(_.unionByName(_)).orderBy(col("dims"))
  }

  def matryoshkaRecallSql(ds: Seq[Int] = Seq(8, 16, 32, 64)): String = {
    def one(d: Int): String =
      s"""SELECT CAST($d AS BIGINT) AS dims,
         |  CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_hits,
         |  count(*) AS k_total
         |FROM (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, e.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        list_dot_product(e.v[1:$d], q.qv[1:$d]) /
         |          (sqrt(list_dot_product(e.v[1:$d], e.v[1:$d]))
         |           * sqrt(list_dot_product(q.qv[1:$d], q.qv[1:$d]))) DESC,
         |        e.vec_id) AS rank
         |    FROM e, q WHERE e.vec_id <> q.query_id) r
         |  WHERE rank <= 5) s
         |LEFT JOIN truth t
         |  ON t.query_id = s.query_id AND t.vec_id = s.vec_id""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        list_dot_product(e.v, q.qv) /
       |          (sqrt(list_dot_product(e.v, e.v))
       |           * sqrt(list_dot_product(q.qv, q.qv))) DESC,
       |        e.vec_id) AS rank
       |    FROM e, q WHERE e.vec_id <> q.query_id) r
       |  WHERE rank <= 5),
       |u AS (
       |${ds.map(one).mkString("\nUNION ALL\n")})
       |SELECT dims, n_hits, k_total,
       |  CAST(n_hits AS DOUBLE) / k_total AS recall
       |FROM u ORDER BY dims""".stripMargin
  }

  /** Embedding-space outlier detection for corpus curation: diagonal
    * Mahalanobis (= per-dimension standardized Euclidean) distance of every
    * vector to the corpus distribution, top-K most out-of-distribution
    * returned for pruning/inspection. This is the standard OOD/noise-prune
    * signal in embedding-curated training pipelines (the per-cluster
    * variant of SemDeDup's outlier sweep; full-covariance Mahalanobis needs
    * a d×d inverse — diagonal is what's used at corpus scale).
    *
    * Cross-engine exactness (the g7 fixed-point rule, SCALE.md): per-dim
    * moment sums are FLOOR(x·1e9) / FLOOR(x²·1e9) BIGINT micro-units —
    * floor reads the exact binary double (no shortest-string round-trip,
    * no double→DECIMAL cast), and integer sums are order-free — then ONE
    * double division recovers μ and E[x²]. The per-vector score folds
    * dims ascending (Spark `aggregate` HOF ≡ DuckDB `list_reduce`), so
    * every double op sees identical operands in identical order.
    *
    * Scale shape: the moment pass is posexplode → (dim) partial→final agg —
    * the shuffle carries 64·partitions pre-aggregated rows, never vectors;
    * the 64-row stats frame broadcasts back as two aligned arrays; scoring
    * is a scan-speed projection and the top-K is TakeOrderedAndProject.
    * At 100 TB the BIGINT moment sums need a 128-bit accumulator (DECIMAL
    * sum of the micro-units) — same plan, one type widening. */
  def oodMahalanobis(spark: SparkSession, dir: String, k: Int = 50)
      : DataFrame = {
    val e = embeddings(spark, dir)
    val stats = e
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(x * 1e9) AS BIGINT)")).as("sx"),
        sum(expr("CAST(floor(x * x * 1e9) AS BIGINT)")).as("sxx"))
      .select(col("dim"),
        (col("sx").cast("double") / col("n") / lit(1e9)).as("mu"),
        ((col("sxx").cast("double") / col("n") / lit(1e9))).as("m2"))
      .withColumn("s2", col("m2") - col("mu") * col("mu"))
      .agg(sort_array(collect_list(struct(col("dim"), col("mu"), col("s2"))))
        .as("st"))
      .select(expr("transform(st, s -> s.mu)").as("mus"),
        expr("transform(st, s -> s.s2)").as("s2s"))
    e.crossJoin(broadcast(stats))
      .withColumn("score", expr(
        """aggregate(sequence(0, size(v) - 1), CAST(0.0 AS DOUBLE),
          |  (a, d) -> a + (v[d] - mus[d]) * (v[d] - mus[d])
          |              / (s2s[d] + 1e-9))""".stripMargin))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
      .withColumn("rank",
        expr("row_number() OVER (ORDER BY score DESC, vec_id)"))
      .select(col("rank"), col("vec_id"), col("label"), col("score"))
      .orderBy(col("rank"))
  }

  val oodMahalanobisSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
      |           FROM embeddings),
      |x AS (SELECT vec_id, d, v[d + 1] AS x
      |      FROM e, unnest(range(0, len(v))) AS t(d)),
      |stats AS (
      |  SELECT d, count(*) AS n,
      |    CAST(sum(CAST(floor(x * 1e9) AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(sum(CAST(floor(x * x * 1e9) AS BIGINT)) AS BIGINT) AS sxx
      |  FROM x GROUP BY d),
      |ms AS (
      |  SELECT d, CAST(sx AS DOUBLE) / n / 1e9 AS mu,
      |    CAST(sxx AS DOUBLE) / n / 1e9
      |      - (CAST(sx AS DOUBLE) / n / 1e9) * (CAST(sx AS DOUBLE) / n / 1e9)
      |      AS s2
      |  FROM stats),
      |arrs AS (
      |  SELECT list(mu ORDER BY d) AS mus, list(s2 ORDER BY d) AS s2s
      |  FROM ms),
      |scored AS (
      |  SELECT vec_id, label,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(0, len(v)),
      |        d -> (v[d + 1] - mus[d + 1]) * (v[d + 1] - mus[d + 1])
      |             / (s2s[d + 1] + 1e-9))),
      |      (a, b) -> a + b) AS score
      |  FROM e, arrs),
      |top AS (SELECT * FROM scored ORDER BY score DESC, vec_id LIMIT 50)
      |SELECT row_number() OVER (ORDER BY score DESC, vec_id) AS rank,
      |  vec_id, label, score
      |FROM top ORDER BY rank""".stripMargin

  /** q_y24: CONTRASTIVE PAIR MINING — for each anchor, the top-3 in-label
    * neighbors (positives) and the top-3 nearest OUT-of-label neighbors
    * (hard negatives, the pairs that actually move a contrastive loss:
    * maximally similar yet differently labeled). This is the batch-mining
    * pass behind every embedding-model fine-tune over curated data —
    * exactly the corpus-scan shape of y1, reused: ONE pass over the corpus
    * with the 10 anchors broadcast, scored by the codegen'd VectorDot,
    * then one (anchor, kind)-keyed top-k window — positives and negatives
    * fall out of the SAME scan (kind is a projection on the label match),
    * no second pass, no self-join. At 100 TB: cost identical to y1
    * brute-force kNN; mining M anchors batches into ⌈M/batch⌉ scans the
    * t11 way. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embeddings(spark, dir)
    val anchors = embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("anchor_id"), col("label").as("alabel"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("anchor_id"), col("kind"))
      .orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("anchor_id"))
      .withColumn("kind",
        when(col("label") === col("alabel"), lit("pos")).otherwise(lit("neg")))
      .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("anchor_id"), col("kind"), col("rank"), col("vec_id"),
        col("label"), col("sim"))
      .orderBy(col("anchor_id"), col("kind"), col("rank"))
  }

  val hardNegativesSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |a AS (SELECT vec_id AS anchor_id, label AS alabel, v AS qv
      |      FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT a.anchor_id,
      |    CASE WHEN e.label = a.alabel THEN 'pos' ELSE 'neg' END AS kind,
      |    e.vec_id, e.label,
      |    list_dot_product(e.v, a.qv) /
      |      (sqrt(list_dot_product(e.v, e.v)) *
      |       sqrt(list_dot_product(a.qv, a.qv))) AS sim
      |  FROM e, a WHERE e.vec_id <> a.anchor_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY anchor_id, kind
      |    ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT anchor_id, kind, rank, vec_id, label, sim FROM ranked
      |WHERE rank <= 3 ORDER BY anchor_id, kind, rank""".stripMargin
}
