package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY on a worker pool (Spark schedules jobs from
  * multiple threads against one session; every query here is independent —
  * per-operator-unique temp-view names, per-call temp dirs for streaming
  * replays). Serial execution of the full 140-query surface outgrew the
  * driver's verify window in round 6 (99/142 dumped before the cap);
  * running ~10 wide packs the 32 cores and cuts wall-clock ~6×. Known-slow
  * queries are submitted first so the tail of the schedule stays short.
  */
object Verify {
  // longest-first scheduling hints, from bench_history (sf0.1 idle times);
  // anything not listed is "fast" and fills the tail
  private val slowFirst = Seq(
    // memo payers lead: x3c builds the shared near-dup pairs
    // (c10/c15/c16/c22/c27/m10 reuse), x6 the suffix-array ranks (x7
    // reuses), g1 the co-purchase edges (g2..g13 reuse) — starting them
    // first converts the fan-out recomputes into one build each
    "q_x3c_simhash_neardup", "q_x6_suffix_array", "q_g1_triangles",
    "q_stream_late", "q_x12_simjoin", "q_c29_threshold_sweep",
    "q_stream_scd2", "q_stream_backfill", "q_stream_resume",
    "q_x7_repeated_span", "q_stream_sliding", "q_stream_union",
    "q_stream_centroids", "q_stream_dedup", "q_stream_ivm",
    "q_stream_profile", "q_stream_latency", "q_g6_hits",
    "q_stream_outer", "q_stream_ohlc", "q_stream_w1",
    "q_stream_sessions", "q_g2_also_bought", "q_c15_pagerank",
    "q_c27_incremental_clusters", "q_g3_label_prop", "q_c16_canonical",
    "q_stream_tws", "q_stream_a1", "q_x8_dedup_cut", "q_st6_bucketed_join",
    "q_y4_lsh_neardup", "q_stream_join", "q_t15_bpe_apply",
    "q_t14_bpe_train", "q_stream_merge", "q_stream_waterfill",
    "q_stream_raw")
  def main(args: Array[String]): Unit = {
    // fresh per-invocation artifact root (same contract as Bench): the
    // oracle dump always computes from the parquet inputs, never from
    // indexes a previous run persisted
    ArtifactStore.freshRootForThisInvocation()
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (builder-local only; the driver passes two): run a
    // comma-separated subset — single-query oracle checks without the
    // full 140-query dump
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    // default to the box's full core count, not Bench's 4: verify is a
    // wall-clock race against the driver's window, and 10 concurrent
    // queries on local[4] re-create the round-6 truncation risk
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // small-shuffle parallelism floor — see Bench.scala (round-11)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "64k"))
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is written BEFORE any query runs: it is the key the
    // driver needs to score whatever parquet dumps exist. Writing it last
    // meant one hung query (or a driver window cut) would zero the whole
    // round's correctness, not just the missing queries.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val rank = slowFirst.zipWithIndex.toMap
    val todo = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .sortBy { case (name, _) => (rank.getOrElse(name, Int.MaxValue), name) }
    val pool = Executors.newFixedThreadPool(math.min(10, todo.size.max(1)))
    todo.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    pool.shutdown()
    // 30-min hard cap (full dump measures ~2 min at 32 cores): a single
    // wedged query forfeits only itself, not the queries still queued
    // behind the driver's window
    if (!pool.awaitTermination(30, TimeUnit.MINUTES)) {
      System.err.println("[verify] 30-min cap hit; abandoning stragglers")
      pool.shutdownNow()
    }
    spark.stop()
  }
}
