package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Session-scoped memo for expensive shared artifacts (parsed CDC frames,
  * LSH pair sets, suffix-array ranks, IVF assignments, …), keyed by
  * (unique session id, data dir + content fingerprint).
  *
  * Every access first SWEEPS the whole map (the maps hold a handful of
  * entries), dropping any entry whose owning session has stopped or been
  * collected — a stopped session's cached frames and checkpoint-RDD
  * metadata must not pin memory for the JVM's life just because its exact
  * key is never re-requested. The owning session is held through a
  * WeakReference so the memo itself never keeps a session alive.
  *
  * `onEvict` runs for each swept value (e.g. deleting a temp directory
  * backing a materialized fixture). */
final class SessionMemo[V](onEvict: V => Unit = (_: V) => ()) {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (Long, String), (java.lang.ref.WeakReference[SparkSession], V)]()

  def getOrBuild(spark: SparkSession, dir: String)(build: => V): V = {
    val key = (SessionMemo.idOf(spark), SessionMemo.fingerprint(dir))
    m.forEach { (k, v) =>
      val s = v._1.get()
      // dead-session sweep, plus SUPERSEDED entries of the LIVE session:
      // when a data dir is regenerated in place the new fingerprint creates
      // a new key, and without this the stale entry (and whatever onEvict
      // would release — checkpointed RDD blocks, temp dirs) survives until
      // the session stops; repeated regeneration in one long session (the
      // ScaleGen-rehearsal loop the fingerprint exists for) would
      // accumulate pinned artifacts
      val superseded = k._1 == key._1 && k._2 != key._2 &&
        SessionMemo.pathPrefix(k._2) == SessionMemo.pathPrefix(key._2) &&
        SessionMemo.genOf(k._2) != SessionMemo.genOf(key._2)
      if ((s == null || s.sparkContext.isStopped || superseded) &&
          m.remove(k, v))
        onEvict(v._2)
    }
    m.computeIfAbsent(key,
      _ => (new java.lang.ref.WeakReference(spark), build))._2
  }

  /** Snapshot of live values (for shutdown-hook cleanup). */
  def values: Seq[V] = {
    val b = Seq.newBuilder[V]
    m.forEach { (_, v) => b += v._2 }
    b.result()
  }
}

object SessionMemo {
  /** Unique id per live session. `identityHashCode` is NOT unique — two
    * concurrently-live sessions could collide and share a memoized frame
    * built on the other session. Ids are allocated once per session object
    * through a WeakHashMap (SparkSession does not override equals, so the
    * map is identity-keyed) that never keeps a session alive; uniqueness is
    * guaranteed by the counter. */
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Long]())
  private val nextId = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def idOf(spark: SparkSession): Long =
    ids.computeIfAbsent(spark, _ => nextId.incrementAndGet())

  /** Tag text before the params/content-hash suffixes ('#' tag qualifier,
    * '@' content hash) — the data-dir path component. Two keys with the
    * same path but different content generations ([[genOf]]) denote stale
    * vs current builds of artifacts over the same dir; keys with the same
    * path AND generation but different '#params' are DISTINCT live
    * artifacts (e.g. `dir#k=4` vs `dir#k=8`) and must coexist. */
  private[graft] def pathPrefix(tag: String): String =
    tag.takeWhile(c => c != '#' && c != '@')

  /** The '@'-appended content-hash generation of a fingerprinted tag
    * ("" for non-directory tags, which fingerprint() passes through). */
  private[graft] def genOf(tag: String): String = {
    val i = tag.lastIndexOf('@')
    if (i < 0) "" else tag.substring(i + 1)
  }

  /** Content fingerprint appended to a memo tag: the tag's path component
    * (up to '#') is walked and its (relative-path, size, mtime) listing
    * hashed, so a long-lived session whose data dir is REGENERATED in place
    * rebuilds artifacts instead of serving stale ones. Metadata-only: no
    * file contents are read (a few hundred stat calls even on a sharded
    * corpus). A tag whose path component is not a directory passes through
    * unchanged. */
  private[graft] def fingerprint(tag: String): String = {
    val path = tag.takeWhile(_ != '#')
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root)) tag
    else {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      val listing =
        try walk.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => s"${root.relativize(p)}:${java.nio.file.Files.size(p)}:" +
            s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
          .toSeq.sorted.mkString("\n")
        finally walk.close()
      f"$tag@${scala.util.hashing.MurmurHash3.stringHash(listing)}%08x"
    }
  }

  /** Release the RDD blocks behind a localCheckpoint-ed frame (ADVICE
    * r11): `Dataset.unpersist` only talks to the CacheManager, which
    * localCheckpoint bypasses — the blocks belong to the internal
    * checkpointed RDD, reachable through the plan's LogicalRDD leaf.
    * Used as the memo `onEvict` for checkpointed artifacts so a
    * superseded-entry sweep (in-place corpus regeneration in one long
    * session) releases the blocks instead of pinning them until session
    * stop. Defensive no-op on stopped sessions or non-checkpoint plans. */
  private[graft] def unpersistCheckpointed(df: DataFrame): Unit =
    try df match {
      case d: org.apache.spark.sql.classic.Dataset[_] =>
        d.queryExecution.analyzed.foreach {
          case r: org.apache.spark.sql.execution.LogicalRDD =>
            r.rdd.unpersist(false)
          case _ => ()
        }
      case _ => ()
    } catch { case _: Throwable => () }

  private[graft] def deleteTree(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Memo of TEMP-DIRECTORY paths (materialized fixtures, partitioned
    * table copies): a swept entry's directory is deleted with it, and any
    * survivors are removed at JVM exit — nothing staged to /tmp outlives
    * the process. */
  def tempDirs(): SessionMemo[String] = {
    val m = new SessionMemo[String](deleteTree)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => m.values.foreach(deleteTree), "graft-tmp-cleanup"))
    m
  }
}

/** Disk-backed memo of deterministic per-corpus-snapshot artifacts (the
  * simhash near-dup pair list, component labels, suffix-array ranks, PPJoin
  * prefix index, co-purchase edges): a production pipeline materializes
  * these once per snapshot and every later job — including a COLD one —
  * reads the index instead of rebuilding it (the same maintained-artifact
  * contract x15/y18/c27 implement incrementally). This is the lakehouse
  * analogue at /tmp scope.
  *
  * Layout: `$GRAFT_ARTIFACT_DIR/<name>-<hash(dir)>@<contentGen>/` parquet.
  * The content generation comes from [[SessionMemo.fingerprint]], so a
  * REGENERATED corpus publishes under a new generation and never serves
  * stale artifacts; publishing a new generation sweeps superseded ones of
  * the same (name, dir) — the disk mirror of SessionMemo's superseded-entry
  * eviction. Publication is atomic (write to temp sibling, ATOMIC_MOVE), so
  * concurrent builders across JVMs race safely: the loser deletes its copy
  * and reads the winner's. Values are exact-typed (longs/arrays of longs),
  * so the parquet round-trip is bit-lossless and every consumer stays
  * hash-green. */
object ArtifactStore {
  /** Per-invocation root override. The driver-contract mains (Bench,
    * Verify) set this to a FRESH temp directory at startup so that every
    * bench/oracle invocation computes all artifacts from the parquet
    * inputs — nothing persisted by a previous invocation (or by the
    * verify pass) can leak into a later run's "cold" numbers. Within one
    * invocation the store still behaves exactly like production (first
    * consumer builds + publishes, later consumers and reps read back).
    * Long-lived entry points (Graft, StreamDemo) keep the durable
    * GRAFT_ARTIFACT_DIR default — the cross-run maintained-index shape is
    * theirs. */
  @volatile private[graft] var rootOverride: Option[java.nio.file.Path] = None

  /** Point the store at a fresh private root, swept at JVM exit. */
  private[graft] def freshRootForThisInvocation(): Unit = {
    val r = java.nio.file.Files.createTempDirectory("graft_artifacts_run_")
    // observable override (ADVICE r11): an operator pointing the harness
    // at a durable GRAFT_ARTIFACT_DIR would otherwise get this private
    // temp root with no visible indication
    System.err.println(s"[graft] per-invocation artifact root: $r" +
      sys.env.get("GRAFT_ARTIFACT_DIR").filter(_.nonEmpty)
        .map(d => s" (overrides GRAFT_ARTIFACT_DIR=$d)").getOrElse(""))
    rootOverride = Some(r)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => SessionMemo.deleteTree(r.toString),
        "graft-artifact-run-cleanup"))
  }

  private def root: java.nio.file.Path = {
    val r = rootOverride.getOrElse(java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_ARTIFACT_DIR", "/tmp/graft_artifacts")))
    java.nio.file.Files.createDirectories(r)
    r
  }

  /** Disable switch (spec isolation / forced rebuild measurement). */
  @volatile var enabled: Boolean =
    !sys.env.get("GRAFT_ARTIFACT_DIR").contains("")

  /** Producer-code generation, folded into every published name: a code
    * change that alters an artifact's CONTENT (e.g. the round-10 hot-bucket
    * re-banding changed the pair list at saturation scales) must not serve
    * artifacts published by the old code — the content fingerprint only
    * tracks the CORPUS. Bump on any semantic producer change. Specs pin
    * the versioned publish name explicitly, so a bump is a conscious edit
    * in both places. */
  private val CODE_GEN = "v2"
  /** Test hook: lets the sweep spec publish under a fake older producer
    * generation and assert a CODE_GEN bump sweeps it. */
  @volatile private[graft] var codeGenOverride: Option[String] = None
  private def codeGen: String = codeGenOverride.getOrElse(CODE_GEN)

  /** Grace period before a SUPERSEDED artifact directory is physically
    * deleted. A concurrent session/JVM may still hold lazily-planned
    * DataFrames scanning the old generation's parquet files (SessionMemo
    * eviction is per-session and only fires on that session's next
    * access); deleting at publish time would fail those in-flight reads
    * with missing-file errors. Superseded dirs are therefore left in
    * place until they are older than this, and purged by any LATER
    * publish's sweep — regeneration loops still can't accumulate more
    * than one grace window of garbage. Specs set 0 for immediate sweep. */
  @volatile private[graft] var graceMs: Long = 10 * 60 * 1000L

  def getOrBuild(spark: SparkSession, name0: String, dir: String)(
      build: => DataFrame): DataFrame = {
    if (!enabled) return build
    val fp = SessionMemo.fingerprint(dir)
    val gen = SessionMemo.genOf(fp) match {
      case "" => "static" // non-directory tag: content assumed immutable
      case g  => g
    }
    val dirHash = f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
    val base = s"$name0.$codeGen-$dirHash"
    val pub = root.resolve(s"$base@$gen")
    val success = pub.resolve("_SUCCESS")
    if (java.nio.file.Files.exists(success))
      return spark.read.parquet(pub.toString)
    val tmp = java.nio.file.Files.createTempDirectory(root, s"$base.tmp")
    build.write.mode("overwrite").parquet(tmp.toString)
    if (publish(tmp, pub)) sweepSuperseded(name0, dirHash, s"$base@$gen")
    spark.read.parquet(pub.toString)
  }

  /** Atomic publish of a staged artifact directory; true iff this caller
    * won. Losing the cross-JVM race is NORMAL: on Linux the loser's
    * ATOMIC_MOVE onto the winner's non-empty directory surfaces as
    * DirectoryNotEmptyException (ENOTEMPTY), not only
    * FileAlreadyExistsException — so the common FileSystemException
    * parent is caught, and treated as a lost race ONLY when the winner's
    * _SUCCESS actually exists (the loser then discards its staged copy
    * and reads the winner's); anything else is a real I/O failure and
    * propagates. */
  private[graft] def publish(tmp: java.nio.file.Path,
      pub: java.nio.file.Path): Boolean =
    try {
      java.nio.file.Files.move(tmp, pub,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case e: java.nio.file.FileSystemException =>
        if (java.nio.file.Files.exists(pub.resolve("_SUCCESS"))) {
          SessionMemo.deleteTree(tmp.toString)
          false
        } else throw e
    }

  /** Deletes superseded publishes of (name0, dirHash): every sibling whose
    * name parses as `name0.v<N>-<dirHash>@<gen>` other than `keep`. The
    * match is on the CODE_GEN-STRIPPED prefix, so a producer-code bump
    * also removes the old code's artifacts instead of stranding them
    * (pre-v2 dirs were orphaned forever when the base embedded the
    * version). Deletion respects [[graceMs]]. */
  private def sweepSuperseded(name0: String, dirHash: String,
      keep: String): Unit = {
    import scala.jdk.CollectionConverters._
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(name0) + "\\.v\\d+-" +
        java.util.regex.Pattern.quote(dirHash) + "@.+")
    val cutoff = System.currentTimeMillis() - graceMs
    val list = java.nio.file.Files.list(root)
    try list.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n != keep && pat.matcher(n).matches() &&
          (try java.nio.file.Files.getLastModifiedTime(p)
            .toMillis <= cutoff
          catch { case _: java.io.IOException => false })
      }
      .toSeq.foreach(p => SessionMemo.deleteTree(p.toString))
    finally list.close()
  }
}

/** Shared helpers: table loading and oracle-exact numeric aggregation. */
object G {

  /** Load one driver parquet table (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Load `events` with its timestamp column normalized to TIMESTAMP_NTZ.
    *
    * The driver's generator has shipped `ts` two ways across testdata
    * versions: TIMESTAMP(NANOS) (which Spark 4 only reads via the legacy
    * nanos-as-`Long` flag — we then divide ns → µs with integer division,
    * since a double division would lose precision at ~1.7e18) and plain
    * TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). Adapt on the
    * observed schema so both vintages load identically: wall-clock NTZ
    * semantics, matching what DuckDB sees, independent of session timezone.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => // nanos vintage
        df.withColumn("ts",
          timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType))
      case _ =>
        df.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }

  /** Load `events` keeping the raw nanosecond epoch as `ts_ns: Long`
    * (plus all other columns) — for operators that do epoch-millis
    * arithmetic, like the reference (`CdcEventParser.java:66-90`).
    * On the micros-vintage testdata the nanos are reconstructed as
    * `unix_micros * 1000` (sub-µs digits are zero in that vintage, so the
    * round-trip is exact). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumnRenamed("ts", "ts_ns")
      case _ =>
        df.withColumn("ts",
            unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .withColumnRenamed("ts", "ts_ns")
    }
  }

  /** When false, `dsum`/`davg` fall back to plain double aggregation —
    * production mode: ~4× faster on agg-heavy plans (measured in
    * graft.Stress at 10 M rows) at the cost of bit-exact cross-engine
    * reproducibility. The oracle/verify path leaves this true. */
  @volatile var exactSums: Boolean = true

  /** Order-independent, oracle-exact sum of a double column.
    *
    * Summing doubles is order-dependent; Spark's partial/final aggregation
    * order differs from DuckDB's scan order, so raw `sum(double)` can differ
    * in the last bits and fail the driver's hash compare. Casting each value
    * to DECIMAL(38,scale) first makes the sum exact and associative; casting
    * back to double yields a bit-identical result on both engines.
    * DuckDB oracle equivalent: `CAST(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 6): Column =
    if (exactSums) sum(c.cast(DecimalType(38, scale))).cast(DoubleType)
    else sum(c)

  /** Exact mean via decimal sum / count (DuckDB: dsum / COUNT(x)).
    * Plain `avg(double)` has the same order-dependence problem as sum. */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(c)

  /** `threshold filter on a heavy computed column` — `simFilter(j, tau)`
    * instead of `col(j) >= tau`. A plain `>=` filter on a computed
    * similarity column implies `IsNotNull(j)`; predicate pushdown clones
    * that constraint into the upstream join's condition, where the heavy
    * pair expression (shingle-array intersect, vector dot product) then
    * re-evaluates for every ORDERED joined pair ahead of the cheap
    * ordering predicate — pure waste, measured 3.7× on the threshold
    * sweep (q_c29). The coalesce is semantically free (the similarity is
    * never null: its inputs are non-null arrays) and exists only to block
    * the constraint inference; the real `>= tau` check still pushes into
    * literal-tau joins, which is correct early filtering. Pinned by
    * Round13OpsSpec. */
  def simFilter(j: Column, tau: Column): Column =
    coalesce(j, lit(-1d)) >= tau

  /** events.props is a tiny JSON object `{"k": <int>}`; `k` plays the
    * trade-volume analogue when events stands in for the trade stream
    * (FIXTURES.md §B mapping). */
  def propsK(c: Column): Column = get_json_object(c, "$.k").cast(LongType)
}
