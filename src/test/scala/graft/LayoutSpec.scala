package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed-layout co-located join: both sides bucketed on the join key →
  * the join plans with NO shuffle Exchange (SCALE.md join section). */
class LayoutSpec extends SparkSpec {

  test("bucketed fact-to-fact join is shuffle-free") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val li = G.table(spark, sf(), "lineitem")
    val ord = G.table(spark, sf(), "orders")
    Tables.writeBucketed(li.select(col("l_orderkey"), col("l_extendedprice")),
      "li_b", s"$base/li", "l_orderkey", 8)
    Tables.writeBucketed(ord.select(col("o_orderkey"), col("o_totalprice")),
      "ord_b", s"$base/ord", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("z-order layout: 2-D box predicate touches fewer row groups than linear sort") {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path

    val base = Files.createTempDirectory("graft_zorder").toString
    // 200k rows, two independent uniform 8-bit dims
    val df = spark.range(200000).select(
      pmod(xxhash64(col("id")), lit(256)).as("xa"),
      pmod(xxhash64(col("id") + 1), lit(256)).as("xb"),
      col("id"))
    Tables.writeZOrdered(df, s"$base/z", "xa", "xb", nFiles = 4,
      parquetBlockBytes = 64L << 10)
    // linear baseline: same data, same file/block sizing, 1-D sort key
    df.repartitionByRange(4, col("xa"))
      .sortWithinPartitions(col("xa"), col("xb"))
      .write.mode("overwrite")
      .option("parquet.block.size", 64L << 10)
      .parquet(s"$base/lin")

    // row groups whose (xa, xb) min/max box intersects the predicate box
    def touched(dir: String, lo: Long, hi: Long): (Int, Int) = {
      val conf = spark.sparkContext.hadoopConfiguration
      val files = new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet"))
      var total = 0; var hit = 0
      files.foreach { f =>
        val rd = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try rd.getFooter.getBlocks.asScala.foreach { blk =>
          total += 1
          def range(name: String): (Long, Long) = {
            val st = blk.getColumns.asScala
              .find(_.getPath.toDotString == name).get.getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          }
          val (amin, amax) = range("xa"); val (bmin, bmax) = range("xb")
          if (amax >= lo && amin <= hi && bmax >= lo && bmin <= hi) hit += 1
        } finally rd.close()
      }
      (hit, total)
    }
    // box = an aligned 32x32 tile ([32,63]^2 is one contiguous z range,
    // 3072..4095). A box straddling the major quadrant boundary (e.g.
    // [112,143]^2 around 128) is the z-curve's worst case and degrades
    // to ~linear pruning — that is inherent to Morton order, not a bug.
    val (zHit, zTotal) = touched(s"$base/z", 32L, 63L)
    val (lHit, lTotal) = touched(s"$base/lin", 32L, 63L)
    assert(zTotal >= 8 && lTotal >= 8,
      s"need multiple row groups to compare ($zTotal z, $lTotal linear)")
    val zFrac = zHit.toDouble / zTotal
    val lFrac = lHit.toDouble / lTotal
    assert(zFrac < lFrac * 0.6,
      s"z-order should prune multiplicatively: z $zHit/$zTotal vs linear $lHit/$lTotal")
    // layout changes nothing about the data: both reads agree
    val zRows = spark.read.parquet(s"$base/z")
      .filter(col("xa").between(32, 63) && col("xb").between(32, 63))
      .orderBy("id").collect().toSeq
    val lRows = spark.read.parquet(s"$base/lin")
      .filter(col("xa").between(32, 63) && col("xb").between(32, 63))
      .orderBy("id").collect().toSeq
    assert(zRows.nonEmpty && zRows == lRows)
  }

  test("compaction restores the canonical layout on a fragmented table") {
    val base = Files.createTempDirectory("graft_compact").toString
    val path = s"$base/t"
    val df = spark.range(50000).select(
      col("id"),
      timestamp_millis(lit(1700000000000L) + col("id") * 100000L).as("ts"),
      pmod(xxhash64(col("id")), lit(1000)).as("k"))
    // fragment: 32 files per month (a micro-batch sink's debris)
    Tables.writePartitioned(df, path, "ts", Seq("k"), filesPerMonth = 32)
    def filesPerMonth(p: String): Map[String, Int] =
      new java.io.File(p).listFiles.filter(_.getName.startsWith("month="))
        .map(d => d.getName ->
          d.listFiles.count(_.getName.endsWith(".parquet"))).toMap
    val before = filesPerMonth(path)
    assert(before.values.max > 4, s"fixture not fragmented: $before")
    val rowsBefore = spark.read.parquet(path)
      .select(col("id"), col("k")).orderBy("id").collect().toSeq

    Tables.compact(spark, path, "ts", Seq("k"), filesPerMonth = 4)

    // layout restored: file counts bounded, partition dirs intact
    val after = filesPerMonth(path)
    assert(after.keySet == before.keySet)
    assert(after.values.max <= 4, s"still fragmented: $after")
    // content identical (the whole point of a maintenance job)
    val rowsAfter = spark.read.parquet(path)
      .select(col("id"), col("k")).orderBy("id").collect().toSeq
    assert(rowsAfter == rowsBefore)
    // sort-key skipping survives: within each file, k is min/max-bounded
    // tighter than the global range (files are k-hash-bucketed + sorted)
    val anyMonth = new java.io.File(path).listFiles
      .filter(_.getName.startsWith("month=")).head
    val stats = anyMonth.listFiles.filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val d = spark.read.parquet(f.getAbsolutePath)
          .agg(min("k"), max("k")).head
        (d.getLong(0), d.getLong(1))
      }
    assert(stats.length <= 4 && stats.nonEmpty)
  }

  test("TTL partition drop: expired months vanish without rewriting " +
      "live data") {
    val base = Files.createTempDirectory("graft_ttl").toString
    val path = s"$base/t"
    // ~6 months of data, 100k-ms stride
    val df = spark.range(160000).select(
      col("id"),
      timestamp_millis(lit(1700000000000L) + col("id") * 100000L).as("ts"),
      pmod(xxhash64(col("id")), lit(1000)).as("k"))
    Tables.writePartitioned(df, path, "ts", Seq("k"), filesPerMonth = 2)
    def months(p: String): Set[String] =
      new java.io.File(p).listFiles.filter(_.getName.startsWith("month="))
        .map(_.getName.stripPrefix("month=")).toSet
    val all = months(path)
    assert(all.size >= 5, s"fixture spans too few months: $all")
    val cutoff = all.toSeq.sorted.apply(2) // keep the 3rd month onward
    val expectedDrop = all.filter(_ < cutoff).toSeq.sorted
    // fingerprint every live file BEFORE the drop: (length, mtime)
    def liveFiles(p: String): Map[String, (Long, Long)] =
      new java.io.File(p).listFiles
        .filter(d => d.getName.startsWith("month=") &&
          d.getName.stripPrefix("month=") >= cutoff)
        .flatMap(_.listFiles.filter(_.getName.endsWith(".parquet")))
        .map(f => f.getAbsolutePath -> (f.length, f.lastModified)).toMap
    val before = liveFiles(path)

    val dropped = Tables.dropExpiredPartitions(spark, path, cutoff)

    assert(dropped == expectedDrop, s"dropped $dropped != $expectedDrop")
    assert(months(path) == all.filter(_ >= cutoff),
      "a live month vanished or an expired one survived")
    // the drop is METADATA-ONLY for live data: every surviving file is
    // byte-identical (same length, same mtime — never rewritten)
    assert(liveFiles(path) == before, "live partition files were touched")
    // and the readable content now equals the keep-predicate applied to
    // whole months (partition-value expiry never deletes boundary rows)
    val kept = spark.read.parquet(path).count()
    val expected = df
      .filter(date_format(col("ts"), "yyyyMM") >= cutoff).count()
    assert(kept == expected)
  }

  test("IVF cell layout: probe scans only its partition (partition pruning)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = Files.createTempDirectory("graft_ivf").toString
    G.table(spark, sf(), "embeddings")
      .write.partitionBy("label").parquet(s"$base/ivf")
    val nCells = G.table(spark, sf(), "embeddings")
      .select("label").distinct().count()
    // the IVF probe: restrict to the query's coarse cell
    val probe = spark.read.parquet(s"$base/ivf").filter(col("label") === 3)
    val scan = probe.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"cell predicate must become a partition filter:\n${probe.queryExecution}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"probe must read 1 of $nCells cells, read ${scan.selectedPartitions.partitionCount}")
    assert(probe.count() > 0)
  }

  test("Graft facade: open registers views + vector_dot, query() resolves") {
    Graft.open(spark, sf())
    assert(spark.sql("SELECT count(*) FROM events_v").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
    assert(Graft.query("q_r1_pricing_summary")(spark, sf()).count() > 0)
    assert(Graft.queryNames.size == SparkEntry.queries.size)
  }

  test("spark.sql panel surface runs every panel") {
    operators.SqlSurface.createViews(spark, sf())
    operators.SqlSurface.panels.foreach { case (name, sql) =>
      val n = spark.sql(sql).count()
      assert(n > 0, s"panel $name returned no rows")
    }
  }
}
