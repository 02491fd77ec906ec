package graft

import org.apache.spark.sql.functions._

/** Round-12 (optimization round 2) pins: the production facade carries the
  * small-shuffle parallelism floor, and the replay scratch base resolves
  * RAM-backed storage ahead of disk /tmp. */
class Round17OpsSpec extends SparkSpec {

  test("Graft.session() sets the AQE small-shuffle parallelism floor " +
      "(VERDICT r11 #1: the floor was harness-only; production users got " +
      "the serialized byte-small-shuffle pathology the bench no longer " +
      "measured)") {
    // Graft.session() reuses the test JVM's session via getOrCreate and
    // applies its confs to it — capture and restore what it mutates so the
    // shared suite session comes back exactly as found
    val floorKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val prevFloor = spark.conf.getOption(floorKey)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val s = Graft.session()
      assert(s.conf.get(floorKey) ==
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "64k"),
        "the production facade must ship the same env-overridable " +
          "minPartitionSize floor as Bench/Verify/Prof")
    } finally {
      prevFloor match {
        case Some(v) => spark.conf.set(floorKey, v)
        case None    => spark.conf.unset(floorKey)
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }

  // Round-12 artifact promotions (x7 span table, c27 base labels): the
  // memoized artifact path must be row-identical to the inline compute —
  // the parquet round-trip is exact longs, so any divergence is a bug in
  // the publish/read path, not float drift. Each arm runs on its own
  // cloned session (SessionMemo is session-keyed) so the second arm can't
  // read the first arm's memo entry.
  private def bothArms(q: (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame): (Seq[String], Seq[String]) = {
    val prevRoot = ArtifactStore.rootOverride
    val prevEnabled = ArtifactStore.enabled
    val tmp = java.nio.file.Files.createTempDirectory("graft_r12_arm_")
    try {
      ArtifactStore.rootOverride = Some(tmp)
      ArtifactStore.enabled = true
      val viaArtifact = q(spark.newSession(), sf())
        .collect().map(_.toString).sorted.toSeq
      ArtifactStore.enabled = false
      val inline = q(spark.newSession(), sf())
        .collect().map(_.toString).sorted.toSeq
      (viaArtifact, inline)
    } finally {
      ArtifactStore.rootOverride = prevRoot
      ArtifactStore.enabled = prevEnabled
      SessionMemo.deleteTree(tmp.toString)
    }
  }

  test("x7 span table through the artifact store is row-identical to the " +
      "inline LCP kernel (round-12 span-artifact promotion)") {
    val (via, inline) = bothArms(graft.operators.Dedup.repeatedSpans)
    assert(via == inline,
      s"artifact path diverged: ${via.size} vs ${inline.size} rows")
  }

  test("c27 base labels through the artifact store are row-identical to " +
      "the inline label propagation (round-12 base-label promotion)") {
    val (via, inline) = bothArms(graft.operators.Dedup.incrementalClusters)
    assert(via == inline,
      s"artifact path diverged: ${via.size} vs ${inline.size} rows")
  }
}
