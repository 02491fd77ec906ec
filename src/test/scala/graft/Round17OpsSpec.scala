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
}
