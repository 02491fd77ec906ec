package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar table layout (SURVEY §2.8 ST1–ST4) — the ClickHouse MergeTree
  * behaviors re-expressed as parquet layout:
  *
  *  - ST1 monthly time partitioning (`PARTITION BY toYYYYMM`,
  *    `clickhouse/init.sql:25,51,72`) → hive-style `partitionBy("month")`;
  *    Catalyst prunes partitions from time predicates for free.
  *  - ST2 sort key (`ORDER BY (market, ts, id)`, `init.sql:26`) →
  *    `sortWithinPartitions` before write: parquet row-group min/max stats
  *    then give the same index-skip effect on (key, ts) range scans.
  *  - ST4 insert timestamp default (`init.sql:22`) → `inserted_at` stamped
  *    at write.
  *  - ST3 TTL retention (`init.sql:27`) is a maintenance job, not an engine
  *    primitive: `retentionFilter` builds the keep-predicate; dropping whole
  *    month partitions is the cheap path at scale.
  *
  * At 100 TB: one shuffle (`repartition(month, bucketExpr)`) sizes output
  * files and co-locates each partition's data; sortWithinPartitions is a
  * spill-backed local sort. File count per month = `filesPerMonth`, tuned so
  * files land near the 128MB–1GB sweet spot instead of 32 tiny files per
  * partition from every task.
  */
object Tables {

  /** Write a time-series frame as a monthly-partitioned, key-sorted parquet
    * table. `sortCols` is the MergeTree-style sort key. */
  def writePartitioned(df: DataFrame, path: String, tsCol: String,
      sortCols: Seq[String], filesPerMonth: Int = 4): Unit =
    df.withColumn("month", date_format(col(tsCol), "yyyyMM"))
      .withColumn("inserted_at", current_timestamp())
      .repartition(filesPerMonth, col("month"),
        pmod(hash(col(sortCols.head)), lit(filesPerMonth)))
      .sortWithinPartitions(col("month") +: sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy("month")
      .parquet(path)

  /** Bucketed layout for co-located fact-to-fact joins: both sides written
    * `bucketBy(n, key)` join WITHOUT any Exchange — at 100 TB this removes
    * the one remaining shuffle of the star schema (lineitem ⋈ orders).
    * Bucket count is fixed at write time; pick ≈ cluster cores at target
    * scale. Verified shuffle-free in LayoutSpec. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** ST3: retention keep-predicate (TTL 90 days in the reference). */
  def retentionFilter(df: DataFrame, tsCol: String, cutoff: String): DataFrame =
    df.filter(col(tsCol) >= lit(cutoff).cast("timestamp_ntz"))

  /** Read back a table written by writePartitioned. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
