package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join equivalence and salt distribution. */
class SkewSpec extends SparkSpec {

  test("salted join == plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k facts, 90% on one hot key — the distribution AQE may miss when
    // the skewed side feeds an agg first
    val big = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"),
        (col("id") * 3).as("v"))
    val small = Seq.tabulate(50)(i => (i.toLong, s"dim_$i"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "id", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("id"), factor = 8)
      .select("k", "id", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salting spreads a hot key across reducers") {
    val big = spark.range(8000).select(col("id"), lit(1L).as("k"))
    val withSalt = big.withColumn("_salt", pmod(hash(col("id")), lit(8)))
    val perSalt = withSalt.groupBy("_salt").count().collect()
      .map(r => r.getAs[Long]("count"))
    assert(perSalt.length == 8)           // all 8 sub-keys hit
    assert(perSalt.max < 8000 * 0.25)     // no sub-key holds the bulk
  }
}
