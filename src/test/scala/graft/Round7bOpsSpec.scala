package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-7 second-wave operators. */
class Round7bOpsSpec extends SparkSpec {

  test("bfs: planted graph distances match hand-computed BFS") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a branch 3-6 and an unreachable island 7-8
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L),
      (7L, 8L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("s")
    val got = Graph.bfsFromEdges(edges, seeds, 3)
      .as[(Long, Long)].collect().toMap
    // radius 3: node 5 is 4 hops away and the island is unreachable —
    // neither may appear
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 6L -> 3L))
  }

  test("bfs: seeds outside the graph's node set are dropped") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val seeds = Seq(1L, 99L).toDF("s") // 99 has no bulk co-purchase edge
    val got = Graph.bfsFromEdges(edges, seeds, 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("bfs: sf0.001 distances match an in-memory reference BFS") {
    import spark.implicits._
    val li = G.table(spark, sf(), "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val a = li.select(col("ok"), col("pk").as("u"))
    val b = li.select(col("ok"), col("pk").as("v"))
    val edges = a.join(b, "ok").filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val seedSet = G.table(spark, sf(), "part")
      .filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey")).as[Long].collect().toSet
      .intersect(adj.keySet.toSet)
    var dist = seedSet.map(_ -> 0L).toMap
    for (r <- 1 to 3) {
      val frontier = dist.filter(_._2 == r - 1).keys
      frontier.foreach { n =>
        adj(n).foreach { nb => if (!dist.contains(nb)) dist += nb -> r.toLong }
      }
    }
    val got = Graph.bfs(spark, sf()).as[(Long, Long)].collect().toMap
    assert(got == dist, s"got ${got.size} rows, expected ${dist.size}")
  }

  test("power iteration: planted dominant axis is recovered") {
    import spark.implicits._
    import graft.operators.Similarity
    // 20 vectors strongly aligned with axis 2, mild noise on axis 0
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array(0.01 * (i % 3), 0.0, 5.0 + 0.1 * (i % 2), 0.0))
    }.toDF("vec_id", "v")
    val out = Similarity.powerIterVecs(vecs, 4, 3)
      .as[(Long, Double, Double)].collect()
    val byDim = out.map(r => r._1 -> r._2).toMap
    assert(math.abs(byDim(2L)) > 0.999, s"dominant axis not found: $byDim")
    val norm = out.map(r => r._2 * r._2).sum
    assert(math.abs(norm - 1.0) < 1e-9, s"direction not unit: $norm")
  }

  test("power iteration: Rayleigh estimate is monotone over rounds") {
    import spark.implicits._
    import graft.operators.Similarity
    val e = G.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    val lambdas = (1 to 3).map { r =>
      Similarity.powerIterVecs(e, 64, r)
        .select(col("lambda")).distinct().as[Double].head()
    }
    assert(lambdas(0) <= lambdas(1) + 1e-9 && lambdas(1) <= lambdas(2) + 1e-9,
      s"||Av|| must be nondecreasing under power iteration: $lambdas")
  }
}
