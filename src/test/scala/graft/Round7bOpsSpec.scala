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
}
