package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Round-8 wave: the seven TPC-H shapes that completed the 22-query
  * canon (Q2, Q11, Q12, Q13, Q14, Q15, Q20 — r41..r47). Plan pins cover
  * the two scale-critical claims (ReuseExchange unifies the twice-used
  * aggregate subtrees in r42/r46; dims broadcast in r41), brute
  * recomputes cover the quantifier semantics. */
class Round10OpsSpec extends SparkSpec {

  test("r41 min-cost supplier: every dimension broadcasts (no sort-merge " +
    "join) and each row's cost is the minimum over its part's output") {
    val d = Relational.minCostSupplier(spark, sf())
    val rows = d.collect()
    assert(rows.nonEmpty)
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"dimension join shuffled:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
    // within the output, ties on a part all carry the identical min cost
    rows.groupBy(_.getAs[Long]("p_partkey")).values.foreach { g =>
      assert(g.map(_.getAs[Double]("unit_cost")).distinct.length == 1)
    }
    // brute recompute: the winning cost per part IS the min over the
    // part's European (partkey, suppkey) pairs
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        r.getDouble(2) / r.getDouble(3)))
    val euSupp = {
      val nat = spark.read.parquet(s"${sf()}/nation.parquet").collect()
        .map(r => r.getInt(0) -> r.getInt(2)).toMap
      val eur = spark.read.parquet(s"${sf()}/region.parquet").collect()
        .filter(_.getString(1) == "EUROPE").map(_.getInt(0)).toSet
      spark.read.parquet(s"${sf()}/supplier.parquet").collect()
        .filter(r => eur.contains(nat(r.getInt(2)))).map(_.getLong(0)).toSet
    }
    val pairMin: Map[(Long, Long), Double] =
      li.filter(p => euSupp.contains(p._1._2))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val minCost: Map[Long, Double] =
      pairMin.toSeq.groupBy(_._1._1)
        .map { case (pk, v) => pk -> v.map(_._2).min }
    rows.foreach { r =>
      assert(r.getAs[Double]("unit_cost") ==
        minCost(r.getAs[Long]("p_partkey")))
    }
  }

  test("r42 important parts: ReuseExchange runs the lineitem agg ONCE " +
    "for both the per-part and total branches; output descends") {
    val d = Relational.importantParts(spark, sf())
    val rows = d.collect()
    assert(rows.nonEmpty)
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"pv subtree executed twice (no ReusedExchange):\n$plan")
    val vals = rows.map(_.getAs[Double]("value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("l_partkey")).distinct.length == rows.length)
  }

  test("r43 delay bands: high+low reconcile to the join cardinality and " +
    "band totals are complete") {
    val rows = Relational.shippingDelayBands(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("FAST", "MEDIUM", "SLOW")))
    val total = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    // every lineitem has an order (referential integrity of the join):
    // the band counts partition the full lineitem table
    val nLi = spark.read.parquet(s"${sf()}/lineitem.parquet").count()
    assert(total == nLi)
  }

  test("r44 order-count distribution: custdist sums to the customer " +
    "count and order-less customers appear as c_count=0") {
    val rows = Relational.orderCountDistribution(spark, sf()).collect()
    val nCust = spark.read.parquet(s"${sf()}/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
    // weighted counts reconcile to the qualifying order count
    val nOrd = spark.read.parquet(s"${sf()}/orders.parquet")
      .filter(col("o_orderpriority") =!= "5-LOW").count()
    assert(rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum == nOrd)
  }

  test("r44 plan: exactly two hash exchanges — one per aggregation " +
    "level — the join adds none") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try {
        val d = Relational.orderCountDistribution(spark, sf())
        d.collect(); d.queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val hashEx = plan.toString.split('\n')
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 2, s"expected 2 hash exchanges, got $hashEx:\n$plan")
  }

  test("r45 promo revenue: ratio within (0,100) and a brute recompute " +
    "over the quarter agrees") {
    val r = Relational.promoRevenue(spark, sf()).collect().head
    val pct = r.getAs[Double]("promo_revenue_pct")
    assert(pct > 0 && pct < 100)
    val types = spark.read.parquet(s"${sf()}/part.parquet").collect()
      .map(x => x.getLong(0) -> x.getString(3)).toMap
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
    assert(r.getAs[Long]("n_lines") == li.length)
    val num = li.filter(x => types(x.getLong(0)) == "PROMO")
      .map(x => BigDecimal(x.getDouble(1) * (1 - x.getDouble(2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    val den = li
      .map(x => BigDecimal(x.getDouble(1) * (1 - x.getDouble(2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(pct - 100.0 * num.toDouble / den.toDouble) < 1e-9)
  }

  test("r46 top supplier: ReuseExchange unifies the rev subtree and the " +
    "reported revenue is the true quarterly max") {
    val d = Relational.topSupplier(spark, sf())
    val rows = d.collect()
    assert(rows.nonEmpty)
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"rev subtree executed twice (no ReusedExchange):\n$plan")
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
    val bySupp = li.groupBy(_.getLong(0)).view.mapValues(_.map(x =>
      BigDecimal(x.getDouble(1) * (1 - x.getDouble(2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble).toMap
    val trueMax = bySupp.values.max
    rows.foreach { r =>
      assert(r.getAs[Double]("total_revenue") == trueMax)
      assert(bySupp(r.getAs[Long]("s_suppkey")) == trueMax)
    }
    // and every supplier achieving the max is present
    assert(rows.length == bySupp.count(_._2 == trueMax))
  }

  test("r47 dominant suppliers: brute recompute of the 30% share " +
    "quantifier over the selected parts agrees exactly") {
    val rows = Relational.dominantSuppliers(spark, sf()).collect()
    val sel = spark.read.parquet(s"${sf()}/part.parquet").collect()
      .filter(r => Set("SMALL", "MEDIUM").contains(r.getString(3)))
      .map(_.getLong(0)).toSet
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_suppkey", "l_partkey", "l_quantity").collect()
      .filter(r => sel.contains(r.getLong(1)))
    val pair = li.groupBy(r => (r.getLong(0), r.getLong(1))).view
      .mapValues(_.map(x => BigDecimal(x.getDouble(2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble).toMap
    val partTot = pair.toSeq.groupBy(_._1._2).view.mapValues(_.map(x =>
      BigDecimal(x._2).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble).toMap
    val expect = pair.collect {
      case ((s, p), q) if q > 0.3 * partTot(p) => s
    }.toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expect)
    assert(rows.nonEmpty)
  }
}
