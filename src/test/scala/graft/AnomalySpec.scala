package graft

import graft.model.{AlertType, DetectorState}
import graft.operators.AnomalyDetection
import graft.operators.AnomalyDetection.{Ev, step}

/** D1–D4 rule semantics (reference `AnomalyDetector.java`; goldens per
  * FIXTURES.md §A3) + distributed-fold == local-fold equivalence. */
class AnomalySpec extends SparkSpec {

  private def fold(evs: Seq[Ev]): Seq[model.AnomalyAlert] = {
    var st = DetectorState.empty
    evs.flatMap { e => val (a, s2) = step(st, e); st = s2; a }
  }

  private def ev(uid: Long, id: Long, ts: Long, price: Double,
      vol: Long): Ev = Ev(uid, id, ts, price, vol, price * vol)

  test("D1 large trade: tiered thresholds (AnomalyDetector.java:107-115)") {
    // user 0 → 15000 tier, user 2 → 3000 tier
    assert(fold(Seq(ev(0, 1, 1000, 150.0, 100))) // 15000 >= 15000
      .exists(_.alert_type == AlertType.LargeTrade))
    assert(!fold(Seq(ev(0, 1, 1000, 149.0, 100)))
      .exists(_.alert_type == AlertType.LargeTrade))
    assert(fold(Seq(ev(2, 1, 1000, 30.0, 100)))
      .exists(_.alert_type == AlertType.LargeTrade))
  }

  test("D2 price spike vs last price, updated unconditionally (:117-131)") {
    // user 2 → 3% tier. 100 → 104 fires (4%), 104 → 104.5 doesn't (0.48%)
    val alerts = fold(Seq(
      ev(2, 1, 1000, 100.0, 1),
      ev(2, 2, 2000, 104.0, 1),
      ev(2, 3, 3000, 104.5, 1)))
    assert(alerts.count(_.alert_type == AlertType.PriceSpike) == 1)
    assert(alerts.find(_.alert_type == AlertType.PriceSpike)
      .get.trade_id == 2L)
  }

  test("D3 volume surge checks PRE-update EMA (:133-154)") {
    // 50 warmup events vol=10 → EMA 10; 51st vol=19 fires (19 >= 10*1.9);
    // 52nd vol=19 must NOT fire (EMA already absorbed 19 → 10.45*1.9=19.855)
    val warmup = (1 to 50).map(i => ev(2, i.toLong, i * 1000L, 1.0, 10))
    val alerts = fold(warmup ++ Seq(
      ev(2, 51, 51000, 1.0, 19),
      ev(2, 52, 52000, 1.0, 19)))
    val surges = alerts.filter(_.alert_type == AlertType.VolumeSurge)
    assert(surges.map(_.trade_id) == Seq(51L))
  }

  test("D4 rapid trades: ==N single fire + window reset (:156-175)") {
    val n = AnomalyDetection.RapidN
    val burst = (1 to n + 3).map(i => ev(2, i.toLong, 1000L + i, 1.0, 1))
    val alerts = fold(burst).filter(_.alert_type == AlertType.RapidTrades)
    assert(alerts.map(_.trade_id) == Seq(n.toLong)) // exactly once, at N
    // after a >window gap the counter resets and can fire again
    val gap = AnomalyDetection.RapidWindowMs + 1000L
    val twoBursts = burst ++
      (1 to n).map(i => ev(2, 100L + i, gap + 2000L + i, 1.0, 1))
    val alerts2 = fold(twoBursts).filter(_.alert_type == AlertType.RapidTrades)
    assert(alerts2.size == 2)
  }

  test("one event can emit multiple alerts (docs/04-flink-streaming.md:289-302)") {
    // user 2: large amount AND >=3% move in one event
    val alerts = fold(Seq(
      ev(2, 1, 1000, 100.0, 1),
      ev(2, 2, 2000, 200.0, 100))) // amount 20000 >= 3000; +100% spike
    val forSecond = alerts.filter(_.trade_id == 2L)
    assert(forSecond.map(_.alert_type).toSet ==
      Set(AlertType.LargeTrade, AlertType.PriceSpike))
  }

  test("distributed fold equals local fold on sf0.001") {
    val distributed = AnomalyDetection.detect(spark, sf())
      .collect()
      .map(r => (r.getAs[String]("alert_type"), r.getAs[String]("market"),
        r.getAs[Long]("trade_id")))
      .sortBy(t => (t._2, t._3, t._1))
    val local = AnomalyDetection.detectorInput(spark, sf())
      .collect()
      .groupBy(_.user_id)
      .flatMap { case (_, evs) =>
        fold(evs.sortBy(e => (e.ts_ms, e.event_id)).toSeq) }
      .map(a => (a.alert_type, a.market, a.trade_id))
      .toSeq
      .sortBy(t => (t._2, t._3, t._1))
    assert(distributed.toSeq == local)
    assert(distributed.nonEmpty)
  }
}
