package graft

import java.util.Random

/** Deterministic synthetic trade/CDC-envelope generator (SURVEY §7.1) —
  * plays the reference's WebSocket producer (S3, `producer/producer.py`) for
  * streaming demos and test fixtures. Seeded → reproducible across runs. */
object Synthetic {

  final case class Trade(
      trade_id: Long,
      market: String,
      price: Double,
      volume: Double,
      askBid: String,
      tsMs: Long)

  val markets: Seq[String] =
    Seq("KRW-BTC", "KRW-ETH", "KRW-XRP", "KRW-SOL", "KRW-DOGE")

  /** n seeded trades, 1-second cadence from a fixed epoch. */
  def trades(n: Int, seed: Long = 42L): Seq[Trade] = {
    val rnd = new Random(seed)
    val t0 = 1700000000000L
    (0 until n).map { i =>
      Trade(
        trade_id = i.toLong + 1,
        market = markets(rnd.nextInt(markets.size)),
        price = math.rint((50 + rnd.nextDouble() * 150) * 100) / 100,
        volume = math.rint(rnd.nextDouble() * 100),
        askBid = if (rnd.nextBoolean()) "BID" else "ASK",
        tsMs = t0 + i * 1000L)
    }
  }

  /** Debezium-envelope JSON for one trade (FIXTURES.md §A1 shape);
    * decimals as strings per `decimal.handling.mode=string`. */
  def envelopeJson(t: Trade, op: String = "c", latencyMs: Long = 5,
      wrapped: Boolean = true): String = {
    val img =
      s"""{"trade_id": ${t.trade_id}, "market": "${t.market}",
         | "trade_price": "${t.price}", "trade_volume": "${t.volume}",
         | "trade_amount": "${t.price * t.volume}",
         | "ask_bid": "${t.askBid}", "upbit_timestamp": ${t.tsMs},
         | "sequential_id": ${t.trade_id * 1000}}""".stripMargin.replace("\n", "")
    val images =
      if (op == "d") s""""before": $img, "after": null"""
      else s""""before": null, "after": $img"""
    val payload =
      s"""{$images, "source": {"ts_ms": ${t.tsMs}, "db": "crypto_db",
         | "table": "crypto_trades"}, "op": "$op",
         | "ts_ms": ${t.tsMs + latencyMs}}""".stripMargin.replace("\n", "")
    if (wrapped) s"""{"payload": $payload}""" else payload
  }
}
