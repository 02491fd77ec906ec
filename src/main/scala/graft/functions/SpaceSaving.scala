package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** One reported heavy hitter: `cnt_est` is an overestimate of the true
  * frequency, with `cnt_est - err <= true <= cnt_est`. */
case class HeavyHitter(bigram: String, cnt_est: Long, err: Long)

/** SpaceSaving heavy-hitters sketch (Metwally/Agrawal/El Abbadi, "Efficient
  * computation of frequent and top-k elements in data streams", ICDT 2005)
  * as a typed, MERGEABLE Spark [[Aggregator]] — the same partial→final
  * shape as the reference's window aggregate (`TradeAggregator.java:80-91`
  * `merge()`), but with custom sketch state instead of scalar counters.
  *
  * Contract (capacity c over a stream of n items):
  *  - every reported item: `cnt_est - err <= true <= cnt_est`
  *  - every item with true frequency > n/c IS in the summary
  *  - while under capacity the summary is exact (`err == 0`)
  *
  * Merge is the summary combine of Agarwal et al., "Mergeable summaries"
  * (PODS 2012): an item absent from one side contributes that side's
  * floor (its min counter, 0 while under capacity) to both the estimate
  * and the error bound, then the union is truncated back to the c largest
  * estimates. Truncation preserves both properties above, so the sketch is
  * safe under Spark's arbitrary partial-aggregation tree: each of 1000
  * executors streams its partitions locally and ships c counters — the
  * shuffle is O(c × partitions), independent of n.
  *
  * Per-update cost is O(log c) via a lazy-deletion min-heap (stale entries
  * are skipped on pop), not the O(c) min-scan of the naive formulation —
  * at 100 TB the update path is the hot loop. Spark keeps the buffer as
  * this JVM object within a partition (ObjectHashAggregate); kryo
  * serialization happens only at the partial→final boundary, and the
  * transient heap is rebuilt lazily after deserialization.
  */
object SpaceSaving {

  final class Entry(var count: Long, var err: Long) extends Serializable

  final class State(val capacity: Int) extends Serializable {
    val items = new java.util.HashMap[String, Entry]()
    // lazy-deletion min-heap of (count-at-push, item); an element is stale
    // when the live count no longer matches. Rebuilt after kryo roundtrip.
    @transient private var heap: mutable.PriorityQueue[(Long, String)] = _

    private def heapRef: mutable.PriorityQueue[(Long, String)] = {
      if (heap == null) {
        heap = mutable.PriorityQueue.empty(Ordering.by[(Long, String), Long](-_._1))
        items.forEach((k, e) => heap.enqueue((e.count, k)))
      }
      heap
    }

    /** Lazy deletion leaves stale entries behind; without a bound the heap
      * grows O(stream length) — an OOM on a long partition. Rebuilding from
      * the live map once the heap passes 8× capacity keeps it O(capacity),
      * amortized O(log c) per update. */
    private def maybeCompact(): Unit =
      if (heap != null && heap.size > 8 * capacity) {
        heap = null
        heapRef
      }

    /** The summary floor: 0 while under capacity, else the min counter —
      * an upper bound on the true count of any ABSENT item. */
    def floor: Long = {
      if (items.size < capacity) return 0L
      val h = heapRef
      while (true) {
        val (c, k) = h.head
        val e = items.get(k)
        if (e != null && e.count == c) return c
        h.dequeue() // stale: item evicted or count since bumped
      }
      0L // unreachable
    }

    def add(item: String, by: Long, addErr: Long): Unit = {
      val e = items.get(item)
      if (e != null) {
        e.count += by; e.err += addErr
        // the heap exists only once eviction pressure is possible; while
        // it does, record the bump (lazily invalidating the old entry)
        if (heap != null) { heap.enqueue((e.count, item)); maybeCompact() }
      } else if (items.size < capacity) {
        items.put(item, new Entry(by, addErr))
        if (heap != null) heap.enqueue((by, item))
      } else {
        // evict the current min; its count is the possible undercount of
        // the replacement (the classic SpaceSaving step)
        val h = heapRef
        var done = false
        while (!done) {
          val (c, k) = h.dequeue()
          val e2 = items.get(k)
          if (e2 != null && e2.count == c) {
            items.remove(k)
            items.put(item, new Entry(c + by, c + addErr))
            h.enqueue((c + by, item))
            done = true
          }
        }
        maybeCompact()
      }
    }
  }

  /** The Aggregator over a string key column. `capacity` bounds state; the
    * caller ranks/limits the exploded output. */
  final class Agg(capacity: Int)
      extends Aggregator[String, State, Seq[HeavyHitter]] {

    def zero: State = new State(capacity)

    def reduce(s: State, item: String): State = { s.add(item, 1L, 0L); s }

    def merge(a: State, b: State): State = {
      val fa = a.floor
      val fb = b.floor
      // union with floor-compensation for one-sided items
      val all = mutable.ArrayBuffer.empty[(String, Long, Long)]
      a.items.forEach { (k, ea) =>
        val eb = b.items.get(k)
        if (eb != null) all += ((k, ea.count + eb.count, ea.err + eb.err))
        else all += ((k, ea.count + fb, ea.err + fb))
      }
      b.items.forEach { (k, eb) =>
        if (!a.items.containsKey(k)) all += ((k, eb.count + fa, eb.err + fa))
      }
      // truncate to the c largest estimates (deterministic tie-break).
      // Dropped items all have count <= the kept minimum, so the floor of
      // the result still upper-bounds every absent item's true count.
      val out = new State(capacity)
      all.sortBy(t => (-t._2, t._1)).take(capacity).foreach {
        case (k, c, e) => out.items.put(k, new Entry(c, e))
      }
      out
    }

    def finish(s: State): Seq[HeavyHitter] = {
      val buf = mutable.ArrayBuffer.empty[HeavyHitter]
      s.items.forEach((k, e) => buf += HeavyHitter(k, e.count, e.err))
      buf.sortBy(h => (-h.cnt_est, h.bigram)).toSeq
    }

    def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    def outputEncoder: Encoder[Seq[HeavyHitter]] =
      ExpressionEncoder[Seq[HeavyHitter]]()
  }
}
