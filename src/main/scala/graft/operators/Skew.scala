package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose hot keys defeat hash
  * partitioning.
  *
  * AQE's skew-join split (on in the Bench/Verify sessions) handles skew it
  * can *see* — oversized shuffle blocks of a sort-merge join at runtime. It
  * cannot help when the skewed side must be shuffled into an aggregation
  * first, or when the join is planned broadcast-free on a statically
  * mis-estimated side. Salting is the planner-independent fix: split each
  * hot key into `factor` sub-keys, replicate the other side once per
  * sub-key, join on (key, salt). The shuffled volume grows by
  * |small side| × factor — cheap when the small side is a dimension — and
  * the hot key's rows land on `factor` reducers instead of one straggler.
  *
  * Salt assignment is `pmod(hash(idCol), factor)` — deterministic per row
  * (re-runs and retries agree), uniform in expectation, and requires no
  * statistics. At 100 TB the pattern is: detect hot keys (a cheap
  * `groupBy(key).count` sample or a priori knowledge), salt only if needed.
  */
object Skew {

  /** Inner-join `big` with `small` on `keys`, spreading each big-side key
    * over `factor` reducers. `saltOn` must be a big-side column whose
    * per-key distribution is fine-grained enough to split on (a row id,
    * an event id — anything varying within a key).
    *
    * Result equals `big.join(small, keys)` exactly (salting is join-key
    * refinement: (k, s) pairs partition the k-matched row pairs). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltOn: Column, factor: Int = 8): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val salted = big.withColumn("_salt", pmod(hash(saltOn), lit(factor)))
    // replicate the small side once per salt value: |small| × factor rows
    val replicated = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
