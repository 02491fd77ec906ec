package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench driver's compact-alias logic (no Spark). */
class BenchSpec extends AnyFunSuite {

  test("aliases: shortest distinguishing prefix, extended on collision") {
    val a = Bench.aliases(Seq(
      "q_a10_approx_quantiles", "q_a10_exact_percentiles", "q_p1_cdc_parse"))
    assert(a("q_p1_cdc_parse") == "p1")
    assert(a("q_a10_approx_quantiles") == "a10_approx")
    assert(a("q_a10_exact_percentiles") == "a10_exact")
  }

  test("aliases: identical token sequences terminate and fall back to full names") {
    // "q_a_b" and "a_b" strip to the same token sequence — no prefix length
    // can ever separate them; the unbounded loop this pins used to hang here
    val a = Bench.aliases(Seq("q_a_b", "a_b"))
    assert(a("q_a_b") == "q_a_b" && a("a_b") == "a_b")
    assert(a.values.toSet.size == 2)
  }

  test("aliases: prefix-of-another name stays unambiguous") {
    val a = Bench.aliases(Seq("q_x2_minhash_lsh", "q_x2_minhash_lsh_extra"))
    assert(a.values.toSet.size == 2)
  }
}
