package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-6 fifth wave: estimator-calibration laws. */
class Round6dOpsSpec extends SparkSpec {

  test("minhash accuracy: estimator error within the binomial bound") {
    val rows = Dedup.minhashAccuracy(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bin = r.getLong(0); val n = r.getLong(1)
      val est = r.getDouble(2); val exact = r.getDouble(3)
      val mae = r.getDouble(4)
      assert(bin >= 0 && bin <= 9 && n > 0)
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      // the bin's mean exact Jaccard must actually lie in the bin
      assert(exact >= bin / 10.0 && exact <= (bin + 1) / 10.0 + 1e-9)
      // per-pair sd of the 64-permutation estimator is sqrt(J(1-J)/64)
      // <= 0.0625; the bin MAE should sit within ~4 sd of it (generous,
      // but a broken hash or off-by-one banding blows straight past)
      val sd = math.sqrt(math.max(exact * (1 - exact), 0.25 / 64) / 64)
      assert(mae <= 4 * sd,
        s"bin $bin: mae $mae exceeds 4*sd ${4 * sd} (exact $exact)")
    }
  }

  test("minhash accuracy: high-similarity bins dominated by planted dups") {
    // every planted perturbation (drop first token) is a true near-dup;
    // the top bin must be populated and near-perfectly estimated
    val top = Dedup.minhashAccuracy(spark, sf())
      .filter(col("bin") === 9L).collect()
    assert(top.length == 1 && top(0).getLong(1) >= 10)
    assert(top(0).getDouble(2) > 0.9 && top(0).getDouble(3) > 0.9)
  }
}
