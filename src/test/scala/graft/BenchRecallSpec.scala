package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's serving-quality block: shape, determinism, and a
  * floor — the round-over-round drift detector must itself be stable. */
class BenchRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("recall block is well-formed, deterministic, and above the floor") {
    val a = BenchRecall.block(spark, SparkTestBase.Sf0001)
    val b = BenchRecall.block(spark, SparkTestBase.Sf0001)
    assert(a == b, s"recall block must be a pure corpus function:\n$a\nvs\n$b")
    val re = """"(q\d+|im)":(-?[0-9.]+)""".r
    val vals = re.findAllMatchIn(a).map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(vals.keySet == Set("q169", "q172", "q173", "q76", "im"), a)
    // the serving paths' spec-gated recall floors are 0.9; the block
    // scores the same contracts, so anything below is a real regression
    vals.foreach { case (q, v) =>
      assert(v >= 0.9 && v <= 1.0, s"$q recall $v out of [0.9, 1] in $a")
    }
    assert(a.startsWith(""","recall":{""") && a.endsWith(""","k":5}"""), a)
  }
}
