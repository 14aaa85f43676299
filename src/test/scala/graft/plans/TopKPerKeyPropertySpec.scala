package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase

/** Randomized equivalence of the custom operator against the
  * Window(row_number) twin over adversarial inputs: duplicate scores
  * (ties broken by the id column), NULL keys (a group of their own, like
  * groupBy), NULL order values (Spark's desc = nulls LAST), k larger than
  * a group, ascending and descending specs. Seed-looped scalacheck (the
  * scalatest bridge artifact is not in the offline cache). */
object TopKPerKeyPropertySpec {
  /** Top-level so Spark can derive an encoder. */
  final case class R(key: Option[String], score: Option[Double], id: Long)
}

class TopKPerKeyPropertySpec extends AnyFunSuite {
  import TopKPerKeyPropertySpec.R
  lazy val spark = SparkTestBase.spark

  private val rowGen: Gen[R] = for {
    key <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
    // tiny score domain forces heavy ties; occasional nulls
    score <- Gen.option(Gen.oneOf(0.0, 1.0, 1.0, 2.0, 3.0))
  } yield R(key, score, 0L)

  private val caseGen: Gen[(List[R], Int, Boolean)] = for {
    rows <- Gen.listOfN(60, rowGen)
    k <- Gen.choose(1, 8) // can exceed a group's size
    desc <- Gen.oneOf(true, false)
  } yield (rows.zipWithIndex.map { case (r, i) => r.copy(id = i.toLong) }, k, desc)

  test("random (rows, k, direction): custom operator set-equals the window twin") {
    import spark.implicits._
    var seed = Seed(77L)
    var i = 0
    while (i < 25) {
      caseGen.apply(Gen.Parameters.default, seed).foreach { case (rows, k, desc) =>
        val df = rows.toDF("key", "score", "id")
        val ord = if (desc) col("score").desc else col("score").asc
        val custom = TopK.perKey(df, Seq("key"), Seq(ord, col("id")), k)
          .select("key", "id").collect()
          .map(r => (Option(r.get(0)), r.getLong(1))).toSet
        val w = Window.partitionBy("key").orderBy(ord, col("id"))
        val twin = df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
          .select("key", "id").collect()
          .map(r => (Option(r.get(0)), r.getLong(1))).toSet
        assert(custom == twin,
          s"seed case $i (k=$k desc=$desc): custom-only=${custom -- twin} " +
            s"twin-only=${twin -- custom} rows=$rows")
      }
      seed = seed.next
      i += 1
    }
  }
}
