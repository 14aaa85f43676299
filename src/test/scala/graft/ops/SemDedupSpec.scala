package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** SemDeDup (q102) contract: exact precision, bounded recall vs the
  * brute-force pair set (q44's cosinePairs), determinism.
  *
  * Precision is exact BY CONSTRUCTION (witness cosines are computed on
  * the raw vectors inside the cell join) — the spec re-derives every
  * recorded witness pair against an independent brute-force pass anyway,
  * so a geometry bug in the cell join cannot hide behind its own
  * arithmetic. Recall < 1 comes only from cross-cell pairs; the bound
  * here pins the nCells=16 / 500-vector operating point so a regression
  * in the quantizer or assignment path is visible.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private def embs = Tables.load(spark, SparkTestBase.Sf0001, "embeddings")

  private val tau = 0.4

  /** Exact drop set: v dropped iff some u < v has cos(u,v) >= tau. */
  private def exactDrops(): Map[Long, Long] = {
    import spark.implicits._
    Similarity.cosinePairs(embs, "vec_id", "embedding", tau = tau)
      .groupBy(col("v2")).agg(min(col("v1")).as("w"))
      .as[(Long, Long)].collect().toMap
  }

  private def semResult() = {
    import spark.implicits._
    Similarity.semDedup(embs, "vec_id", "embedding", nCells = 16, minCos = tau)
      .where(col("dropped"))
      .select(col("vec_id"), col("witness"), col("wit_cos"))
      .as[(Long, Long, Double)].collect().toSeq
  }

  test("semDedup: every witness pair is a true >= tau neighbor (precision 1)") {
    import spark.implicits._
    val vecs = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val drops = semResult()
    assert(drops.nonEmpty, "operating point must actually drop something")
    drops.foreach { case (v, w, wc) =>
      assert(w < v, s"witness $w must precede $v")
      val c = cos(vecs(w), vecs(v))
      assert(c >= tau, s"recorded witness ($w,$v) has true cos $c < $tau")
      val r4 = math.floor(c * 10000.0 + 0.5) / 10000.0
      assert(math.abs(r4 - wc) < 1e-9, s"wit_cos mismatch for ($w,$v): $wc vs $r4")
    }
  }

  test("semDedup: recall vs the exact q44 pair set") {
    val exact = exactDrops()
    val got = semResult().map(_._1).toSet
    assert(exact.nonEmpty)
    // semDedup can only drop a vector the exact pass also drops (its
    // witness IS an exact qualifying pair) — assert that containment too
    assert(got.subsetOf(exact.keySet),
      s"dropped vectors not in the exact drop set: ${got.diff(exact.keySet)}")
    val recall = got.size.toDouble / exact.size
    info(f"semDedup recall vs exact: $recall%.3f (${got.size}/${exact.size})")
    // measured 0.935 (58/62) at nCells=16/nProbe=3 on the deterministic
    // sf0.001 corpus; the run is seed-fixed so 0.9 is a real regression
    // bound, not a flake margin
    assert(recall >= 0.9, f"recall $recall%.3f below the pinned 0.9 bound")
  }

  test("semDedup: deterministic across runs") {
    val a = semResult().sortBy(_._1)
    val b = semResult().sortBy(_._1)
    assert(a == b)
  }
}
