package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** The measured build-selection rule (SURVEY §9: exact ~1.1 ns/pair vs
  * NN-descent ~118 ns/pair-eval ⇒ crossover n ≈ 8×10⁵): below the bound
  * [[Similarity.knnGraphAuto]] runs the exact tile scan — faster AND
  * exact there — above it the sub-quadratic descent. Both arms share
  * one output contract, and the descent's early exit keeps the result a
  * pure corpus function at any round budget. */
class KnnGraphAutoSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val k = 3

  private lazy val emb = Tables.load(spark, dir, "embeddings")

  test("below the crossover the auto build IS the exact scan, " +
    "bit-identical edge table") {
    assert(emb.count() <= Similarity.KnnBuildCrossover)
    val auto = Similarity.knnGraphAuto(emb, "vec_id", "embedding", k)
      .collect().map(_.toSeq).toSeq
    val exact = Similarity.knnGraph(emb, "vec_id", "embedding", k)
      .collect().map(_.toSeq).toSeq
    assert(auto == exact)
  }

  test("both arms share one output contract: schema, node set, per-edge " +
    "integer-distance exactness, rk in 1..k") {
    val exact = Similarity.knnGraph(emb, "vec_id", "embedding", k)
    val descent = Similarity.knnGraphApprox(emb, "vec_id", "embedding", k)
    // names + types (nullability is a plan artifact, not a contract)
    assert(exact.schema.map(f => (f.name, f.dataType)) ==
      descent.schema.map(f => (f.name, f.dataType)),
      s"arm schemas diverge: ${exact.schema} vs ${descent.schema}")
    val e = exact.collect(); val d = descent.collect()
    assert(e.map(_.getLong(0)).toSet == d.map(_.getLong(0)).toSet,
      "both arms must cover the full node set")
    // shared-edge distances agree exactly (descent never approximates d2)
    val ed = e.map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val mismatched = d.filter { r =>
      ed.get((r.getLong(0), r.getLong(2))).exists(_ != r.getLong(3))
    }
    assert(mismatched.isEmpty)
    assert(d.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= k))
  }

  test("knownCount short-circuits the arm choice without a count job " +
    "(and a fake above-crossover count really selects the descent)") {
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"))
      .as[(Long, Array[Long])].localCheckpoint()
    val viaExact = Similarity.knnGraphAutoFromQuantized(vecs, k,
      knownCount = Similarity.KnnBuildCrossover)
    val viaDescent = Similarity.knnGraphAutoFromQuantized(vecs, k,
      knownCount = Similarity.KnnBuildCrossover + 1)
    // arm identity shows up as exactness: the descent on 500 random
    // vectors is NOT expected to be bit-equal to the exact scan, while
    // the exact arm must be
    val exact = Similarity.knnGraphFromQuantized(vecs, k)
      .collect().map(_.toSeq).toSeq
    assert(viaExact.collect().map(_.toSeq).toSeq == exact)
    val descent = Similarity.knnGraphApproxFromQuantized(vecs, k)
      .collect().map(_.toSeq).toSeq
    assert(viaDescent.collect().map(_.toSeq).toSeq == descent)
  }

  test("descent round-count invariance: once the fresh-candidate frontier " +
    "empties, extra rounds change NOTHING (deterministic early exit) — and " +
    "a tiny corpus converges well before a generous budget") {
    import spark.implicits._
    // 40 nodes in 4 well-separated clusters: the descent converges in a
    // round or two, so rounds=4 and rounds=12 must emit the identical
    // graph — pre-early-exit the extra rounds were pure waste; with it
    // they are FREE, and determinism demands the same bytes either way
    val tiny = (0 until 40).map { i =>
      val c = i % 4
      (i.toLong, (0 until 8).map(j =>
        c * 10.0 + math.sin(i * 13 + j * 5) * 0.3).toArray)
    }.toDF("vec_id", "embedding")
    val g4 = Similarity.knnGraphApprox(tiny, "vec_id", "embedding", k,
      rounds = 4).collect().map(_.toSeq).toSeq
    val g12 = Similarity.knnGraphApprox(tiny, "vec_id", "embedding", k,
      rounds = 12).collect().map(_.toSeq).toSeq
    assert(g4 == g12, "round budget must not leak into a converged result")
    // and on the 500-vector table the declared budget (4) still equals
    // a +2 budget run ONLY if converged — we assert nothing there; what
    // we pin instead is that early exit never fires on round 1 semantics:
    // the result still beats init-only recall (a frozen-at-init bug
    // would collapse recall to ~0.07, caught by KnnGraphApproxSpec)
  }
}
