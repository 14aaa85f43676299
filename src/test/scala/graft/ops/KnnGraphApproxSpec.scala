package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** NN-descent approximate kNN graph (declared q171): recall against the
  * exact [[Similarity.knnGraph]], per-edge distance exactness (the
  * approximation is WHICH neighbors, never their distances), determinism
  * across input partitionings, and the bounded-round plan contract. */
class KnnGraphApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val k = 5

  private def edgeSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getLong(0))
      .map { case (vid, rows) => vid -> rows.map(_.getLong(2)).toSet }

  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val exact = edgeSets(
    Similarity.knnGraph(emb, "vec_id", "embedding", k))

  test("recall vs the exact kNN graph >= 0.9 on 500 random 64-d vectors " +
    "(the hardest case: no cluster structure for the descent to exploit)") {
    val approx = edgeSets(
      Similarity.knnGraphApprox(emb, "vec_id", "embedding", k))
    assert(approx.keySet == exact.keySet,
      s"node sets differ: ${exact.keySet.size} exact vs ${approx.keySet.size} approx")
    val recalls = exact.map { case (vid, ex) =>
      approx(vid).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall: $mean%.4f (min ${recalls.min}%.2f, " +
      f"frac>=0.8: ${recalls.count(_ >= 0.8).toDouble / recalls.size}%.3f)")
    assert(mean >= 0.9, s"mean recall $mean < 0.9")
  }

  test("every emitted edge carries the EXACT integer distance: the " +
    "approximation never touches the d2 algebra") {
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"))
      .as[(Long, Array[Long])].collect().toMap
    val bad = Similarity.knnGraphApprox(emb, "vec_id", "embedding", k)
      .collect().filterNot { r =>
        val a = vecs(r.getLong(0)); val b = vecs(r.getLong(2))
        var s = 0L; var i = 0
        while (i < math.min(a.length, b.length)) {
          val d = a(i) - b(i); s += d * d; i += 1
        }
        s == r.getLong(3)
      }
    assert(bad.isEmpty, s"edges with wrong distances: ${bad.take(3).mkString(", ")}")
  }

  test("deterministic: a 7-way repartitioned corpus descends to the " +
    "identical graph (hash-bucket init + integer distances + total-order " +
    "cuts = pure corpus function)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.knnGraphApprox(df, "vec_id", "embedding", k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(emb.repartition(7)) == run(emb))
  }

  test("plan contract: the exploding neighbor-of-neighbor self-join sits " +
    "on width-pinned exchanges (REPARTITION_BY_NUM), no cartesian, and " +
    "the materializer does not change the result") {
    // identity checkpoint exposes the round's plan (localCheckpoint
    // would truncate lineage to LogicalRDD and make the pins vacuous).
    // ONE round only: the incremental descent references its state frame
    // four times per round (fwd, reverse cap, anti-join, union), so an
    // unmaterialized plan grows 4^rounds — one exposed round carries the
    // full join/exchange shape being pinned.
    val df = Similarity.knnGraphApprox(emb, "vec_id", "embedding", k,
      rounds = 1, checkpoint = identity)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"NN-descent must never cartesian:\n${p.take(4000)}")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"the self-join exchanges must be width-pinned against AQE " +
        s"input-byte coalescing:\n${p.take(4000)}")
    val viaIdentity = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val viaCheckpoint = Similarity.knnGraphApprox(emb, "vec_id", "embedding", k,
      rounds = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(viaIdentity == viaCheckpoint,
      "materialization strategy must not change the descent trajectory")
  }
}
