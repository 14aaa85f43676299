package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** kNN-graph shard merge (declared q177): recall against the exact
  * UNION graph, the naive-union straw man (why a merge step exists at
  * all), per-edge distance exactness, warm-start round advantage over a
  * from-scratch build, and cross-partitioning determinism. */
class KnnGraphMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val k = 5

  private def edgeSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getLong(0))
      .map { case (vid, rows) => vid -> rows.map(_.getLong(2)).toSet }

  private def recallVs(exact: Map[Long, Set[Long]],
                       got: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (vid, ex) =>
      got.getOrElse(vid, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    rs.sum / rs.size
  }

  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val shardA = emb.where(pmod(col("vec_id").cast("long"), lit(2L)) === 0L)
  private lazy val shardB = emb.where(pmod(col("vec_id").cast("long"), lit(2L)) =!= 0L)
  private lazy val gA = Similarity.knnGraphApprox(shardA, "vec_id", "embedding", k)
    .localCheckpoint()
  private lazy val gB = Similarity.knnGraphApprox(shardB, "vec_id", "embedding", k)
    .localCheckpoint()
  private lazy val exactUnion = edgeSets(
    Similarity.knnGraph(emb, "vec_id", "embedding", k))
  private lazy val merged = Similarity.knnGraphMerge(gA, gB,
    emb, "vec_id", "embedding", k).localCheckpoint()

  test("merged index recall vs the exact UNION graph >= 0.9; the naive " +
    "edge-table union is NOT an index (zero cross-shard edges)") {
    val m = edgeSets(merged)
    assert(m.keySet == exactUnion.keySet,
      s"node sets differ: ${exactUnion.keySet.size} exact vs ${m.keySet.size} merged")
    val mergedRecall = recallVs(exactUnion, m)
    // straw man: union the two edge tables untouched and measure it as
    // if it were the index
    val naive = edgeSets(gA.union(gB))
    val naiveRecall = recallVs(exactUnion, naive)
    info(f"merged recall: $mergedRecall%.4f, naive-union recall: $naiveRecall%.4f")
    assert(mergedRecall >= 0.9, s"merged recall $mergedRecall < 0.9")
    assert(naiveRecall < 0.75,
      s"straw man too strong ($naiveRecall): the half-shard split no longer " +
        "demonstrates the cross-shard gap")
    assert(mergedRecall > naiveRecall + 0.15,
      "the merge must close a real cross-shard gap")
  }

  test("every merged edge carries the EXACT integer distance") {
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"))
      .as[(Long, Array[Long])].collect().toMap
    val bad = merged.collect().filterNot { r =>
      val a = vecs(r.getLong(0)); val b = vecs(r.getLong(2))
      var s = 0L; var i = 0
      while (i < math.min(a.length, b.length)) {
        val d = a(i) - b(i); s += d * d; i += 1
      }
      s == r.getLong(3)
    }
    assert(bad.isEmpty, s"edges with wrong distances: ${bad.take(3).mkString(", ")}")
  }

  test("warm start pays: at the SAME round budget the merge beats a " +
    "from-scratch descent on the union corpus") {
    val rounds = 2
    val warm = recallVs(exactUnion, edgeSets(Similarity.knnGraphMerge(
      gA, gB, emb, "vec_id", "embedding", k, rounds = rounds)))
    val cold = recallVs(exactUnion, edgeSets(Similarity.knnGraphApprox(
      emb, "vec_id", "embedding", k, rounds = rounds)))
    info(f"rounds=$rounds%d: warm (merge) $warm%.4f vs cold (from scratch) $cold%.4f")
    assert(warm > cold,
      f"warm start must dominate at equal budget: $warm%.4f <= $cold%.4f")
  }

  test("deterministic: a 7-way repartitioned union corpus merges to the " +
    "identical graph") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.knnGraphMerge(gA, gB, df, "vec_id", "embedding", k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(emb.repartition(7)) == run(emb))
  }
}
