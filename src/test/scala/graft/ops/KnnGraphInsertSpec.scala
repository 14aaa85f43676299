package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** Incremental kNN-graph insert (declared q174): recall of the delta
  * placement against a FULL exact rebuild, per-edge distance exactness,
  * the adoption improvement invariant (a base list only ever gets
  * closer), byte-identical pass-through of unaffected rows (the
  * evidence the base corpus was not rebuilt), boundedness of the
  * touched-key set, determinism across partitionings, and the
  * duplicate-twin hand case. The base graph here is the EXACT build so
  * every gate isolates the INSERT machinery from q171's build recall
  * (the declared q174 composes with the approximate build; its fixture
  * oracle covers that composition). */
class KnnGraphInsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val k = 5

  private lazy val emb = Tables.load(spark, dir, "embeddings")
  // ~10% of the corpus arrives as the delta batch
  private def isDelta = pmod(col("vec_id").cast("long"), lit(10L)) === lit(7L)
  private lazy val base = emb.where(!isDelta)
  private lazy val delta = emb.where(isDelta)
  private lazy val baseGraph =
    Similarity.knnGraph(base, "vec_id", "embedding", k)
  private lazy val baseRows = baseGraph.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  private lazy val insertedRows = Similarity.knnGraphInsert(
      baseGraph, base, "vec_id", "embedding",
      delta, "vec_id", "embedding", k).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  private lazy val rebuiltSets = edgeSets(
    Similarity.knnGraph(emb, "vec_id", "embedding", k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
  private lazy val deltaIds = delta.select(col("vec_id").cast("long"))
    .collect().map(_.getLong(0)).toSet

  private def edgeSets(rows: Seq[(Long, Long, Long, Long)]): Map[Long, Set[Long]] =
    rows.groupBy(_._1).map { case (vid, rs) => vid -> rs.map(_._3).toSet }

  test("node coverage and rank shape: every base AND delta node has a " +
    "list, <= k edges, rk contiguous from 1 in (d2, nbr) order") {
    val byNode = insertedRows.groupBy(_._1)
    val allIds = emb.select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(byNode.keySet == allIds,
      s"node sets differ: ${allIds.size} corpus vs ${byNode.keySet.size} graph")
    byNode.foreach { case (vid, rs) =>
      assert(rs.length <= k, s"node $vid has ${rs.length} > $k edges")
      val sorted = rs.sortBy(r => (r._4, r._3))
      assert(sorted.map(_._2).toSeq == (1L to rs.length).toSeq,
        s"node $vid ranks not contiguous in (d2, nbr) order")
    }
  }

  test("delta placement recall vs a FULL exact rebuild >= 0.9 (the walk " +
    "found the true neighborhood through the graph, not a scan)") {
    val ins = edgeSets(insertedRows.toSeq)
    val recalls = deltaIds.toSeq.map { vid =>
      ins(vid).intersect(rebuiltSets(vid)).size.toDouble / rebuiltSets(vid).size
    }
    val mean = recalls.sum / recalls.size
    info(f"delta-node mean recall: $mean%.4f (min ${recalls.min}%.2f)")
    assert(mean >= 0.9, s"delta recall $mean < 0.9")
  }

  test("base adoption recall vs the rebuild >= 0.9: new nodes that " +
    "belong in old lists were adopted into them") {
    val ins = edgeSets(insertedRows.toSeq)
    val recalls = rebuiltSets.keySet.diff(deltaIds).toSeq.map { vid =>
      ins(vid).intersect(rebuiltSets(vid)).size.toDouble / rebuiltSets(vid).size
    }
    val mean = recalls.sum / recalls.size
    info(f"base-node mean recall: $mean%.4f (min ${recalls.min}%.2f)")
    assert(mean >= 0.9, s"base recall $mean < 0.9")
  }

  test("every emitted edge carries the EXACT integer distance") {
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"))
      .as[(Long, Array[Long])].collect().toMap
    val bad = insertedRows.filterNot { case (vid, _, nbr, d2) =>
      val a = vecs(vid); val b = vecs(nbr)
      var s = 0L; var i = 0
      while (i < math.min(a.length, b.length)) {
        val d = a(i) - b(i); s += d * d; i += 1
      }
      s == d2
    }
    assert(bad.isEmpty, s"edges with wrong distances: ${bad.take(3).mkString(", ")}")
  }

  test("adoption only ever improves a base list (worst-d2 weakly " +
    "decreases), the touched-key set is bounded by the delta, and " +
    "untouched rows pass through byte-identically rk included") {
    val before = baseRows.groupBy(_._1)
    val after = insertedRows.filterNot(r => deltaIds(r._1)).groupBy(_._1)
    assert(after.keySet == before.keySet)
    val changed = after.keySet.filter(vid =>
      after(vid).sortBy(_._2).toSeq != before(vid).sortBy(_._2).toSeq)
    changed.foreach { vid =>
      assert(after(vid).map(_._4).max <= before(vid).map(_._4).max,
        s"node $vid got a WORSE worst-distance after adoption")
    }
    val deltaCount = deltaIds.size
    assert(changed.size <= deltaCount * k,
      s"${changed.size} base lists changed > bound ${deltaCount * k} " +
        "(adoption touched more keys than the delta can reach)")
    info(s"changed base lists: ${changed.size} of ${before.size} " +
      s"(bound ${deltaCount * k}); untouched pass through byte-identically")
  }

  test("deterministic: 7-way repartitioned inputs insert to the " +
    "identical graph (walk + exact scans + total-order cuts = pure " +
    "function of (graph, base, delta))") {
    val again = Similarity.knnGraphInsert(
        baseGraph.repartition(7), base.repartition(7), "vec_id", "embedding",
        delta.repartition(7), "vec_id", "embedding", k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq == insertedRows.sorted.toSeq)
  }

  test("chunked backlog insert keeps the single-batch quality gates: " +
    "full node coverage and delta recall >= 0.9 vs the exact rebuild " +
    "when the delta arrives as 3 hash chunks") {
    val rows = Similarity.knnGraphInsertChunked(
        baseGraph, base, "vec_id", "embedding",
        delta, "vec_id", "embedding", k, chunks = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val allIds = emb.select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == allIds)
    val ins = edgeSets(rows.toSeq)
    val recalls = deltaIds.toSeq.map { vid =>
      ins(vid).intersect(rebuiltSets(vid)).size.toDouble / rebuiltSets(vid).size
    }
    val mean = recalls.sum / recalls.size
    info(f"chunked delta-node mean recall: $mean%.4f")
    assert(mean >= 0.9, s"chunked delta recall $mean < 0.9")
  }

  test("chunk chaining: a later chunk's walk sees an earlier chunk's " +
    "nodes (twin pair split across chunks links at d2=0)") {
    import spark.implicits._
    // pick two fresh ids that land in different chunks under the
    // operator's own xxhash64 rule
    val buckets = spark.range(9001, 9041)
      .select(col("id"), pmod(xxhash64(col("id")), lit(2L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val early = buckets.find(_._2 == 0L).get._1
    val late = buckets.find(_._2 == 1L).get._1
    val vec3 = emb.where(col("vec_id").cast("long") === 3L).select(col("embedding"))
    val twins = vec3.select(lit(early).as("vec_id"), col("embedding"))
      .union(vec3.select(lit(late).as("vec_id"), col("embedding")))
    val rows = Similarity.knnGraphInsertChunked(
        baseGraph, base, "vec_id", "embedding",
        twins, "vec_id", "embedding", k, chunks = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.contains((late, early, 0L)),
      s"chunk-1 twin $late did not link to chunk-0 twin $early at d2=0 " +
        "(later chunks must walk the corpus state earlier chunks left)")
    assert(rows.contains((late, 3L, 0L)) && rows.contains((early, 3L, 0L)),
      "both twins must still link to their base original at d2=0")
  }

  test("duplicate-twin hand case: inserting a byte-identical copy of a " +
    "base vector places it at d2=0 on its twin and the twin adopts it " +
    "back at rank 1") {
    val twin = emb.where(col("vec_id").cast("long") === 3L)
      .select(lit(9001L).as("vec_id"), col("embedding"))
    val rows = Similarity.knnGraphInsert(
        baseGraph, base, "vec_id", "embedding",
        twin, "vec_id", "embedding", k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.contains((9001L, 1L, 3L, 0L)),
      "new twin's rank-1 edge is not (3, d2=0)")
    assert(rows.contains((3L, 1L, 9001L, 0L)),
      "base node 3 did not adopt its twin at rank 1")
  }
}
