package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** Beam-search ANN over the kNN graph (declared q169): recall against
  * the exact integer top-k, determinism across input partitionings, and
  * the bounded-state plan contract (no cartesian, queries broadcast). */
class BeamAnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val k = 5

  /** Exact per-query top-k replay with the operator's own integer
    * algebra (micro-quantize, Σ(a−b)², ties by id). */
  private lazy val exact: Map[Long, Seq[Long]] = {
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    (0L until 10L).map { qid =>
      val q = vecs.find(_._1 == qid).get._2
      val ranked = vecs.filter(_._1 != qid).map { case (id, v) =>
        var s = 0L; var i = 0
        val n = math.min(q.length, v.length)
        while (i < n) { val d = q(i) - v(i); s += d * d; i += 1 }
        (s, id)
      }.sortBy(identity).take(k).map(_._2).toSeq
      qid -> ranked
    }.toMap
  }

  test("q169 recall vs the exact top-5 is 1.0 by construction: the seeded " +
    "query node's own out-edges cover k <= graphK") {
    val got = graft.rel.PipelineQueries.q169BeamAnn(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(2)).toSet }
    assert(got.keySet == (0L until 10L).toSet, s"queries missing: ${got.keySet}")
    val recalls = exact.map { case (qid, ex) =>
      got(qid).intersect(ex.toSet).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    info(s"mean recall: $mean (per-query: ${recalls.toSeq.sorted.mkString(", ")})")
    assert(mean == 1.0, s"k <= graphK with the self-seed must be exact " +
      s"(mean recall $mean, per-query: $recalls)")
  }

  test("navigability: with graphK=3 < k=5 the walk must FIND the last two " +
    "neighbors through the graph — recall >= 0.9 on 500 random 64-d vectors") {
    // the honest beam-search probe: the seeded out-edges cover only the
    // top-3, so top-5 recall measures actual graph navigation (entry
    // spread, symmetrized edges, beam budget), not the seed shortcut
    val emb = Tables.load(spark, dir, "embeddings")
    val got = Similarity.beamSearchAnn(emb, "vec_id", "embedding",
      0L until 10L, k, graphK = 3).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (qid, ex) =>
      got(qid).intersect(ex.toSet).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    info(s"mean recall: $mean (per-query: ${recalls.toSeq.sorted.mkString(", ")})")
    assert(mean >= 0.9, s"mean recall $mean < 0.9 (per-query: $recalls)")
  }

  test("out-of-corpus serving variant: external perturbed query vectors " +
    "reach recall >= 0.9 by pure entry-point navigation (no seed), and " +
    "query labels colliding with corpus ids are NOT self-excluded") {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val raw = emb.select(col("vec_id").cast("long"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // external queries = corpus vectors nudged off-lattice on one
    // dimension; qid deliberately REUSES the source corpus id — if the
    // variant wrongly applied the in-corpus self-exclusion, it would
    // drop node i (each query's best match) and recall would collapse
    val qvecs = (0L until 10L).map { i =>
      val v = raw.find(_._1 == i).get._2.clone()
      v(0) += 0.01
      (i, v.toSeq)
    }
    val queries = qvecs.toDF("qid", "qv")
    val got = Similarity.beamSearchAnnVectors(emb, "vec_id", "embedding",
      queries, "qid", "qv", k).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(2)).toSet }
    val corpusQ = raw.map { case (id, v) =>
      (id, v.map(x => math.floor(x * 1e6 + 0.5).toLong)) }
    val recalls = qvecs.map { case (qid, qv) =>
      val q = qv.map(x => math.floor(x * 1e6 + 0.5).toLong).toArray
      val ex = corpusQ.map { case (id, v) =>
        var s = 0L; var i = 0
        val n = math.min(q.length, v.length)
        while (i < n) { val d = q(i) - v(i); s += d * d; i += 1 }
        (s, id)
      }.sortBy(identity).take(k).map(_._2).toSet
      // the nearest corpus vector (the perturbation source, node = qid)
      // must be found: the self-exclusion-leak canary
      assert(got(qid).contains(qid),
        s"query $qid lost its source vector — self-exclusion leaked " +
          s"into the out-of-corpus variant? got ${got(qid)}")
      got(qid).intersect(ex).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    info(s"mean recall: $mean (per-query: ${recalls.sorted.mkString(", ")})")
    assert(mean >= 0.9, s"mean recall $mean < 0.9 (per-query: $recalls)")
  }

  test("deterministic: a 7-way repartitioned corpus walks to the identical " +
    "answer (integer distances + fixed budget = pure corpus function)") {
    val emb = Tables.load(spark, dir, "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.beamSearchAnn(df, "vec_id", "embedding", 0L until 10L, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(emb.repartition(7)) == run(emb))
  }

  test("per-round state is beam-bounded: entry table broadcasts, no " +
    "cartesian against the corpus") {
    // the production path localCheckpoints each round, which truncates
    // lineage to a LogicalRDD and would make this pin vacuous — pass an
    // identity materializer so the executedPlan contains EVERY round's
    // joins (entry scoring + 3 × (adjacency, anti, scoring))
    val emb = Tables.load(spark, dir, "embeddings")
    val df = Similarity.beamSearchAnn(emb, "vec_id", "embedding",
      0L until 10L, k, checkpoint = identity)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"beam search must never cartesian against the corpus:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 8-row entry table must broadcast, not shuffle:\n$p")
    // and the un-checkpointed walk must still reach the checkpointed answer
    val viaIdentity = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val viaCheckpoint = Similarity.beamSearchAnn(emb, "vec_id", "embedding",
      0L until 10L, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(viaIdentity == viaCheckpoint,
      "materialization strategy must not change the trajectory")
  }
}
