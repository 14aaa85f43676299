package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev harness: navigability recall (graphK < k) and steady-state job
  * count of the beam walk across (entries, rounds, beamWidth) budgets —
  * the cost model behind the landmark-entry default (round-13 item 5).
  * Run: {{{ sbt "runMain graft.tools.BeamBudgetSweep /root/testdata/sf0.001" }}}
  *
  * SPARK_GRAFT_SWEEP_N=20000 swaps the corpus for n DETERMINISTIC
  * synthetic uniform 64-d vectors (the KnnGraphApproxSpec worst case, a
  * decade+ above the 2k table) — the round-14 landmark probe: the
  * replica blow-up corpus is DEGENERATE for navigability (every query's
  * top-k are its own byte-identical twins, recall 1.0 at any budget),
  * so the decade extension needs distinct points. */
object BeamBudgetSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = (sys.env.get("SPARK_GRAFT_SWEEP_N").flatMap(_.toLongOption) match {
      case Some(n) =>
        // hash-mixed uniform doubles in [0,1): distinct, deterministic,
        // structureless — the hardest corpus for a graph walk
        spark.range(n).toDF("vec_id")
          .select(col("vec_id"), expr(
            "transform(sequence(0, 63), j -> " +
              "pmod(xxhash64(vec_id * 64 + j), 1000000L) / 1000000.0)")
            .as("embedding"))
      case None => graft.rel.Tables.load(spark, dir, "embeddings")
    }).localCheckpoint()
    val k = 5
    val qids = 0L until 10L
    // exact integer top-k (the BeamAnnSpec oracle)
    val vecs = emb.select(col("vec_id").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val exact = qids.map { qid =>
      val q = vecs.find(_._1 == qid).get._2
      qid -> vecs.filter(_._1 != qid).map { case (id, v) =>
        var s = 0L; var i = 0
        val n = math.min(q.length, v.length)
        while (i < n) { val d = q(i) - v(i); s += d * d; i += 1 }
        (s, id)
      }.sortBy(identity).take(k).map(_._2).toSet
    }.toMap
    for (entries <- Seq(8, 32, 64, 128); rounds <- Seq(1, 2, 3, 4);
         beam <- Seq(16, 32)) {
      val group = s"bw-$entries-$rounds-$beam"
      spark.sparkContext.setJobGroup(group, group, false)
      val t0 = System.nanoTime()
      val got =
        try Similarity.beamSearchAnn(emb, "vec_id", "embedding", qids, k,
            graphK = 3, beamWidth = beam, rounds = rounds, entries = entries)
          .collect().groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
        finally spark.sparkContext.clearJobGroup()
      val secs = (System.nanoTime() - t0) / 1e9
      val (jobs, _) = graft.BenchUtil.pollQuiescent(
        () => spark.sparkContext.statusTracker.getJobIdsForGroup(group).length,
        minValue = 1)
      val recalls = exact.map { case (q, ex) =>
        got.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / k }
      println(f"BEAM entries=$entries rounds=$rounds beam=$beam " +
        f"recall=${recalls.sum / recalls.size}%.3f jobs=$jobs t=$secs%.1fs")
    }
    spark.stop()
  }
}
