package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Dev harness: sweep IVF-PQ (and IVF) recall vs brute-force cosine top-k
  * across nProbe/rerank at a given SF dir. Run:
  * {{{ sbt "runMain graft.tools.RecallSweep /root/testdata/sf0.1" }}}
  * Informs the recall bound asserted in the q76 spec (VERDICT r5 item 8).
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = graft.rel.Tables.load(spark, dir, "embeddings")
    val qids = (0L until 20L)
    val k = 5
    val bf = Similarity.cosineTopK(embs, "vec_id", "embedding", qids, k)
      .select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"corpus=${embs.count()} bf_pairs=${bf.size}")
    for (nProbe <- Seq(4, 6, 8, 10, 12); rerank <- Seq(8, 16, 32)) {
      val got = Similarity.ivfPqTopK(embs, "vec_id", "embedding", qids, k,
          nProbe = nProbe, rerank = rerank)
        .select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = bf.count(got.contains).toDouble / bf.size
      println(f"IVFPQ nProbe=$nProbe rerank=$rerank recall=$recall%.3f")
    }
    for (nProbe <- Seq(4, 6, 8)) {
      val got = Similarity.ivfTopK(embs, "vec_id", "embedding", qids, k, nProbe = nProbe)
        .select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = bf.count(got.contains).toDouble / bf.size
      println(f"IVF   nProbe=$nProbe recall=$recall%.3f")
    }
    // code-quality A/B with admission removed: nProbe=nCells admits every
    // cell, so recall is purely (codes + rerank); flat PQ (plain codes,
    // full scan) at the same rerank is the plain-code baseline
    for (rerank <- Seq(4, 8, 16)) {
      val res = Similarity.ivfPqTopK(embs, "vec_id", "embedding", qids, k,
          nProbe = 16, rerank = rerank)
        .select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = Similarity.pqTopK(embs, "vec_id", "embedding", qids, k,
          rerank = rerank)
        .select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"CODES rerank=$rerank residual=${bf.count(res.contains).toDouble / bf.size}%.3f" +
        f" plain=${bf.count(plain.contains).toDouble / bf.size}%.3f")
    }
    spark.stop()
  }
}
