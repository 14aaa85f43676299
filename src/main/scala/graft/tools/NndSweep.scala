package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Dev harness: sweep NN-descent (knnGraphApprox) recall-vs-exact and
  * wall time across (iterK, rounds) at a given SF dir. Run:
  * {{{ sbt "runMain graft.tools.NndSweep /root/testdata/sf0.001" }}}
  * Informs the working-list default and the KnnGraphApproxSpec bound
  * (round-13 NN-descent build; the measured table lives in the
  * knnGraphApprox scaladoc). */
object NndSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.rel.Tables.load(spark, dir, "embeddings")
    val k = 5
    val exact = Similarity.knnGraph(emb, "vec_id", "embedding", k)
      .collect().groupBy(_.getLong(0))
      .map { case (v, rs) => v -> rs.map(_.getLong(2)).toSet }
    println(s"corpus=${exact.size}")
    for (kw <- Seq(12, 16, 24); rounds <- Seq(2, 3, 4)) {
      val t0 = System.nanoTime()
      val approx = Similarity.knnGraphApprox(
          emb, "vec_id", "embedding", k, rounds = rounds, iterK = kw)
        .collect().groupBy(_.getLong(0))
        .map { case (v, rs) => v -> rs.map(_.getLong(2)).toSet }
      val secs = (System.nanoTime() - t0) / 1e9
      val recalls = exact.map { case (v, ex) =>
        approx.getOrElse(v, Set.empty[Long]).intersect(ex).size.toDouble / ex.size }
      println(f"NND iterK=$kw rounds=$rounds " +
        f"recall=${recalls.sum / recalls.size}%.4f min=${recalls.min}%.2f " +
        f"t=$secs%.1fs")
    }
    spark.stop()
  }
}
