package graft.tools

import org.apache.spark.sql.SparkSession
import graft.rel.{PipelineQueries, Tables}

/** Dev harness: time the declared q126 weighted-Jaccard form against the
  * prefix-filtered variant on the same corpus, interleaved reps, and
  * verify identical output while at it. Run:
  * {{{ sbt "runMain graft.tools.WeightedJaccardAb /root/testdata/sf0.1" }}}
  * Informs whether the declared q126 should route through the pruned
  * candidate path (round-9 perf follow-up).
  */
object WeightedJaccardAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3)
    val (mass, nsh) = PipelineQueries.weightedPairMass(docs, 3)
    val nd = docs.count()
    println(s"pairMass=$mass shingles=$nsh nDocs=$nd massPerDoc=${mass / math.max(1L, nd)}")
    println(s"autoDecision pruned=${PipelineQueries.weightedFormIsPruned(docs, 3)}")
    // warmup both plans once
    PipelineQueries.weightedJaccardPairs(docs, 3, 0.3).count()
    PipelineQueries.weightedJaccardPairsPruned(docs, 3, 0.3).count()
    for (rep <- 1 to reps) {
      time(s"declared rep$rep")(PipelineQueries.weightedJaccardPairs(docs, 3, 0.3).count())
      time(s"pruned   rep$rep")(PipelineQueries.weightedJaccardPairsPruned(docs, 3, 0.3).count())
    }
    val a = PipelineQueries.weightedJaccardPairs(docs, 3, 0.3).collect().map(_.toString).sorted
    val b = PipelineQueries.weightedJaccardPairsPruned(docs, 3, 0.3).collect().map(_.toString).sorted
    println(s"identical=${a.sameElements(b)} pairs=${a.length}")
    spark.stop()
  }
}
