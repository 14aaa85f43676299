package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan + wall time for named queries.
  * Usage: runMain graft.PlanProbe <sfDir> <query...> */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val tb = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val build = (System.nanoTime() - tb) / 1e9
      println(s"==== $name ====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"==== $name: $n rows, build $build%.2f s + exec ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
