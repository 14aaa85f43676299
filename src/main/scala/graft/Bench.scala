package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup pass at the smallest SF: JIT + codegen + classloading for
    // every plan shape, so the timed pass measures the queries rather
    // than charging one arbitrary first query with JVM warmup.
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      }
    // stable name order: hash-map iteration order would shuffle which
    // query pays residual warmup/GC, adding cross-run variance
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // n repetitions, median per query: an n=1 timing cannot distinguish a
    // real regression from shuffle/GC jitter at sub-second magnitudes.
    // Repetitions iterate OVER the whole suite (rep-major), not per query,
    // so one rep's GC pause cannot inflate all 3 samples of one query.
    // toIntOption: a malformed env value falls back to the default
    // instead of aborting the whole bench before any query runs
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3))
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      samples(name) = dt :: samples.getOrElse(name, Nil)
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = names.map { case (name, _) => name -> median(samples(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // spread = max-min across reps, the falsifiability bound for regressions
    val spread = names.map { case (name, _) =>
      val xs = samples(name)
      s"\"" + name + "\":" + (xs.max - xs.min)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
