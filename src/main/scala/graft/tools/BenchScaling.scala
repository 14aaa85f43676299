package graft.tools

import org.apache.spark.sql.SparkSession

/** Cross-SF scaling audit — the measured counterpart of SURVEY §9's
  * argued plan shapes: run every declared query at sf0.01 AND sf0.1 in
  * ONE JVM and report each query's time ratio against the 10× data
  * ratio. A query whose ratio exceeds the data ratio is superlinear —
  * hidden pair-space growth, a sort outgrowing its partition, or a
  * driver-side bottleneck — exactly the defect class that stays
  * invisible at a single SF. Sub-second-at-sf0.01 queries are mostly
  * fixed-overhead there (job scheduling, not data), so the audit flags
  * on ratio > 10 ONLY when the sf0.1 time is ≥ 0.75 s — a 0.05 s → 0.6 s
  * "ratio 12" is scheduling noise, not a scaling defect; the JSON still
  * records every ratio for the table.
  *
  * Output: `BENCH_SCALING_r10.json` artifact (written to the repo root
  * or `SPARK_GRAFT_SCALING_OUT`) + per-query `SCALEQ` lines + a flagged
  * summary, with the Bench canary bracketing the run so machine drift is
  * visible in the artifact.
  */
object BenchScaling {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "BENCH_SCALING_r10.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(o => o.contains(n.takeWhile(_ != '_'))) }

    def canary(): Double = graft.BenchUtil.canary()

    // JIT/codegen warmup on the smallest SF (the Bench recipe)
    names.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }
    val canaryStart = canary()

    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(2))
    def measure(dir: String): Map[String, Double] = {
      val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      for (_ <- 1 to reps; (name, fn) <- names) {
        val t0 = System.nanoTime()
        try {
          fn(spark, dir).count()
          samples(name) = (System.nanoTime() - t0) / 1e9 :: samples.getOrElse(name, Nil)
        } catch { case _: Throwable => samples(name) = List(-1.0) }
      }
      samples.view.mapValues(xs => if (xs.contains(-1.0)) -1.0 else xs.min).toMap
    }
    // min-of-reps, not median: the audit wants each query's intrinsic
    // cost at each SF, and min is the jitter-robust estimator for that.
    // Three SFs spanning two decades let the audit decompose each query
    // into fixed overhead + marginal data cost (see below) instead of
    // reading one ratio.
    val t0001 = measure("/root/testdata/sf0.001")
    val t001 = measure("/root/testdata/sf0.01")
    val t01 = measure("/root/testdata/sf0.1")
    val canaryEnd = canary()

    def r3(v: Double): String = graft.BenchUtil.r3(v)
    case class RowR(name: String, t1: Double, a: Double, b: Double,
                    ratio: Double, marginal: Double, fixed: Double, flagged: Boolean)
    val rows = names.map { case (name, _) =>
      val t1 = t0001.getOrElse(name, -1.0)
      val a = t001.getOrElse(name, -1.0)
      val b = t01.getOrElse(name, -1.0)
      val ratio = if (a > 0 && b > 0) b / a else -1.0
      // Two-point decomposition on the 10x span sf0.01 -> sf0.1 under a
      // linear model t(d) = fixed + slope*d: the sf0.1 time splits into
      // marginal (data-driven) and fixed (scheduling/planning) parts:
      //   slope*0.1 = (b - a) * 10/9, fixed = b - slope*0.1.
      // marginal ~= b and fixed ~= 0 means the query is data-bound (the
      // scale-out story carries it); fixed ~= b means it is
      // overhead-bound at this toy size (and the ratio is meaningless).
      val marginal = if (a > 0 && b > 0) math.max(0.0, (b - a) * 10.0 / 9.0) else -1.0
      val fixed = if (marginal >= 0) math.max(0.0, b - marginal) else -1.0
      RowR(name, t1, a, b, ratio, marginal, fixed, ratio > 10.0 && b >= 0.75)
    }
    rows.foreach { r =>
      println(s"""SCALEQ {"name":"${r.name}","sf0001":${r3(r.t1)},"sf001":${r3(r.a)},"sf01":${r3(r.b)},""" +
        s""""ratio":${r3(r.ratio)},"marginal":${r3(r.marginal)},"fixed":${r3(r.fixed)},"flagged":${r.flagged}}""")
    }
    val flagged = rows.filter(_.flagged)
    println(s"FLAGGED ${flagged.length}: ${flagged.map(_.name).mkString(", ")}")
    val json = rows.sortBy(-_.ratio).map { r =>
      s""""${r.name}":{"sf0001":${r3(r.t1)},"sf001":${r3(r.a)},"sf01":${r3(r.b)},"ratio":${r3(r.ratio)},""" +
        s""""marginal":${r3(r.marginal)},"fixed":${r3(r.fixed)},"flagged":${r.flagged}}"""
    }.mkString("{", ",", "}")
    val doc = s"""{"data_ratio":10.0,"reps":$reps,"cpus":$cpus,""" +
      s""""canary":{"start":${r3(canaryStart)},"end":${r3(canaryEnd)}},""" +
      s""""n_flagged":${flagged.length},""" +
      s""""flagged":[${flagged.map(f => s""""${f.name}"""").mkString(",")}],""" +
      s""""queries":$json}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(s"SCALING_ARTIFACT $out")
    spark.stop()
  }
}
