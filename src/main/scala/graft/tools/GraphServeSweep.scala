package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serve-budget grid over a CACHED graph (the DescentLifecycle /
  * BeamBudgetRuleProbe work-dir parquet) — the cheap experiment that
  * separates graph quality from walk budget at any scale without
  * re-paying a build. Used round 16 to size the budget rule against
  * the MERGED 1.7M graph (the shape the rule must cover: sharded
  * construction is the production build at scale).
  *
  * Knobs: SPARK_GRAFT_GS_GRAPH (work-dir key, required),
  * SPARK_GRAFT_GS_N (corpus size; synth recipe = the probes'),
  * SPARK_GRAFT_GS_DIM, SPARK_GRAFT_GS_GRID
  * (semicolon list of beam,rounds,entries triples, default
  * "64,4,128;96,4,256;128,5,256;192,5,384;256,6,512"),
  * SPARK_GRAFT_LC_WORK (work dir). Prints one line per cell. */
object GraphServeSweep {

  def main(args: Array[String]): Unit = {
    val key = sys.env.getOrElse("SPARK_GRAFT_GS_GRAPH",
      sys.error("SPARK_GRAFT_GS_GRAPH required"))
    val n = sys.env.get("SPARK_GRAFT_GS_N").flatMap(_.toLongOption)
      .getOrElse(1700000L)
    val dim = sys.env.get("SPARK_GRAFT_GS_DIM").flatMap(_.toIntOption)
      .getOrElse(16)
    val grid = sys.env.getOrElse("SPARK_GRAFT_GS_GRID",
      "64,4,128;96,4,256;128,5,256;192,5,384;256,6,512")
      .split(";").toSeq.map { c =>
        val Array(b, r, e) = c.split(",").map(_.trim.toInt); (b, r, e)
      }
    val workDir = sys.env.getOrElse("SPARK_GRAFT_LC_WORK", "/tmp/graft_lc")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val serveK = 5
    val qids = 0L until 10L

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (2048L << 20).toString)
      .config("spark.cleaner.periodicGC.interval", "90s")
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.range(0L, n).toDF("vec_id")
      .select(col("vec_id"), expr(
        s"transform(sequence(0, ${dim - 1}), j -> " +
          s"pmod(xxhash64(vec_id * $dim + j), 1000000L) / 1000000.0)")
        .as("embedding")).localCheckpoint()
    val quantExpr = "transform(CAST(embedding AS ARRAY<DOUBLE>), " +
      "x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))"
    val queries = emb.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), expr(quantExpr).as("qv"))
    val scored = emb
      .select(col("vec_id").as("cand"), expr(quantExpr).as("v"))
      .join(broadcast(queries), col("cand") =!= col("qid"))
      .select(col("qid"), col("cand"),
        expr("aggregate(zip_with(qv, v, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, x) -> acc + x)").as("d2"))
    val exact = graft.plans.TopK.perKey(scored, Seq("qid"),
        Seq(col("d2").asc, col("cand").asc), serveK)
      .select("qid", "cand").collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    println(s"SWEEP exact oracle ready over n=$n")

    val g = spark.read.parquet(new java.io.File(workDir, key).getAbsolutePath)
      .localCheckpoint()
    for ((b, r, e) <- grid) {
      val t0 = System.nanoTime()
      val got = graft.ops.Similarity.beamSearchAnnOnGraph(
          g, emb, "vec_id", "embedding", qids, serveK,
          beamWidth = b, rounds = r, entries = e)
        .select(col("qid").cast("long"), col("nbr").cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val rec = exact.map { case (q, ex) =>
        ex.intersect(got.getOrElse(q, Set.empty)).size.toDouble / serveK
      }.sum / exact.size
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SWEEP key=$key beam=$b rounds=$r entries=$e " +
        f"recall=$rec%.3f t=$sec%.1fs")
    }
    spark.stop()
  }
}
