package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-more-decade scaling audit for the five heaviest scalers
  * (round-10 verdict item 4): q06 range join, q23 near-dup Jaccard,
  * q126 weighted Jaccard, q130 source overlap, q164 association rules.
  *
  * `BenchScaling` measures sf0.001 → sf0.01 → sf0.1; this tool
  * synthesizes sf1-equivalent inputs by unioning the sf0.1 tables K ∈
  * {2, 4, 10} times (the round-4 q23 recipe) with id-domain remapping:
  *
  *  - documents: doc_id shifted per replica, text byte-identical — so
  *    true duplicate groups grow to size K and the TRUE PAIR count grows
  *    ~K² by construction. That is deliberate: the prune claims under
  *    audit say runtime tracks the PAIR count (candidates ∝ true pairs),
  *    not the corpus square, so the table reports time against measured
  *    output pairs, the `ratio-vs-pair-count` evidence.
  *  - events: event_id AND user_id shifted per replica — K× users at the
  *    same per-user density, the natural decade for a range join whose
  *    pair space is Σ_user (events in window)².
  *  - lineitem: l_orderkey shifted per replica (K× baskets over the SAME
  *    part/brand catalog — q164's pair space is catalog-bounded).
  *  - part: written through unchanged (the catalog).
  *
  * Output: `BENCH_SCALING_DEEP_r12.json` (override with
  * SPARK_GRAFT_SCALING_DEEP_OUT) with per-query rows
  * {K, seconds, output rows} + derived per-pair and per-K ratios, plus
  * SCALEDEEP progress lines; canary-bracketed like every bench artifact.
  */
object BenchScalingDeep {

  private val Targets = Seq(
    "q06_range_join", "q23_dedup_near_jaccard", "q126_weighted_jaccard",
    "q130_source_overlap", "q164_association_rules",
    // round-11 second wave: the ANN/embedding family, whose 100-TB
    // claims (cells prune the scan, codes compress it, SemDeDup cells
    // bound the pair space) were argued and spec'd but never MEASURED
    // at a blow-up. embeddings replicate byte-identically (vec_id
    // shifted), so every vector gains K-1 exact duplicates: the
    // adversarial case for semantic dedup. q157 is the deliberate
    // quadratic EXACT baseline (single broadcast tile at this scale -
    // streamed n x tile n pair work) the pruned paths are judged
    // against.
    "q55_ann_ivf", "q76_ann_ivfpq", "q102_semdedup", "q157_knn_graph",
    // round 12: graph-traversal ANN. The claim under audit is the
    // serving-side split: the kNN-graph BUILD is the quadratic kernel
    // (q157's, amortized once per corpus) while the walk itself is
    // |Q|-bounded — so q169's time should track q157's build curve and
    // the gap between them (the walk) should stay flat across K
    "q169_beam_ann",
    // round 13: the sub-quadratic replacement for the build half. The
    // claim under audit: NN-descent's per-decade growth is O(n·kw²) —
    // near-linear with the mild log² working-width term — and must sit
    // WELL under q157's quadratic curve at K=10, or the "feasible at
    // 10⁹ vectors" story has no measurement behind it. q172 rides along
    // to price the SERVED walk (build amortized to its first K-run via
    // the ModelStore graph parquet).
    "q171_knn_graph_approx", "q172_beam_ann_served",
    // round 13 second wave: incremental insert. The claim under audit:
    // insert cost tracks the DELTA (walk placement + m² intra-batch +
    // m·k adoption), not the corpus — the replicated embeddings keep
    // the 11:1 base/delta split at every K, so both halves grow 10×
    // across the decade and the ratio prices maintenance vs the q171
    // full rebuild it replaces
    "q174_knn_graph_insert",
    // the retraction verb: delete cost must track the batch (drops +
    // torn-list walk repair), not the corpus — the 1-in-12 slice and
    // the corpus grow 10× together across the decade
    "q175_knn_graph_delete",
    // the compaction verb: the merge is warm-started NN-descent at
    // rounds=3 over the union, so its decade growth must track q171's
    // sub-quadratic curve (shard builds amortize via ModelStore after
    // the first K-run) — NOT the q157 quadratic rebuild a naive
    // re-index would pay
    "q177_knn_graph_merge")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALING_DEEP_OUT", "BENCH_SCALING_DEEP_r14.json")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_WORK", "/tmp/graft_scale")
    val scales = sys.env.get("SPARK_GRAFT_SCALES")
      .map(_.split(",").flatMap(_.trim.toIntOption).toSeq).getOrElse(Seq(1, 2, 4, 10))
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(2))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_SCALING_TARGETS=q169,q157 restricts to the named qNN
    // prefixes (single-family re-measures without the full 4-decade run)
    val targetFilter = sys.env.get("SPARK_GRAFT_SCALING_TARGETS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val activeTargets = Targets.filter(t =>
      targetFilter.forall(f => f.contains(t.takeWhile(_ != '_'))))
    // fail fast on a typo'd / full-name filter token: an empty or
    // partially-matched selection would run a subset (or NOTHING) and
    // overwrite the committed artifact at `out` with it
    targetFilter.foreach { f =>
      val unmatched = f.filterNot(tok => Targets.exists(_.startsWith(tok + "_")))
      require(unmatched.isEmpty,
        s"SPARK_GRAFT_SCALING_TARGETS tokens match no target qNN prefix: " +
          s"${unmatched.mkString(",")} (targets: ${Targets.mkString(",")})")
      require(sys.env.contains("SPARK_GRAFT_SCALING_DEEP_OUT"),
        "a filtered run must set SPARK_GRAFT_SCALING_DEEP_OUT — the default " +
          s"path would overwrite the committed full artifact with a subset")
    }
    val queries = graft.SparkEntry.queries.filter { case (n, _) => activeTargets.contains(n) }
    require(queries.size == activeTargets.size,
      s"missing targets: ${activeTargets.diff(queries.keys.toSeq)}")

    /** Materialize the K-times-unioned tables under `work/K/`. Ids shift
      * by replica so every table keeps a dense, collision-free key
      * domain; parquet written from the NORMALIZED load (Tables.load), so
      * timestamps round-trip as plain TIMESTAMP. */
    def materialize(k: Int): String = {
      val dir = s"$work/$k"
      def shifted(name: String, idCols: Seq[String]): DataFrame = {
        val t = graft.rel.Tables.load(spark, base, name)
        val spans = idCols.map(c =>
          c -> (t.agg(max(col(c))).first().getLong(0) + 1L)).toMap
        (0 until k).map { r =>
          idCols.foldLeft(t) { (df, c) =>
            df.withColumn(c, col(c) + lit(r.toLong * spans(c)))
          }
        }.reduce(_ unionByName _)
      }
      // Provenance tag: base path + per-file (size, mtime) of every base
      // table. A work dir built from a DIFFERENT base (other SF dir, or
      // the same path regenerated between rounds) is wiped and rebuilt
      // whole — per-table reuse across bases would silently mix corpora
      // and publish audit ratios computed on inconsistent inputs.
      val baseTag = {
        val files = Seq("documents", "events", "lineitem", "part", "embeddings")
          .map { t =>
            val f = new java.io.File(s"$base/$t.parquet")
            s"$t=${f.length}:${f.lastModified}"
          }
        s"$base|${files.mkString(",")}"
      }
      val tagFile = java.nio.file.Paths.get(s"$dir/_BASE")
      val tagMatches = java.nio.file.Files.exists(tagFile) &&
        java.nio.file.Files.readString(tagFile) == baseTag
      if (!tagMatches) {
        // different (or unknown) provenance: start the dir over
        val d = new java.io.File(dir)
        if (d.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
          }
          rm(d)
        }
        d.mkdirs()
      }
      // per-table done markers: lets a new target family back-fill its
      // table into dirs an earlier SAME-BASE run already materialized
      def ensure(name: String)(build: => DataFrame): Unit = {
        if (!new java.io.File(s"$dir/$name.parquet/_SUCCESS").exists())
          build.write.mode("overwrite").parquet(s"$dir/$name.parquet")
      }
      ensure("documents")(shifted("documents", Seq("doc_id")))
      ensure("events")(shifted("events", Seq("event_id", "user_id")))
      ensure("lineitem")(shifted("lineitem", Seq("l_orderkey")))
      ensure("part")(graft.rel.Tables.load(spark, base, "part"))
      ensure("embeddings")(shifted("embeddings", Seq("vec_id")))
      java.nio.file.Files.writeString(tagFile, baseTag)
      dir
    }

    def canary(): Double = graft.BenchUtil.canary()
    def r3(v: Double): String = graft.BenchUtil.r3(v)

    // JIT/codegen warmup on the smallest SF (the Bench recipe)
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }
    val canaryStart = canary()

    case class Obs(name: String, k: Int, sec: Double, rows: Long)
    val obs = scala.collection.mutable.ArrayBuffer.empty[Obs]
    for (k <- scales) {
      val dir = if (k == 1) base else materialize(k)
      for ((name, fn) <- queries.toSeq.sortBy(_._1)) {
        var best = Double.MaxValue
        var rows = -1L
        var failed = false
        for (_ <- 1 to reps) {
          val t0 = System.nanoTime()
          try {
            rows = fn(spark, dir).count()
            // min over SUCCESSFUL reps only: a transient failure must not
            // poison later good samples (the old best = -1.0 sentinel made
            // math.min(-1, t) stick at -1 forever — round-12 ADVICE)
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            println(s"SCALEDEEP_ERR $name k=$k ${e.getMessage}"); failed = true }
        }
        if (best == Double.MaxValue) best = -1.0
        if (failed && best > 0)
          println(s"SCALEDEEP_NOTE $name k=$k best taken over successful reps only")
        obs += Obs(name, k, best, rows)
        println(s"""SCALEDEEP {"name":"$name","k":$k,"sec":${r3(best)},"rows":$rows}""")
      }
    }
    val canaryEnd = canary()

    // Per query: time and pair(row) growth vs K, and the time-per-pair
    // trend (flat or falling = runtime tracks the pair count; rising =
    // superlinear in pairs, the defect the audit hunts).
    val json = activeTargets.map { name =>
      val series = obs.filter(_.name == name).sortBy(_.k)
      val base1 = series.find(_.k == 1)
      val rowsJson = series.map { o =>
        val tRatio = base1.filter(b => b.sec > 0 && o.sec > 0).map(b => o.sec / b.sec)
        val rRatio = base1.filter(b => b.rows > 0 && o.rows >= 0)
          .map(b => o.rows.toDouble / b.rows)
        s"""{"k":${o.k},"sec":${r3(o.sec)},"rows":${o.rows}""" +
          tRatio.map(t => s""","t_ratio":${r3(t)}""").getOrElse("") +
          rRatio.map(t => s""","rows_ratio":${r3(t)}""").getOrElse("") +
          tRatio.flatMap(t => rRatio.filter(_ > 0).map(rr =>
            s""","t_per_rows":${r3(t / rr)}""")).getOrElse("") + "}"
      }.mkString("[", ",", "]")
      s""""$name":$rowsJson"""
    }.mkString("{", ",", "}")
    val doc = s"""{"scales":[${scales.mkString(",")}],"reps":$reps,"cpus":$cpus,""" +
      s""""base":"$base","canary":{"start":${r3(canaryStart)},"end":${r3(canaryEnd)}},""" +
      s""""queries":$json}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(s"SCALING_DEEP_ARTIFACT $out")
    spark.stop()
  }
}
