package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling rider for the STREAMING index-maintenance path (round-14
  * verdict item 6): the batch verbs q174/q175 carry measured decade
  * rows, but `IndexMaintenance.applyBatch` — the per-micro-batch
  * composition of delete + insert + versioned-state commit — had none.
  * The claim under audit: per-batch cost tracks the DELTA plus the two
  * documented corpus-sized rewrite terms (the O(n·k) edge-table write
  * and the O(n·d) corpus copy — the named lake-format seam, where a
  * real table format's append/delete replaces the copy), never the
  * quadratic rebuild.
  *
  * Protocol, per K ∈ {1, 10} over the [[BenchScalingDeep]] blown-up
  * embeddings (reused from /tmp/graft_scale/K when present, else
  * materialized with the identical recipe):
  *  - seed a fresh stateDir with the auto-built k=3 graph over the
  *    corpus minus the insert slice (offline build — excluded from the
  *    measured number, like every serve-side audit);
  *  - `proportional` mode: one CDC batch deleting the 1-in-24 slice
  *    and inserting the held-out 1-in-24 slice under fresh ids — batch
  *    grows 10× with the corpus (the q174/q175 shape);
  *  - `fixed` mode: the same protocol with a 250+250-row batch at
  *    every K — batch constant, corpus 10×, which ISOLATES the
  *    corpus-sized rewrite terms: whatever growth survives here is the
  *    lake seam's price, not the maintenance verbs'.
  *  - `*_delta` variants: the identical protocol through the delta-log
  *    corpus mode (`compactEvery` high enough that the measured batch
  *    writes only its own rows) — the in-repo answer to the lake seam.
  *    The rewrite-vs-delta gap at each (K, mode) cell is the O(n·d)
  *    corpus copy priced directly; what remains in the delta rows is
  *    the verbs plus the O(n·k) edge-table write.
  *  - `sequence` / `sequence_delta` (opt-in via SPARK_GRAFT_IM_MODES):
  *    six consecutive batches through one stateDir, totaled — the
  *    steady state the single-batch cells can't see, including the
  *    delta mode's compactions (compactEvery = 3) and its chain-fold
  *    reads. This probe is what caught the unmaterialized-fold
  *    regression the applyBatch per-batch checkpoint now prevents.
  *  - `sequence_delta_identity`: the same six-batch delta protocol with
  *    `materializeFold = false` — the documented lake-scale escape where
  *    the resolved fold is never materialized and every verb job re-pays
  *    it as a small-side broadcast join over the base scan (the plan
  *    DeltaCorpusLogSpec pins). Prices that re-fold at both Ks against
  *    the default per-batch materialization. (Measuring this arm is what
  *    exposed that threading `identity` through `checkpoint` — the old
  *    spelling of the escape — nested the walk rounds' plans over the
  *    unmaterialized fold to driver OOM; the escape is now its own knob.)
  *
  * Output: one JSON artifact (SPARK_GRAFT_IM_SCALING_OUT, default
  * im_scaling_r14.json) with rows {k, mode, sec, corpus_rows,
  * batch_rows, corpus_write_bytes, graph_write_bytes} — sec is
  * min-of-reps (SPARK_GRAFT_IM_REPS, default 2; single-shot cells at
  * the driver-loop floor carry ±50% box jitter), bytes are
  * deterministic — canary-bracketed like every bench artifact; merged
  * into the deep-scaling artifact under `riders` by the round script. */
object IndexMaintenanceScaling {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_IM_SCALING_OUT", "im_scaling_r15.json")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_WORK", "/tmp/graft_scale")
    val scales = sys.env.get("SPARK_GRAFT_SCALES")
      .map(_.split(",").flatMap(_.trim.toIntOption).toSeq).getOrElse(Seq(1, 10))
    val reps = sys.env.get("SPARK_GRAFT_IM_REPS").flatMap(_.toIntOption)
      .getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def embeddingsFor(k: Int): DataFrame = {
      if (k == 1) return graft.rel.Tables.load(spark, base, "embeddings")
      val path = s"$work/$k/embeddings.parquet"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        // BenchScalingDeep's recipe verbatim: vec_id shifted per replica
        val t = graft.rel.Tables.load(spark, base, "embeddings")
        val span = t.agg(max(col("vec_id"))).first().getLong(0) + 1L
        (0 until k).map(r => t.withColumn("vec_id",
            col("vec_id") + lit(r.toLong * span)))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    def canary(): Double = graft.BenchUtil.canary()
    def r3(v: Double): String = graft.BenchUtil.r3(v)
    val canaryStart = canary()

    val knownModes =
      Seq("proportional", "fixed", "proportional_delta", "fixed_delta",
        "sequence", "sequence_delta", "sequence_delta_identity")
    val modes = sys.env.get("SPARK_GRAFT_IM_MODES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(knownModes)
    // fail fast on a typo'd mode: startsWith/endsWith dispatch below
    // would otherwise silently run the full-rewrite protocol under the
    // requested label — a corrupt artifact that looks like a measurement
    require(modes.forall(knownModes.contains),
      s"unknown modes ${modes.filterNot(knownModes.contains).mkString(",")}" +
        s" — known: ${knownModes.mkString(",")}")
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]

    /** The SEQUENCE probe: SIX consecutive CDC batches (100 deletes +
      * 100 inserts each, disjoint slices) through one stateDir, totaled
      * — the steady-state cost the single-batch cells can't see, since
      * it includes the delta mode's compactions (compactEvery = 3 →
      * two of the six commits fold the chain into a fresh base) AND its
      * read-side chain folds (batches 2/5 resolve through 2-delta
      * chains). Totals are min-of-reps; bytes are the SUM over the six
      * commits, taken from the same rep that produced the min. */
    def runSequence(k: Int, mode: String): String = {
      val emb = embeddingsFor(k).select(col("vec_id").cast("long"),
        col("embedding")).localCheckpoint()
      val n = emb.count()
      val maxId = emb.agg(max(col("vec_id"))).first().getLong(0)
      val insPool = col("vec_id") >= 1000L && col("vec_id") < 1600L
      val seedCorpus = emb.where(!insPool).localCheckpoint()
      val seedGraph = graft.ops.Similarity
        .knnGraphAuto(seedCorpus, "vec_id", "embedding", 3).localCheckpoint()
      val batches = (0 until 6).map { i =>
        val delSlice = col("vec_id") >= i * 100L && col("vec_id") < (i + 1) * 100L
        val insSlice = col("vec_id") >= 1000L + i * 100L &&
          col("vec_id") < 1000L + (i + 1) * 100L
        seedCorpus.where(delSlice)
            .select(lit("D").as("op"), col("vec_id"), col("embedding"))
          .unionByName(emb.where(insSlice)
            .select(lit("I").as("op"),
              (col("vec_id") + lit(maxId + 1L)).as("vec_id"), col("embedding")))
          .localCheckpoint()
      }
      val compactEvery = if (mode.contains("_delta")) 3 else 0
      // the no-materialize arm (round-14 verdict item 5): the documented
      // lake-scale escape — applyBatch does NOT materialize the resolved
      // chain fold, every verb job re-pays it as a small-side broadcast
      // join over the base scan (the plan DeltaCorpusLogSpec pins).
      // This arm prices that re-fold against the default per-batch
      // materialization at both Ks. (The knob is `materializeFold`, NOT
      // `checkpoint = identity` — the walk rounds keep their
      // materializer; see the applyBatch parameter doc.)
      val matFold = !mode.endsWith("_identity")
      def du(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      var sec = Double.MaxValue
      var corpusBytes = 0L; var graphBytes = 0L
      for (_ <- 1 to reps) {
        val stateDir = java.nio.file.Files
          .createTempDirectory(s"graft-im-seq-$k-$mode").toFile.getAbsolutePath
        graft.streaming.IndexMaintenance.init(stateDir, seedCorpus, seedGraph)
        var repSec = 0.0; var repCorpus = 0L; var repGraph = 0L
        batches.zipWithIndex.foreach { case (b, i) =>
          val t0 = System.nanoTime()
          graft.streaming.IndexMaintenance.applyBatch(b, i.toLong, stateDir, 3,
            compactEvery = compactEvery, materializeFold = matFold)
          repSec += (System.nanoTime() - t0) / 1e9
          val vd = new java.io.File(stateDir, s"v$i")
          repCorpus += du(new java.io.File(vd, "corpus")) +
            du(new java.io.File(vd, "cdelta"))
          repGraph += du(new java.io.File(vd, "graph"))
        }
        // bytes travel with the rep that owns the reported sec: parquet
        // byte counts are not guaranteed rep-identical (task ordering
        // can shift encodings slightly), and pairing min-rep timing
        // with last-rep bytes would misattribute the difference
        if (repSec < sec) {
          sec = repSec; corpusBytes = repCorpus; graphBytes = repGraph
        }
        rm(new java.io.File(stateDir))
      }
      s"""{"k":$k,"mode":"$mode","sec":${r3(sec)},""" +
        s""""corpus_rows":$n,"batch_rows":200,"batches":6,""" +
        s""""corpus_write_bytes":$corpusBytes,"graph_write_bytes":$graphBytes}"""
    }

    for (k <- scales; mode <- modes if mode.startsWith("sequence")) {
      val row = runSequence(k, mode)
      println(s"IMSCALE $row")
      rows += row
    }
    for (k <- scales; mode <- modes if !mode.startsWith("sequence")) {
      val emb = embeddingsFor(k).select(col("vec_id").cast("long"),
        col("embedding")).localCheckpoint()
      val n = emb.count()
      val maxId = emb.agg(max(col("vec_id"))).first().getLong(0)
      // the CDC slices: delete slice lives in the seeded corpus, insert
      // slice is held OUT of it and arrives under fresh ids
      val (delMark, insMark) =
        if (mode.startsWith("proportional"))
          (pmod(col("vec_id"), lit(24L)) === 11L,
            pmod(col("vec_id"), lit(24L)) === 23L)
        else (col("vec_id") < 250L,
          col("vec_id") >= 250L && col("vec_id") < 500L)
      // delta-log variants: the measured batch writes only its own rows
      // (compactEvery far above the single measured commit)
      val compactEvery = if (mode.endsWith("_delta")) 1000 else 0
      val seedCorpus = emb.where(!insMark).localCheckpoint()
      // offline seed build: auto-selected (exact at these n) — NOT the
      // measured quantity, exactly as q172 excludes its amortized build;
      // built ONCE per cell, re-seeded per rep (batch id 0 is idempotent
      // against a used stateDir, so each rep needs a fresh one)
      val seedGraph = graft.ops.Similarity
        .knnGraphAuto(seedCorpus, "vec_id", "embedding", 3).localCheckpoint()
      val batch = seedCorpus.where(delMark)
          .select(lit("D").as("op"), col("vec_id"), col("embedding"))
        .unionByName(emb.where(insMark)
          .select(lit("I").as("op"),
            (col("vec_id") + lit(maxId + 1L)).as("vec_id"), col("embedding")))
        .localCheckpoint()
      val batchRows = batch.count()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      def du(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
      // min-of-reps (bench discipline): single-shot cells at the ~15 s
      // driver-loop floor carry ±50% box jitter — two same-binary runs
      // read 10.2 s and 27.6 s for ONE cell — so the min is the signal
      var sec = Double.MaxValue
      var corpusBytes = 0L; var graphBytes = 0L
      for (_ <- 1 to reps) {
        val stateDir = java.nio.file.Files
          .createTempDirectory(s"graft-im-scale-$k-$mode").toFile.getAbsolutePath
        graft.streaming.IndexMaintenance.init(stateDir, seedCorpus, seedGraph)
        val t0 = System.nanoTime()
        graft.streaming.IndexMaintenance.applyBatch(batch, 0L, stateDir, 3,
          compactEvery = compactEvery)
        val repSec = (System.nanoTime() - t0) / 1e9
        // bytes the commit PERSISTED, split corpus-side vs graph-side —
        // the contention-immune metric that prices the lake seam
        // directly: wall time at this scale is dominated by the verbs'
        // walk joins (corpus-sized compute either way), but the storage
        // churn per batch is exactly what the delta log exists to
        // remove; captured from the SAME rep that owns the reported sec
        // (parquet bytes can wobble slightly with task ordering)
        val v0 = new java.io.File(stateDir, "v0")
        if (repSec < sec) {
          sec = repSec
          corpusBytes = du(new java.io.File(v0, "corpus")) +
            du(new java.io.File(v0, "cdelta"))
          graphBytes = du(new java.io.File(v0, "graph"))
        }
        // reclaim the versioned state (two corpus copies per rep)
        rm(new java.io.File(stateDir))
      }
      val row = s"""{"k":$k,"mode":"$mode","sec":${r3(sec)},""" +
        s""""corpus_rows":$n,"batch_rows":$batchRows,""" +
        s""""corpus_write_bytes":$corpusBytes,"graph_write_bytes":$graphBytes}"""
      println(s"IMSCALE $row")
      rows += row
    }
    val canaryEnd = canary()
    val doc = s"""{"scales":[${scales.mkString(",")}],"reps":$reps,"cpus":$cpus,""" +
      s""""base":"$base","canary":{"start":${r3(canaryStart)},"end":${r3(canaryEnd)}},""" +
      rows.mkString(""""rows":[""", ",", "]}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(s"IM_SCALING_ARTIFACT $out")
    spark.stop()
  }
}
