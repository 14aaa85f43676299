package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the unigram-LM distributed EM arm AT its production bound
  * (round-15 verdict item 6): `Unigram.learnVocab` routes to the
  * driver-local arm at or below `driverWordBound` (200k distinct
  * words) and to the distributed EM above it, but every declared query
  * (q181 at any gate SF) sits far below the bound — the distributed
  * arm had venue-parity specs at toy scale and no measured row at a
  * word table that actually crosses the bound.
  *
  * Corpus: synthetic hash-mixed words (`w<base36>` over a configured
  * vocabulary), assembled 20 words per document — the blow-up recipe
  * pattern (DescentLifecycle/BeamBudgetRuleProbe). Default 300k
  * distinct words: ABOVE the 200k production bound, so the default
  * routing provably takes the distributed arm, while the driver arm is
  * run once with a raised bound for the venue-parity check and the
  * cost comparison.
  *
  * Output (SPARK_GRAFT_UG_OUT, default unigram_scaling_r16.json):
  * {n_words, n_docs, vocab_size, rounds, dist_sec, driver_sec,
  * parity} — sec single-shot per arm (the EM is multi-round and
  * minutes-scale; rep jitter is a fraction of the venue gap),
  * canary-bracketed. Knobs: SPARK_GRAFT_UG_WORDS, SPARK_GRAFT_UG_DOCS,
  * SPARK_GRAFT_UG_VOCAB, SPARK_GRAFT_UG_ROUNDS. */
object UnigramScaling {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_UG_OUT", "unigram_scaling_r16.json")
    val targetWords = sys.env.get("SPARK_GRAFT_UG_WORDS")
      .flatMap(_.toLongOption).getOrElse(300000L)
    val nDocs = sys.env.get("SPARK_GRAFT_UG_DOCS")
      .flatMap(_.toLongOption).getOrElse(60000L)
    val vocabSize = sys.env.get("SPARK_GRAFT_UG_VOCAB")
      .flatMap(_.toIntOption).getOrElse(2000)
    val rounds = sys.env.get("SPARK_GRAFT_UG_ROUNDS")
      .flatMap(_.toIntOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 20 words per doc, word identity drawn from a hash-mixed id space
    // of `targetWords` values rendered base-36 (word length ~4-5 code
    // points — a realistic substring-seeding load per word)
    val docs = spark.range(0L, nDocs).toDF("doc_id")
      .select(col("doc_id"), expr(
        s"concat_ws(' ', transform(sequence(0, 19), j -> " +
          s"concat('w', conv(pmod(xxhash64(doc_id * 20 + j), " +
          s"${targetWords}L), 10, 36))))").as("text"))
      .localCheckpoint()
    val nWords = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).select("w").distinct().count()
    val bound = 200000L
    require(nWords > bound,
      s"blow-up too small: $nWords distinct words <= production bound " +
        s"$bound — raise SPARK_GRAFT_UG_WORDS/SPARK_GRAFT_UG_DOCS")
    println(s"UGSCALE corpus: $nDocs docs, $nWords distinct words " +
      s"(bound $bound -> distributed arm by ROUTING)")

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def r3(v: Double): String = graft.BenchUtil.r3(v)
    val canaryStart = graft.BenchUtil.canary()

    // PRODUCTION routing: default bound, word table above it ⇒ the
    // distributed arm is what actually runs (the quantity under audit)
    val (distVocab, distSec) = time {
      graft.ops.Unigram.learnVocab(docs, "text", vocabSize,
        rounds = rounds)
    }
    println(f"UGSCALE distributed arm: $distSec%.1fs, " +
      s"${distVocab.size} pieces")
    // comparison arm: the same learn forced through the driver-local EM
    val (localVocab, localSec) = time {
      graft.ops.Unigram.learnVocab(docs, "text", vocabSize,
        rounds = rounds, driverWordBound = Long.MaxValue)
    }
    println(f"UGSCALE driver arm: $localSec%.1fs, ${localVocab.size} pieces")
    val parity = distVocab == localVocab
    if (!parity) println("UGSCALE PARITY_FAIL: venues disagree above the bound")

    val doc =
      s"""{"n_words":$nWords,"n_docs":$nDocs,"vocab_size":$vocabSize,""" +
      s""""rounds":$rounds,"bound":$bound,""" +
      s""""dist_sec":${r3(distSec)},"driver_sec":${r3(localSec)},""" +
      s""""parity":$parity,""" +
      s""""canary":{"start":${r3(canaryStart)},""" +
      s""""end":${r3(graft.BenchUtil.canary())}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc)
    println(s"UG_SCALING_ARTIFACT $out")
    spark.stop()
  }
}
