package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Stub-driven end-to-end tests of entry points 1/2, asserting the exact
  * per-branch conversation arrays against the reference's threading
  * (`run_llm_ours.py:101-103`: messages1 forks from the rag-only
  * conversation BEFORE cf_use extends messages; `:166-187`: probability
  * asks land on each branch's own conversation). */
/** JVM-static call counters (shared with executor threads in local mode). */
object IterCounter {
  val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}

class InferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** A recording stub: echoes a scripted answer per template key and lets
    * the test inspect the conversation it was handed. */
  private val script = Map(
    "Question:" -> "Answer: apple.\nEvidence: ## Passage-0 ##.",  // rag
    "improper use" -> "Answer: apple!\nEvidence: ## Passage-0 ##.", // cf_use
    "quality of your referred passages" -> "Answer: pear.\nEvidence: ## Passage-1 ##.", // cf_quality
    "Provide the probability" -> "Probability: 0.9.")
  private val model = new ChatModel.DeterministicStub(script)

  private def samples = {
    import spark.implicits._
    Seq((0L, "What fruit?", Seq("apple"), Seq("p0", "p1", "p2"),
      Seq("d0", "d1", "d2"), Seq("g0", "g1", "g2")))
      .toDF("id", "question", "reference", "sparse_ctxs", "dense_ctxs", "gold_ctxs")
  }

  test("entry point 1: rag -> annotate -> branches -> fusion, correct threading") {
    val cfg = Inference.Config(fusionStrategy = "probability")
    val annotated = Inference.ragAnnotate(samples, model, cfg)
    val out = Inference.inferDecideFuse(annotated, model, cfg)
    val row = out.select("rag.answer", "cf_use.answer", "cf_quality.answer",
      "label_decision", "pred_decision", "messages", "messages_quality").collect()(0)

    assert(row.getString(0) == "apple.")
    assert(row.getString(1) == "apple!")
    assert(row.getString(2) == "pear.")
    assert(row.getString(3) == "keep") // "apple" substring-contained in "apple."

    // cf_use conversation = [rag user, rag assistant, cf_use user]
    val msgs = row.getSeq[Row](5)
    assert(msgs.length == 3)
    assert(msgs.map(_.getString(0)) == Seq("user", "assistant", "user"))
    assert(msgs(1).getString(1) == "apple.") // rag answer as assistant turn
    assert(msgs(2).getString(1).contains("improper use"))

    // cf_quality conversation forked BEFORE cf_use: same length, its own
    // template, and NO cf_use turns in it (the round-1 bug)
    val msgsQ = row.getSeq[Row](6)
    assert(msgsQ.length == 3)
    assert(msgsQ(1).getString(1) == "apple.")
    assert(msgsQ(2).getString(1).contains("quality of your referred passages"))
    assert(!msgsQ.exists(_.getString(1).contains("improper use")))
  }

  test("agreeing rows skip fusion LLM calls (run_llm_ours.py:144-146)") {
    // same stub answers for both branches -> decisions agree -> no prob
    // calls; the model throws if a fusion-probability prompt arrives
    val agreeScript = script + ("quality of your referred passages" ->
      "Answer: apple!\nEvidence: ## Passage-0 ##.")
    val agreeModel = new ChatModel.Model {
      private val inner = new ChatModel.DeterministicStub(agreeScript)
      override def complete(batch: Seq[Seq[ChatModel.Message]]): Seq[Option[String]] = {
        batch.foreach { msgs =>
          val last = msgs.reverseIterator.find(_.role == "user").map(_.content).getOrElse("")
          require(!last.contains("Provide the probability"),
            "fusion LLM called for an agreeing row")
        }
        inner.complete(batch)
      }
    }
    val cfg = Inference.Config(fusionStrategy = "probability")
    val annotated = Inference.ragAnnotate(samples, agreeModel, cfg)
    val out = Inference.inferDecideFuse(annotated, agreeModel, cfg)
    assert(out.select("pred_decision").collect()(0).getString(0) == "keep")
  }

  test("entry point 2: annotation reuse joins by id and rebuilds the prefix") {
    val cfg = Inference.Config(fusionStrategy = "safety")
    val annotated = Inference.ragAnnotate(samples, model, cfg)
      .select("id", "rag", "label_decision")
    val reused = Inference.reuseAnnotations(samples, annotated, cfg)
    val row = reused.select("rag.answer", "label_decision", "messages").collect()(0)
    assert(row.getString(0) == "apple.")
    assert(row.getString(1) == "keep")
    val msgs = row.getSeq[Row](2)
    assert(msgs.length == 1 && msgs(0).getString(0) == "user")
    assert(msgs(0).getString(1).contains("Question: What fruit?"))
    // " or "-expansion applied on reuse path too
    val refs = reused.select("reference").collect()(0).getSeq[String](0)
    assert(refs == Seq("apple"))
  }

  test("A25 iteration loop: round 2 runs only for continuing rows, early exit on discard") {
    import spark.implicits._
    // two samples: sample 0's cf answer matches rag (continue -> round 2);
    // sample 1 mismatches (discard -> exits after round 1)
    val twoSamples = Seq(
      (0L, "Q zero?", Seq("apple"), Seq("p", "p", "p"), Seq("p", "p", "p"), Seq("p", "p", "p")),
      (1L, "Q one?", Seq("apple"), Seq("p", "p", "p"), Seq("p", "p", "p"), Seq("p", "p", "p")))
      .toDF("id", "question", "reference", "sparse_ctxs", "dense_ctxs", "gold_ctxs")
    // counters live in a JVM-static object: the model instance itself is
    // serialized into task closures, so instance state would stay empty
    IterCounter.counts.clear()
    val counting = new ChatModel.Model {
      override def complete(batch: Seq[Seq[ChatModel.Message]]): Seq[Option[String]] =
        batch.map { msgs =>
          val last = msgs.reverseIterator.find(_.role == "user").map(_.content).getOrElse("")
          if (last.contains("improper use")) {
            val qKey = if (msgs.head.content.contains("Q zero")) "cf0" else "cf1"
            IterCounter.counts.merge(qKey, 1, (a, b) => a + b)
            // sample 0 echoes the rag answer (match); sample 1 diverges
            if (qKey == "cf0") Some("Answer: apple.") else Some("Answer: zzz qqq.")
          } else Some("Answer: apple.\nEvidence: ## Passage-0 ##.")
        }
    }
    val cfg = Inference.Config(fusionStrategy = "safety", numIteration = 2)
    val annotated = Inference.ragAnnotate(twoSamples, counting, cfg)
    val out = Inference.counterfactualBranch(
      annotated.withColumn("messages_quality", col("messages")),
      counting, cfg, "cf_use", "messages")
    val decisions = out.select("id", "cf_use.pred_decision").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(decisions == Seq((0L, "keep"), (1L, "discard")))
    // driver-side lazy plans can evaluate a round more than once, but the
    // discarding sample must never be consulted more often than the
    // continuing one (its row exits the active set after round 1)
    assert(IterCounter.counts.get("cf0") != null && IterCounter.counts.get("cf1") != null)
    assert(IterCounter.counts.get("cf1") <= IterCounter.counts.get("cf0"))
  }

  test("appendTurn: null previous answer renders literal \"None\" (llm_ours.py:32)") {
    import spark.implicits._
    val df = Seq(Tuple1("q")).toDF("q")
      .withColumn("messages", Prompts.initMessages(lit("p1")))
      .withColumn("messages", Prompts.appendTurn(col("messages"), lit(null).cast("string"), lit("p2")))
    val msgs = df.select("messages").collect()(0).getSeq[Row](0)
    assert(msgs.map(m => (m.getString(0), m.getString(1))) ==
      Seq(("user", "p1"), ("assistant", "None"), ("user", "p2")))
  }

  test("fuse throws when LLM columns are missing for prompt/probability") {
    val df = spark.read.schema(Schemas.resultRecord).json(SparkTestBase.FixtureJsonl)
    assertThrows[IllegalArgumentException] { Stages.fuse("prompt")(df) }
    assertThrows[IllegalArgumentException] { Stages.fuse("probability")(df) }
  }

  test("Monitor.observeResults: quality metrics ride the action, no second scan") {
    val results = spark.read.schema(Schemas.resultRecord)
      .json(SparkTestBase.FixtureJsonl)
    val (instrumented, obs) = Monitor.observeResults(results)
    val nRows = instrumented.count() // the ONE action; metrics accumulate inside it
    val m = obs.get
    assert(m("n_rows") == nRows)
    // fixture invariants (FIXTURES.md §B2: 24 rows, golden keep counts)
    assert(m("n_rows") == 24L)
    val expectedKeep = results.where(org.apache.spark.sql.functions.col("label_decision") === "keep").count()
    assert(m("n_label_keep") == expectedKeep)
    val expectedRejects = results.where(org.apache.spark.sql.functions.col("rag.reject")).count()
    assert(m("n_rejects") == expectedRejects)
  }

  test("Monitor.instrument: named observation lands in observedMetrics") {
    val results = spark.read.schema(Schemas.resultRecord)
      .json(SparkTestBase.FixtureJsonl)
    val instrumented = Monitor.instrument(results, "spec_quality")
    // collect() runs the Dataset's OWN queryExecution (count() would plan
    // a separate aggregate execution whose metrics land elsewhere)
    instrumented.collect()
    val metrics = instrumented.queryExecution.observedMetrics
    assert(metrics.contains("spec_quality"))
    val row = metrics("spec_quality")
    assert(row.getAs[Long]("n_rows") == 24L)
    assert(row.getAs[Long]("n_label_keep") ==
      results.where(org.apache.spark.sql.functions.col("label_decision") === "keep").count())
  }

  test("A2 sink: append-mode JSONL accumulates records") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/out"
    Sink.appendJsonl(Seq((1L, "a")).toDF("id", "v"), dir)
    Sink.appendJsonl(Seq((2L, "b")).toDF("id", "v"), dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
  }
}
