package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.exprs.RcFunctions._

/** Entry points 1 and 2 (SURVEY §3): annotate+infer and infer-from-cached-
  * annotations, as library functions (not declared queries — LLM output has
  * no SQL oracle; goldens use the [[ChatModel.DeterministicStub]]).
  */
object Inference {

  /** A4 `ra_dict` (`run_llm_ours.py:13-17`): retriever type -> passage
    * column name. */
  val raDict: Map[String, String] =
    Map("sparse" -> "sparse_ctxs", "dense" -> "dense_ctxs", "gold" -> "gold_ctxs")

  final case class Config(
    raType: String = "dense",
    numPassage: Int = 3,          // run_llm_ours.py:63
    numIteration: Int = 1,        // run_llm_ours.py:66
    fusionStrategy: String = "probability", // run_llm_ours.py:68
    dataStart: Long = 0, dataEnd: Long = Long.MaxValue) // run_llm_ours.py:50-51

  /** A3 slice: ids are dense, so the range is a filter (SURVEY §1.4). */
  def sliceRange(df: DataFrame, start: Long, end: Long): DataFrame =
    df.where(col("id") >= start && col("id") < end)

  private def branchFromLlm(out: String) = {
    val parsed = dealPredictionUdf(col(out))
    struct(
      parsed.getField("reject").as("reject"),
      parsed.getField("answer").as("answer"),
      parsed.getField("evidence").as("evidence"),
      lit(null).cast("int").as("EM"), lit(null).cast("double").as("F1"),
      lit(null).cast("double").as("RL"), lit(null).cast("boolean").as("has_answer"),
      lit(null).cast("string").as("pred_decision"))
  }

  /** Entry point 1: RAG generation + annotation (`run_llm_ours.py:82-98`).
    * Source QA samples in ([[Schemas.qaSample]]); out: the source columns
    * plus `messages`, `rag`, expanded `reference`, `label_decision`. */
  def ragAnnotate(samples: DataFrame, model: ChatModel.Model, cfg: Config): DataFrame = {
    val ctxs = col(raDict(cfg.raType))
    val prompt = Prompts.singlePrompt("rag", col("question"), ctxs, cfg.numPassage)
    val withMsgs = sliceRange(samples, cfg.dataStart, cfg.dataEnd)
      .withColumn("messages", Prompts.initMessages(prompt))
    val withLlm = ChatModel.transform(withMsgs, model, "messages", "_llm")
    val parsed = withLlm
      .withColumn("rag", branchFromLlm("_llm").dropFields("pred_decision"))
      .drop("_llm")
    Stages.annotate(Stages.expandRefs(parsed))
  }

  /** One counterfactual branch with the A25 iteration loop
    * (`run_llm_ours.py:104-137`): up to `numIteration` rounds, rows that
    * decide `discard` exit early (their LLM cost is skipped, like the
    * reference skips calls); a final `continue` maps to keep inside
    * [[Stages.decide]]. Driver-side loop over DataFrames with an active
    * filter — with the default single iteration it is one pass.
    */
  def counterfactualBranch(df0: DataFrame, model: ChatModel.Model, cfg: Config,
                           branch: String): DataFrame = {
    var done: DataFrame = null
    var active = df0
    var i = 0
    while (i < cfg.numIteration && !active.isEmpty) {
      val prompt = Prompts.singlePrompt(branch, col("question"), col(raDict(cfg.raType)), cfg.numPassage)
      val prevAnswer = if (i == 0) col("rag.answer") else col(s"$branch.answer")
      val withMsgs = active.withColumn("messages",
        Prompts.appendTurn(col("messages"), prevAnswer, prompt))
      val withLlm = ChatModel.transform(withMsgs, model, "messages", "_llm")
      val decided = Stages.decide(branch)(
        withLlm.withColumn(branch, branchFromLlm("_llm")).drop("_llm"))
      val lastRound = i == cfg.numIteration - 1
      val exiting =
        if (lastRound) decided
        else decided.where(col(s"$branch.pred_decision") === "discard")
      done = if (done == null) exiting else done.unionByName(exiting)
      active =
        if (lastRound) active.limit(0)
        else decided.where(col(s"$branch.pred_decision") =!= "discard")
      i += 1
    }
    done
  }

  /** Entry points 1/2 tail (`run_llm_ours.py:101-139` + fusion + override):
    * both counterfactual branches, fusion, reject override. For the
    * `prompt`/`probability` strategies the extra LLM calls are issued on
    * the appropriate conversation (fusion-stage messages).
    */
  def inferDecideFuse(annotated: DataFrame, model: ChatModel.Model, cfg: Config): DataFrame = {
    val afterUse = counterfactualBranch(annotated, model, cfg, "cf_use")
    val afterQuality = counterfactualBranch(afterUse, model, cfg, "cf_quality")
    val fused = cfg.fusionStrategy match {
      case "safety" => Stages.fuse("safety")(afterQuality)
      case "prompt" =>
        val branchIsUse = col("cf_use.pred_decision") === "discard"
        val promptType = when(branchIsUse, "fusion_use").otherwise("fusion_quality")
        val tmpl = when(branchIsUse, lit(Prompts.templates("fusion_use")))
          .otherwise(lit(Prompts.templates("fusion_quality")))
        val prevAns = when(branchIsUse, col("cf_use.answer")).otherwise(col("cf_quality.answer"))
        val withMsgs = afterQuality.withColumn("messages",
          Prompts.appendTurn(col("messages"), prevAns, tmpl))
        val out = ChatModel.transform(withMsgs, model, "messages", "_fusion")
        Stages.fuse("prompt", fusionLlmOut = col("_fusion"))(out).drop("_fusion")
      case "probability" =>
        val tmpl = lit(Prompts.templates("fusion_probability"))
        val m1 = afterQuality.withColumn("messages",
          Prompts.appendTurn(col("messages"), col("cf_use.answer"), tmpl))
        val o1 = ChatModel.transform(m1, model, "messages", "_probUse")
        val m2 = o1.withColumn("messages",
          Prompts.appendTurn(col("messages"), col("cf_quality.answer"), tmpl))
        val o2 = ChatModel.transform(m2, model, "messages", "_probQuality")
        // deal_prediction strips/cleans before probability parse (run_llm_ours.py:169-185)
        val ansU = dealPredictionUdf(col("_probUse")).getField("answer")
        val ansQ = dealPredictionUdf(col("_probQuality")).getField("answer")
        Stages.fuse("probability", probUseRaw = ansU, probQualityRaw = ansQ)(o2)
          .drop("_probUse", "_probQuality")
      case other => throw new IllegalArgumentException(s"unknown fusion strategy: $other")
    }
    Stages.rejectOverride(fused)
  }
}
