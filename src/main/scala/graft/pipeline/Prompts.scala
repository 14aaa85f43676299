package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prompt construction (A5-A7, `prompt.py:1-47` + `llm_ours.py:24-35`):
  * template registry, passage top-k labeling, and chat-message assembly —
  * all pure projections over columns.
  */
object Prompts {

  /** The 10 templates (`prompt.py:3-27`), verbatim. `{question}` /
    * `{passage}` placeholders are interpolated by [[singlePrompt]]. */
  val templates: Map[String, String] = Map(
    "rag" -> ("Answer the following question based on the given passages with one or few words. Provide your evidence between two ## symbols at the end of your response, either the passage id or your internal knowledge. For example, provide \"Answer: apple.\nEvidence: ## Passage-0, Passage-1 ##.\" if you are referring to Passage-0 and Passage-1 to obtain the answer \"apple\". If there is no information in the passages, explain the answer by yourself.\nQuestion: {question}\nPassages: {passage}"),
    "cf_use" -> "Assume that your answer is wrong due to your improper use of the retrieved passages. Please read the given passages carefully to regenerate the answer with one or few words.",
    "cf_quality" -> "Assume that your answer is wrong because the quality of your referred passages is poor. Please re-select the passages, to regenerate the answer with one or few words and your referred passage id as evidence.",
    "fusion_use" -> "Your answer is likely to be wrong because of the improper use of retrieval passages, please choose to keep or discard this output. Generate $$ keep $$ if you choose to keep this answer, otherwise, generate $$ discard $$.",
    "fusion_quality" -> "Your answer is likely to be wrong because of the poor quality of retrieval passages, please choose to keep or discard this output. Generate $$ keep $$ if you choose to keep this answer, otherwise, generate $$ discard $$.",
    "fusion_probability" -> "Provide the probability that your regenerated answer is correct. Give ONLY the probability, no other words or explanation.\n\nFor example:\n\nProbability: <the probability between 0.0 and 1.0 that your specific answer is correct, without any extra commentary whatsoever; just the probability!>\n",
    "priori" -> "Given the following information: \n{passage}\nCan you answer the following question based on the given information or your internal knowledge, if yes, you should give a short answer with one or few words, if no, you should answer \"Unknown\".\nQuestion: {question}",
    "ioe" -> "If you are very confident about your answer, maintain your answer. Otherwise, update your answer.",
    "ioe_decision" -> "You give two different answers in previous responses. Check the problem and your answers again, and give the best answer.",
    "calibration" -> "Provide the probability that your answer is correct. Give ONLY the probability, no other words or explanation.\n\nFor example:\n\nProbability: <the probability between 0.0 and 1.0 that your specific answer is correct, without any extra commentary whatsoever; just the probability!>\n",
  )

  /** A5 (`prompt.py:35-39`): passages `[0,k)`, each prefixed `Passage-%d`
    * (0-based), newline-joined. Deviation: a sample with fewer than k
    * passages renders only the passages it has (the reference raises
    * IndexError, `prompt.py:38`) — failing a whole distributed job on one
    * malformed row is the wrong trade; rows with short contexts are
    * visible downstream as shorter passage blocks. */
  def passageBlock(ctxs: Column, k: Int): Column =
    array_join(
      zip_with(slice(ctxs, 1, k), sequence(lit(0), lit(k - 1)),
        (p, i) => concat(lit("Passage-"), i.cast("string"), p)),
      "\n")

  /** A6 (`prompt.py:1-47`): template interpolation + the `\nAnswer: ` tail
    * (no tail for fusion prompts). Passage block only for rag/priori. */
  def singlePrompt(promptType: String, question: Column, ctxs: Column, k: Int): Column = {
    val template = templates(promptType)
    val tail = if (promptType.contains("fusion")) "" else "\nAnswer: "
    concat(interpolate(template, question, ctxs, k), lit(tail))
  }

  /** Replace `{question}`/`{passage}` placeholders with columns, keeping
    * everything else literal. */
  private def interpolate(template: String, question: Column, ctxs: Column, k: Int): Column = {
    val tokenRe = "(\\{question\\}|\\{passage\\})".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- tokenRe.findAllMatchIn(template)) {
      if (m.start > last) pieces += lit(template.substring(last, m.start))
      pieces += (if (m.matched == "{question}") question else passageBlock(ctxs, k))
      last = m.end
    }
    if (last < template.length) pieces += lit(template.substring(last))
    concat(pieces.toSeq: _*)
  }

  /** A7 `get_init_message` (`llm_ours.py:24-28`): single user turn. */
  def initMessages(prompt: Column): Column =
    array(struct(lit("user").as("role"), prompt.as("content")))

  /** A7 `get_new_message` appended (`llm_ours.py:31-35`): assistant turn
    * with the previous answer + new user turn. A null previous answer
    * renders the literal "None" (the reference's f-string does,
    * `llm_ours.py:32`), and a null conversation starts empty rather than
    * nulling the whole array. */
  def appendTurn(messages: Column, previousAnswer: Column, prompt: Column): Column =
    concat(
      coalesce(messages, array().cast("array<struct<role:string,content:string>>")),
      array(
        struct(lit("assistant").as("role"),
          coalesce(previousAnswer, lit("None")).as("content")),
        struct(lit("user").as("role"), prompt.as("content"))))
}
