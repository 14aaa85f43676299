package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** A5/A6/A7 parity: expected strings are the OBSERVED outputs of the
  * reference's `get_single_prompt` / `get_init_message` / `get_new_message`
  * (`prompt.py:1-47`, `llm_ours.py:24-35`) executed on these inputs. */
class PromptsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def onePrompt(promptType: String): String = {
    import spark.implicits._
    Seq(("What fruit?", Seq("p0 text", "p1 text", "p2 text", "p3 extra")))
      .toDF("question", "ctxs")
      .select(Prompts.singlePrompt(promptType, col("question"), col("ctxs"), 3))
      .as[String].collect()(0)
  }

  test("rag prompt: template + passage block (no space after label) + Answer tail") {
    assert(onePrompt("rag") ==
      "Answer the following question based on the given passages with one or few words. Provide your evidence between two ## symbols at the end of your response, either the passage id or your internal knowledge. For example, provide \"Answer: apple.\nEvidence: ## Passage-0, Passage-1 ##.\" if you are referring to Passage-0 and Passage-1 to obtain the answer \"apple\". If there is no information in the passages, explain the answer by yourself.\nQuestion: What fruit?\nPassages: Passage-0p0 text\nPassage-1p1 text\nPassage-2p2 text\nAnswer: ")
  }

  test("priori prompt: passage block before question, Answer tail") {
    assert(onePrompt("priori") ==
      "Given the following information: \nPassage-0p0 text\nPassage-1p1 text\nPassage-2p2 text\nCan you answer the following question based on the given information or your internal knowledge, if yes, you should give a short answer with one or few words, if no, you should answer \"Unknown\".\nQuestion: What fruit?\nAnswer: ")
  }

  test("counterfactual prompts get the Answer tail; fusion prompts do not") {
    assert(onePrompt("cf_use").endsWith("regenerate the answer with one or few words.\nAnswer: "))
    assert(onePrompt("cf_quality").endsWith("your referred passage id as evidence.\nAnswer: "))
    assert(!onePrompt("fusion_probability").endsWith("Answer: "))
    assert(onePrompt("fusion_use").endsWith("generate $$ discard $$."))
  }

  test("message assembly matches get_init_message/get_new_message") {
    import spark.implicits._
    val df = Seq(Tuple1("x")).toDF("x")
      .withColumn("m", Prompts.initMessages(lit("PROMPT")))
      .withColumn("m2", Prompts.appendTurn(col("m"), lit("prev answer"), lit("next prompt")))
    val m2 = df.select("m2").collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(m2.map(r => (r.getString(0), r.getString(1))) == Seq(
      ("user", "PROMPT"), ("assistant", "prev answer"), ("user", "next prompt")))
  }
}
