package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper

/** A8's network path as a real implementation: OpenAI-compatible
  * `chat/completions` over HTTP (the reference's chat path,
  * `llm_ours.py:45-57`, and 30s-timeout HTTP path, `llm_ours.py:68-82`).
  *
  * Retry semantics mirror `llm_ours.py:95-122` with one deliberate
  * deviation (SURVEY §4.1): the reference retries transient API errors
  * forever with a fixed 5 s sleep; a distributed engine must bound the
  * loop, so retries are capped at `maxRetries` and exhaustion degrades to
  * `None` — which flows into the reference's own null-prediction path
  * (`utils.py:205`). Unknown errors return `None` immediately, exactly
  * like the reference's generic `except` arm.
  *
  * One client per model instance; [[ChatModel.transform]] instantiates per
  * partition, so connections amortize across a partition's rows.
  */
final class HttpChatModel(
    url: String,
    model: String,
    apiKey: String = "",             // llm_ours.py:6-9 (client api_key)
    maxTokens: Int = 256,            // run_llm_ours.py:61
    temperature: Double = 0.0,       // run_llm_ours.py:62
    timeoutMs: Long = 30000,         // llm_ours.py:79
    maxRetries: Int = 5,
    retryBackoffMs: Long = 5000      // llm_ours.py:104-116
) extends ChatModel.Model {

  @transient private lazy val client =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  private def requestBody(messages: Seq[ChatModel.Message]): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("max_tokens", maxTokens)
    root.put("temperature", temperature)
    val arr = root.putArray("messages")
    messages.foreach { m =>
      val o = arr.addObject()
      o.put("role", m.role)
      o.put("content", m.content)
    }
    mapper.writeValueAsString(root)
  }

  private def parseContent(body: String): Option[String] = {
    val root = mapper.readTree(body)
    val content = root.path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || content.isNull) None else Some(content.asText())
  }

  /** Transient = retry (rate limit, unavailable, timeout-ish, connection);
    * anything else = give up with None. Fatal JVM errors and interrupts
    * propagate (a null prediction must mean a model failure, not a hidden
    * OOM or a swallowed task cancellation). */
  private def once(messages: Seq[ChatModel.Message]): Either[Boolean, Option[String]] = {
    try {
      var builder = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
      if (apiKey.nonEmpty) builder = builder.header("Authorization", s"Bearer $apiKey")
      val req = builder
        .POST(HttpRequest.BodyPublishers.ofString(requestBody(messages)))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case 200 =>
          // a 200 with an unparseable body is a permanent give-up, not a
          // retry (the reference's generic except arm returns None
          // immediately); note JsonProcessingException IS an IOException,
          // so parse failures must not reach the transient arm below
          Right(try parseContent(resp.body()) catch { case scala.util.control.NonFatal(_) => None })
        case 429 | 500 | 502 | 503 | 504 => Left(true) // transient -> retry
        case _ => Left(false) // permanent -> None
      }
    } catch {
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new RuntimeException("LLM call interrupted (task cancellation)", e)
      case _: java.net.http.HttpTimeoutException => Left(true)
      case _: java.io.IOException => Left(true)
      case scala.util.control.NonFatal(_) => Left(false)
    }
  }

  override def complete(batch: Seq[Seq[ChatModel.Message]]): Seq[Option[String]] =
    batch.map { messages =>
      var attempt = 0
      var result: Option[String] = None
      var done = false
      while (!done) {
        once(messages) match {
          case Right(r) => result = r; done = true
          case Left(retriable) =>
            attempt += 1
            if (!retriable || attempt > maxRetries) { result = None; done = true }
            else Thread.sleep(retryBackoffMs)
        }
      }
      result
    }
}
