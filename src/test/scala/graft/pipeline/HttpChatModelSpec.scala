package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** A8 network-path spec against a localhost fake OpenAI-compatible server
  * (JDK HttpServer — zero egress): success parse, 429-then-success retry,
  * permanent-failure -> None, bounded retry exhaustion -> None. */
class HttpChatModelSpec extends AnyFunSuite {

  private def withServer(handler: (HttpExchange, Int) => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) =>
      handler(ex, calls.incrementAndGet()))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions")
    finally server.stop(0)
  }

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val okBody =
    """{"choices":[{"message":{"role":"assistant","content":"Answer: apple."}}]}"""

  private def msgs = Seq(Seq(ChatModel.Message("user", "What fruit?")))

  test("parses an OpenAI-compatible completion") {
    withServer((ex, _) => reply(ex, 200, okBody)) { url =>
      val m = new HttpChatModel(url, "test-model", retryBackoffMs = 1)
      assert(m.complete(msgs) == Seq(Some("Answer: apple.")))
    }
  }

  test("429 retries with backoff until success (llm_ours.py rate-limit arm)") {
    withServer((ex, n) =>
      if (n <= 2) reply(ex, 429, """{"error":"rate limit"}""")
      else reply(ex, 200, okBody)) { url =>
      val m = new HttpChatModel(url, "m", retryBackoffMs = 1, maxRetries = 5)
      assert(m.complete(msgs) == Seq(Some("Answer: apple.")))
    }
  }

  test("permanent error returns None immediately (generic except arm)") {
    val hits = new AtomicInteger(0)
    withServer((ex, _) => { hits.incrementAndGet(); reply(ex, 400, """{"error":"bad"}""") }) { url =>
      val m = new HttpChatModel(url, "m", retryBackoffMs = 1, maxRetries = 5)
      assert(m.complete(msgs) == Seq(None))
      assert(hits.get() == 1) // no retry on permanent failures
    }
  }

  test("bounded retry exhaustion degrades to None (deviation: bounded loop)") {
    val hits = new AtomicInteger(0)
    withServer((ex, _) => { hits.incrementAndGet(); reply(ex, 503, """{"error":"down"}""") }) { url =>
      val m = new HttpChatModel(url, "m", retryBackoffMs = 1, maxRetries = 2)
      assert(m.complete(msgs) == Seq(None))
      assert(hits.get() == 3) // initial try + 2 retries
    }
  }

  test("malformed body yields None, not an exception") {
    withServer((ex, _) => reply(ex, 200, """{"unexpected": true}""")) { url =>
      val m = new HttpChatModel(url, "m", retryBackoffMs = 1)
      assert(m.complete(msgs) == Seq(None))
    }
  }
}
