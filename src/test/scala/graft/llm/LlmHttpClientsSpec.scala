package graft.llm

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Wire tests for the live LLM transports against in-process endpoints
  * mimicking Ollama `/api/generate` and OpenAI `/v1/chat/completions` —
  * request shape, response parsing, and the reference's status→error
  * mapping (service.go:301-420), with zero network egress. */
class LlmHttpClientsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  @volatile private var lastOllamaBody: String = _
  @volatile private var lastOpenAiBody: String = _
  @volatile private var lastAuth: String = _
  @volatile private var openAiStatus: Int = 200

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  override def beforeAll(): Unit = {
    server.createContext("/api/generate", (ex: HttpExchange) => {
      lastOllamaBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      respond(ex, 200, """{"response": "ollama says hi", "done": true}""")
    })
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      lastOpenAiBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastAuth = ex.getRequestHeaders.getFirst("Authorization")
      if (openAiStatus == 200)
        respond(ex, 200,
          """{"choices": [{"message": {"content": "{\"ok\": true}"}}]}""")
      else respond(ex, openAiStatus, """{"error": {"message": "nope"}}""")
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def base = s"http://127.0.0.1:${server.getAddress.getPort}"

  test("OllamaClient posts model/prompt/stream=false and parses .response") {
    val got = new OllamaClient(base, "llama3.1").complete("hello")
    assert(got == "ollama says hi")
    val req = mapper.readTree(lastOllamaBody)
    assert(req.get("model").asText() == "llama3.1")
    assert(req.get("prompt").asText() == "hello")
    assert(!req.get("stream").asBoolean())
  }

  test("OpenAiClient sends auth header, json response_format, low temperature") {
    val got = new OpenAiClient(base, "sk-test", "gpt-4o-mini").complete("hi")
    assert(got == """{"ok": true}""")
    assert(lastAuth == "Bearer sk-test")
    val req = mapper.readTree(lastOpenAiBody)
    assert(req.get("model").asText() == "gpt-4o-mini")
    assert(req.get("temperature").asDouble() == 0.1)
    assert(req.get("response_format").get("type").asText() == "json_object")
    assert(req.get("messages").get(0).get("role").asText() == "user")
  }

  test("OpenAiClient maps 401/429 to the reference's messages (service.go:381-393)") {
    openAiStatus = 401
    val e1 = intercept[RuntimeException](new OpenAiClient(base, "bad", "m").complete("x"))
    assert(e1.getMessage.contains("authentication failed"))
    openAiStatus = 429
    val e2 = intercept[RuntimeException](new OpenAiClient(base, "k", "m").complete("x"))
    assert(e2.getMessage.contains("rate limit"))
    openAiStatus = 200
  }

  test("provider selection from env mirrors service.go:26-106") {
    assert(LlmHttpClients.fromEnv(Map("PIPEGEN_MOCK_OPENAI" -> "true"))
      .exists(_.isInstanceOf[MockClient]))
    val ollama = LlmHttpClients.fromEnv(Map("PIPEGEN_OLLAMA_MODEL" -> "mistral"))
    assert(ollama.exists(_.isInstanceOf[OllamaClient]))
    assert(ollama.toOption.get.asInstanceOf[OllamaClient].model == "mistral")
    val openai = LlmHttpClients.fromEnv(Map("PIPEGEN_OPENAI_API_KEY" -> "sk-1"))
    assert(openai.exists(_.isInstanceOf[OpenAiClient]))
    assert(openai.toOption.get.asInstanceOf[OpenAiClient].model == "gpt-4o-mini")
    val custom = LlmHttpClients.fromEnv(
      Map("PIPEGEN_OPENAI_API_KEY" -> "sk-1", "PIPEGEN_LLM_MODEL" -> "gpt-4.1"))
    assert(custom.toOption.get.asInstanceOf[OpenAiClient].model == "gpt-4.1")
    assert(LlmHttpClients.fromEnv(Map.empty).left.exists(_.contains("not enabled")))
  }

  test("a generated pipeline flows end-to-end through an HTTP client (mock wire)") {
    // the mock endpoint returns a full messy pipeline via the OpenAI wire
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val content = new MockClient().complete("Description: d\nDomain: clicks")
      val node = mapper.createObjectNode()
      val choice = node.putArray("choices").addObject()
      choice.putObject("message").put("content", content)
      respond(ex, 200, mapper.writeValueAsString(node))
    })
    srv.start()
    try {
      val client = new OpenAiClient(s"http://127.0.0.1:${srv.getAddress.getPort}", "k", "m")
      val p = PipelineGen.generate(client, "doubles click scores", "clicks")
      assert(p.sqlStatements.size == 3)
      assert(p.inputSchema.contains("ClicksEvent"))
    } finally srv.stop(0)
  }
}
