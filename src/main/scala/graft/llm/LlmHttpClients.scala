package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Live LLM HTTP transports (reference: internal/llm/service.go:301-420)
  * plus the provider/model selection of service.go:26-106 — the round-2
  * gap ("retry/timeout/model-selection logic has no analog").
  *
  * Both clients speak to a parameterizable base URL, so the full wire
  * path (request shape, status→error mapping, response parsing) is tested
  * against an in-process HTTP server; no network egress happens in this
  * sandbox unless a caller points them at a real endpoint.
  */
object LlmHttpClients {

  /** Non-2xx API response, classified by the actual status code so the
    * retry policy never has to pattern-match message text (a message that
    * merely *contains* "status 5" must not trigger a retry). */
  final case class HttpStatusException(status: Int, msg: String)
      extends RuntimeException(msg)

  /** Generation calls run minutes, not seconds — the reference uses a
    * 5-minute client (service.go:321,372). */
  val DefaultTimeoutMs: Long = 300000L

  /** Bounded retry for transient transport failures (connect errors,
    * 429, 5xx): `attempts` total tries with linear backoff. Non-transient
    * failures (auth, bad request, malformed response) propagate
    * immediately — retrying those only delays the real error. */
  private[llm] def withRetry[A](attempts: Int = 3, backoffMs: Long = 500L)
                               (isTransient: Throwable => Boolean)(body: => A): A = {
    var tries = 0
    while (true) {
      tries += 1
      try return body
      catch {
        case e: Throwable if tries < attempts && isTransient(e) =>
          Thread.sleep(backoffMs * tries)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private[llm] def transientStatus(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true // connect reset / timeout
    case HttpStatusException(code, _) => code == 429 || code >= 500
    case _ => false
  }

  /** Provider/model selection from the environment
    * (service.go:26-86,201-206): the mock flag wins (PIPEGEN_MOCK_OPENAI,
    * service.go:124-129), then an Ollama model selects Ollama (default
    * model llama3.1, default URL localhost:11434), then an OpenAI key
    * selects OpenAI (model from PIPEGEN_LLM_MODEL, default gpt-4o-mini);
    * with none of the three the service is disabled. */
  def fromEnv(env: Map[String, String]): Either[String, LlmClient] =
    if (env.get("PIPEGEN_MOCK_OPENAI").contains("true"))
      Right(new MockClient)
    else env.get("PIPEGEN_OLLAMA_MODEL").filter(_.nonEmpty) match {
      case Some(model) =>
        Right(new OllamaClient(
          baseUrl = env.getOrElse("PIPEGEN_OLLAMA_URL", "http://localhost:11434"),
          model = model))
      case None =>
        env.get("PIPEGEN_OPENAI_API_KEY").filter(_.nonEmpty) match {
          case Some(key) =>
            Right(new OpenAiClient(
              baseUrl = env.getOrElse("PIPEGEN_OPENAI_URL", "https://api.openai.com"),
              apiKey = key,
              model = env.getOrElse("PIPEGEN_LLM_MODEL", "gpt-4o-mini")))
          case None =>
            Left("LLM service not enabled. Set PIPEGEN_OPENAI_API_KEY or " +
              "PIPEGEN_OLLAMA_MODEL environment variable") // service.go:111
        }
    }
}

/** Ollama `/api/generate` client (service.go:301-339): non-streaming,
  * model-not-installed hint on non-200. */
final class OllamaClient(baseUrl: String, val model: String,
                         timeoutMs: Long = LlmHttpClients.DefaultTimeoutMs)
    extends LlmClient {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()

  override def complete(prompt: String): String =
    LlmHttpClients.withRetry()(LlmHttpClients.transientStatus) {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.put("prompt", prompt)
    body.put("stream", false)
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${baseUrl.stripSuffix("/")}/api/generate"))
        .header("Content-Type", "application/json")
        .timeout(Duration.ofMillis(timeoutMs))
        .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw LlmHttpClients.HttpStatusException(resp.statusCode(),
        s"ollama API returned status ${resp.statusCode()}. Is the model '$model' " +
          s"installed? Run: ollama pull $model") // service.go:330
    val node = mapper.readTree(resp.body())
    require(node.has("response"), "Ollama response missing 'response' field")
    node.get("response").asText()
  }
}

/** OpenAI chat-completions client (service.go:341-420): JSON response
  * format, low temperature, and the reference's status→message mapping
  * (401 auth / 429 rate limit / 400 bad request). */
final class OpenAiClient(baseUrl: String, apiKey: String, val model: String,
                         timeoutMs: Long = LlmHttpClients.DefaultTimeoutMs)
    extends LlmClient {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()

  override def complete(prompt: String): String =
    LlmHttpClients.withRetry()(LlmHttpClients.transientStatus) {
    val body = mapper.createObjectNode()
    body.put("model", model)
    val messages = body.putArray("messages")
    val msg = messages.addObject()
    msg.put("role", "user")
    msg.put("content", prompt)
    body.put("max_tokens", 4096)
    body.put("temperature", 0.1) // consistent output, service.go:353
    body.putObject("response_format").put("type", "json_object")

    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${baseUrl.stripSuffix("/")}/v1/chat/completions"))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer $apiKey")
        .timeout(Duration.ofMillis(timeoutMs))
        .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
        .build(),
      HttpResponse.BodyHandlers.ofString())

    resp.statusCode() match {
      case 200 => ()
      case 401 => throw LlmHttpClients.HttpStatusException(401, // service.go:384
        "OpenAI API authentication failed. Please check your PIPEGEN_OPENAI_API_KEY environment variable")
      case 429 => throw LlmHttpClients.HttpStatusException(429,
        "OpenAI API rate limit exceeded. Please try again in a few minutes")
      case 400 => throw LlmHttpClients.HttpStatusException(400,
        s"OpenAI API bad request (status 400): ${resp.body()}")
      case other => throw LlmHttpClients.HttpStatusException(other,
        s"OpenAI API returned status $other: ${resp.body()}")
    }

    val node = mapper.readTree(resp.body())
    if (node.has("error") && !node.get("error").isNull) {
      // the error node may be an object with a message, or a bare string —
      // reporting must not NPE and mask the actual error text
      val err = node.get("error")
      val msg = Option(err.get("message")).map(_.asText()).getOrElse(err.asText())
      throw new RuntimeException(s"OpenAI API error: $msg")
    }
    val choices = node.get("choices")
    require(choices != null && choices.size() > 0, "OpenAI API returned no choices")
    val content = Option(choices.get(0).get("message")).flatMap(m => Option(m.get("content")))
      .filterNot(_.isNull)
      .getOrElse(throw new RuntimeException(
        s"OpenAI API choice carries no message content: ${choices.get(0)}"))
    content.asText()
  }
}
