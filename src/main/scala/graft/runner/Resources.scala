package graft.runner

import graft.statements.{SqlStatement, Statements}

/** Resource (topic) name generation — reference
  * internal/pipeline/resources.go:52-126: local mode takes topics from the
  * SQL statements (first = input, last = output) or falls back to
  * input-events/output-results/processed-events; isolated mode prefixes
  * everything with `graft-<timestamp>-<uuid8>` to avoid collisions. */
final case class Resources(prefix: String, inputTopic: String, outputTopic: String,
                           topics: Seq[String])

object Resources {

  def generate(statements: Seq[SqlStatement], localMode: Boolean = true,
               now: java.time.LocalDateTime = java.time.LocalDateTime.now()): Resources = {
    // template placeholders ('topic' = '${INPUT_TOPIC}') are not concrete
    // topics — they resolve AGAINST the resources generated here, so
    // templated projects fall through to the default names
    val sqlTopics = Statements.extractTopics(statements).filterNot(_.contains("${"))
    if (localMode) {
      if (sqlTopics.nonEmpty)
        Resources("graft-local", sqlTopics.head, sqlTopics.last, sqlTopics)
      else
        Resources("graft-local", "input-events", "output-results",
          Seq("input-events", "output-results", "processed-events"))
    } else {
      val ts = now.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss"))
      val uuid8 = java.util.UUID.randomUUID().toString.take(8)
      val prefix = s"graft-$ts-$uuid8"
      if (sqlTopics.nonEmpty) {
        val prefixed = sqlTopics.map(t => s"$prefix-$t")
        Resources(prefix, prefixed.head, prefixed.last, prefixed)
      } else
        Resources(prefix, s"$prefix-input", s"$prefix-output",
          Seq(s"$prefix-input", s"$prefix-output", s"$prefix-processed"))
    }
  }
}
