package graft.sources

import org.apache.spark.sql.SparkSession

/** Source credential/config loading — the rebuild of the reference's S2
  * component (`tweet-streamer/src/main/scala/main.scala:21-22`: four
  * ordered lines of `config.txt` destructured into consumerKey /
  * consumerSecret / accessToken / accessTokenSecret).
  *
  * The reference's loader has two failure modes this rebuild fixes:
  * fewer than four lines raises a bare `MatchError` (the `::` destructure
  * at `main.scala:22` is unhandled), and the values flow into logs via
  * `setDebugEnabled(true)`. Here a short file fails with a message naming
  * the file and the line count, and the only render path is [[redacted]].
  *
  * Precedence mirrors 12-factor practice for a cluster job (no secret
  * files on shared disks): explicit session conf (`spark.graft.source.*`,
  * injectable by any secret manager through `--conf`) wins over the
  * reference-compatible file format. No credentials ship with this repo;
  * the live API itself has no offline equivalent (SURVEY §2a S1/S2), so
  * the consumer of this config is the Kafka source surface
  * ([[graft.streaming.StreamingWindows.kafkaSourceOptions]]) via
  * [[saslJaasConfig]].
  */
object SourceConfig {

  final case class StreamCredentials(
      consumerKey: String,
      consumerSecret: String,
      accessToken: String,
      accessTokenSecret: String)

  /** Parse the reference's `config.txt` shape: the first four
    * non-blank-stripped lines, in order. Extra lines are ignored exactly
    * like the reference's `:: _` tail. */
  def parse(lines: Seq[String], origin: String = "<config>"): StreamCredentials = {
    val vals = lines.map(_.trim)
    require(vals.count(_.nonEmpty) >= 4 && vals.take(4).forall(_.nonEmpty),
      s"$origin: need 4 non-empty lines (consumerKey, consumerSecret, " +
        s"accessToken, accessTokenSecret), got ${vals.count(_.nonEmpty)}")
    val Seq(ck, cs, at, ats) = vals.take(4)
    StreamCredentials(ck, cs, at, ats)
  }

  /** Load from a reference-format file. Fails with the path in the message
    * (the reference catches FileNotFoundException/IOException and prints;
    * a cluster job wants the cause propagated so the driver fails fast). */
  def loadFile(path: String): StreamCredentials = {
    val p = java.nio.file.Paths.get(path)
    require(java.nio.file.Files.isReadable(p), s"source config not readable: $path")
    val lines = java.nio.file.Files.readAllLines(p)
    parse(scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala.toSeq, path)
  }

  private val ConfKeys = Seq(
    "spark.graft.source.consumerKey", "spark.graft.source.consumerSecret",
    "spark.graft.source.accessToken", "spark.graft.source.accessTokenSecret")

  /** Credentials from session conf, if ALL four keys are set — partial
    * config is an error (a half-set secret block is a deploy mistake, not
    * a fallback case). */
  def fromSessionConf(s: SparkSession): Option[StreamCredentials] = {
    val vals = ConfKeys.map(s.conf.getOption)
    if (vals.forall(_.isEmpty)) None
    else {
      val missing = ConfKeys.zip(vals).collect { case (k, None) => k }
      require(missing.isEmpty,
        s"partial source credentials in session conf; missing: ${missing.mkString(", ")}")
      val Seq(ck, cs, at, ats) = vals.map(_.get)
      Some(StreamCredentials(ck, cs, at, ats))
    }
  }

  /** Session conf wins over the file (secret-manager injection beats a
    * file on shared disk); file path itself is conf-addressable. */
  def resolve(s: SparkSession): Option[StreamCredentials] =
    fromSessionConf(s).orElse(
      s.conf.getOption("spark.graft.source.configFile").map(loadFile))

  /** Render for logs: identity tail only, never the secret. */
  def redacted(c: StreamCredentials): String = {
    def tail(v: String) = "…" + v.takeRight(math.min(4, math.max(0, v.length - 4)))
    s"StreamCredentials(consumerKey=${tail(c.consumerKey)}, " +
      s"accessToken=${tail(c.accessToken)}, secrets=REDACTED)"
  }

  /** The SASL JAAS line a secured Kafka source needs — how these
    * credentials actually reach [[graft.streaming.StreamingWindows
    * .kafkaSourceOptions]]'s map in a production deployment (keys
    * `kafka.sasl.jaas.config` + mechanism/protocol). Quotes/backslashes in
    * values are escaped per the JAAS grammar so a crafted secret cannot
    * break out of the quoted string. */
  def saslJaasConfig(c: StreamCredentials): String = {
    def esc(v: String) = v.replace("\\", "\\\\").replace("\"", "\\\"")
    "org.apache.kafka.common.security.plain.PlainLoginModule required " +
      s"""username="${esc(c.accessToken)}" password="${esc(c.accessTokenSecret)}";"""
  }

  /** Kafka source options with authentication merged in. */
  def securedKafkaOptions(base: Map[String, String],
                          c: StreamCredentials): Map[String, String] =
    base ++ Map(
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "PLAIN",
      "kafka.sasl.jaas.config" -> saslJaasConfig(c))
}
