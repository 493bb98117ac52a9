package graft

import graft.sources.SourceConfig
import graft.sources.SourceConfig.StreamCredentials

/** S2 rebuild: credential/config loading with the reference's file shape
  * (4 ordered lines) but actionable failures and no secret leakage. */
class SourceConfigSpec extends GraftSpec {

  private val creds = StreamCredentials("ck-1234", "cs-5678", "at-abcd", "ats-efgh")

  test("parse: reference 4-line order, extra lines ignored like the ':: _' tail") {
    val got = SourceConfig.parse(Seq("ck-1234", "cs-5678", "at-abcd", "ats-efgh", "junk"))
    assert(got == creds)
  }

  test("parse: short file fails with origin and count, not a bare MatchError") {
    val err = intercept[IllegalArgumentException] {
      SourceConfig.parse(Seq("only", "three", "lines"), "config.txt")
    }
    assert(err.getMessage.contains("config.txt") && err.getMessage.contains("got 3"),
      err.getMessage)
  }

  test("loadFile: round-trips a reference-format file; unreadable path names itself") {
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".txt")
    java.nio.file.Files.write(f,
      "ck-1234\ncs-5678\nat-abcd\nats-efgh\n".getBytes("UTF-8"))
    assert(SourceConfig.loadFile(f.toString) == creds)
    val err = intercept[IllegalArgumentException] {
      SourceConfig.loadFile("/nonexistent/config.txt")
    }
    assert(err.getMessage.contains("/nonexistent/config.txt"), err.getMessage)
  }

  test("session conf wins over file; partial conf is an error, not a fallback") {
    val keys = Seq("consumerKey", "consumerSecret", "accessToken", "accessTokenSecret")
      .map("spark.graft.source." + _)
    try {
      assert(SourceConfig.fromSessionConf(spark).isEmpty)
      keys.zip(Seq("ck-1234", "cs-5678", "at-abcd", "ats-efgh")).foreach {
        case (k, v) => spark.conf.set(k, v)
      }
      assert(SourceConfig.fromSessionConf(spark).contains(creds))
      assert(SourceConfig.resolve(spark).contains(creds))
      spark.conf.unset(keys.last)
      val err = intercept[IllegalArgumentException](SourceConfig.fromSessionConf(spark))
      assert(err.getMessage.contains(keys.last), err.getMessage)
    } finally keys.foreach(spark.conf.unset)
  }

  test("redacted rendering never contains a secret; JAAS escaping is injection-safe") {
    val r = SourceConfig.redacted(creds)
    assert(!r.contains("cs-5678") && !r.contains("ats-efgh"), r)
    assert(r.contains("REDACTED"))
    val evil = creds.copy(accessTokenSecret = """pw" onelog="x\""")
    val jaas = SourceConfig.saslJaasConfig(evil)
    // the quote and backslash must arrive escaped, so the JAAS value can't
    // terminate early and smuggle extra options
    assert(jaas.contains("""pw\" onelog=\"x\\"""), jaas)
    val opts = SourceConfig.securedKafkaOptions(
      graft.streaming.StreamingWindows.kafkaSourceOptions("broker:9092", "events"), creds)
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts.contains("kafka.sasl.jaas.config") && opts("subscribe") == "events")
  }
}
