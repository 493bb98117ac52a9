package graft

import graft.operators.PiiScrub
import org.apache.spark.sql.functions._

class PiiScrubSpec extends GraftSpec {
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("t").select(PiiScrub.scrub(col("t"))).head().getString(0)

  test("scrub redacts emails, IPv4s and phones with typed placeholders") {
    assert(scrubOne("mail a.b+c@ex-1.co.uk now") == "mail <EMAIL> now")
    assert(scrubOne("host 192.168.0.1 up") == "host <IP> up")
    assert(scrubOne("call 555-0142 today") == "call <PHONE> today")
    assert(scrubOne("u7@ex3.org from 10.4.3.7 call 555-0042")
      == "<EMAIL> from <IP> call <PHONE>")
  }

  test("scrub is idempotent and leaves PII-free text unchanged") {
    val clean = "key agg row scan slow fast 12 bananas 3.5"
    assert(scrubOne(clean) == clean)
    val once = scrubOne("u7@ex3.org at 10.4.3.7 call 555-0042")
    assert(scrubOne(once) == once, "placeholders must not re-match any pattern")
  }

  test("word boundaries keep the numeric patterns from eating supersets") {
    // 5 dot-separated octet groups: RE2 and Java both take the LEFTMOST
    // 4-octet match and leave the tail — pin that (engine agreement is
    // what the oracle gate relies on; verified against DuckDB directly)
    assert(scrubOne("v 1.2.3.4.5 w") == "v <IP>.5 w")
    // longer digit runs around the dash are NOT phones
    assert(scrubOne("id 1234-5678 x") == "id 1234-5678 x")
  }

  test("octets outside 0-255 are not addresses") {
    assert(scrubOne("x 999.999.999.999 y") == "x 999.999.999.999 y")
    assert(scrubOne("x 256.1.2.3 y") == "x 256.1.2.3 y")
    assert(scrubOne("x 0.0.0.0 and 255.255.255.255 y") == "x <IP> and <IP> y")
    assert(scrubOne("x 249.200.199.100 y") == "x <IP> y")
  }

  test("the fixture's negative third is untouched end to end") {
    val out = PiiScrub.redactedDocs(spark, sf0001)
      .join(Tables.documents(spark, sf0001), "doc_id")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("n_emails") + col("n_ipv4") + col("n_phones"),
        (md5(col("text")) === col("scrub_md5")).as("same"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(0) == 0 && r.getBoolean(1)),
      "docs without injected PII must come back byte-identical")
  }

  test("every augmented doc is detected and scrubbed") {
    val stats = PiiScrub.scrubStats(spark, sf0001).collect()
    val docs = stats.map(_.getLong(1)).sum
    val withPii = stats.map(_.getLong(2)).sum
    val aug = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(3)) =!= 0).count()
    assert(withPii == aug, s"expected $aug PII docs, detected $withPii of $docs")
    assert(stats.map(_.getLong(6)).sum > 0, "scrub must remove characters")
  }
}
