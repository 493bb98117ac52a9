package graft

import graft.operators.Reference
import org.apache.spark.sql.functions._

/** Tokenizer semantics pinned to the reference
  * (`tweet-streamer/src/main/scala/main.scala:45`:
  * `getText.split(" ").filter(_.startsWith("#"))`). */
class ReferenceSpec extends GraftSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
      .toDF("doc_id", "text", "lang")

  test("split on single space only; consecutive spaces yield no empty tokens") {
    val out = Reference.tokens(docs("a  b c")).select("token").as[String].collect().sorted
    assert(out.sameElements(Array("a", "b", "c")))
  }

  test("case-sensitive, no punctuation stripping (reference keeps '#tag!' as-is)") {
    val out = Reference.tokens(docs("Tag tag #Tag! #tag"))
      .select("token").as[String].collect().sorted
    assert(out.sameElements(Array("#Tag!", "#tag", "Tag", "tag")))
  }

  test("bare '#' counts as a hashtag under startsWith (reference quirk)") {
    val tags = Reference.tokens(docs("# #x y"))
      .filter(col("token").startsWith("#"))
      .select("token").as[String].collect().sorted
    assert(tags.sameElements(Array("#", "#x")))
  }

  test("tokenizer is unicode-safe: split(' ') only breaks on U+0020") {
    val out = Reference.tokens(docs("héllo wörld nbsp 中文 #tag"))
      .select("token").as[String].collect().sorted
    // U+00A0 (nbsp) is NOT a split point — 'wörld nbsp' stays one token
    assert(out.sameElements(Array("#tag", "héllo", "wörld nbsp", "中文")))
  }

  test("flagship top-tokens on sf0.001 is non-empty, ordered by (cnt desc, token)") {
    val rows = Reference.topTokens(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    val sorted = pairs.sortBy { case (c, t) => (-c, t) }
    assert(pairs.sameElements(sorted))
  }
}
