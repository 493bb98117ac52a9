package graft

import graft.operators.Multimodal

class MultimodalSpec extends GraftSpec {

  test("decode stub is deterministic and shape-stable") {
    val payload = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(payload)
    val f2 = Multimodal.decodeStub(payload)
    assert(f1.sameElements(f2))
    assert(f1.length == 8)
    assert(f1.sum == payload.length.toFloat, "histogram mass = payload bytes")
  }

  test("partition-batched featurize preserves row count and carries mime through") {
    val out = Multimodal.mediaFeatures(spark, sf0001).collect()
    val n = Tables.documents(spark, sf0001).count()
    assert(out.length == n)
    out.foreach { r =>
      assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getString(1)))
      assert(r.getInt(3) == 8)                       // feat_dim
      assert(r.getLong(2) == r.getDouble(4).toLong)  // n_bytes == l1 mass of stub
    }
  }

  test("frame sampling: slice count matches ceil(len/64) and frames reassemble") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf0001)
      .filter("meta.mime = 'video/mp4'")
      .select($"doc_id",
        org.apache.spark.sql.functions.length($"payload").cast("long").as("len"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val frames = Multimodal.frameSample(spark, sf0001)
      .groupBy("doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(frames.keySet == media.keySet)
    frames.foreach { case (id, n) =>
      assert(n == (media(id) + 63) / 64, s"doc $id: $n frames for ${media(id)} bytes")
    }
  }
}
