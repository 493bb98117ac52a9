package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators — LLM-pipeline extension scope
  * (SURVEY.md §2c): treat media as opaque `binary` payloads with typed
  * metadata, and run decode / feature-extraction as partition-batched
  * transforms.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`decodeStub`); everything around it —
  * the binary column, the metadata struct schema, the partition-batched
  * iterator transform, the downstream aggregation — is real Spark plumbing,
  * which is the part that matters at 100 TB: payload bytes stay columnar in
  * parquet, metadata predicates prune row groups without touching payloads,
  * and decode runs once per partition batch, not per row.
  *
  * The synthetic corpus has no binary column, so payloads are derived
  * (utf-8 bytes of `documents.text`) — the derivation is itself part of the
  * oracle-checked surface (DuckDB `encode()` produces the same bytes).
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  case class MediaMeta(mime: String, width: Int, height: Int, nBytes: Long)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           feat_dim: Int, feat_l1: Double)

  /** Media table: binary payload + metadata struct, derived deterministically
    * from `documents`. The mime/width/height are synthetic but flow through
    * the typed schema the way real EXIF-ish metadata would. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        struct(
          when(col("doc_id") % 3 === 0, "image/png")
            .when(col("doc_id") % 3 === 1, "audio/wav")
            .otherwise("video/mp4").as("mime"),
          (col("doc_id") % 640 + 1).cast("int").as("width"),
          (col("doc_id") % 480 + 1).cast("int").as("height"),
          length(col("text")).cast("long").as("nBytes")).as("meta"))

  // ------------------------------------------------------ metadata queries
  /** Metadata-only scan: digest, size, and a header byte per payload —
    * the "list my corpus" query. Runs without decoding anything; at 100 TB
    * with payloads in their own parquet column, column pruning means the
    * payload bytes ARE read here (digest needs them) but mime/size
    * predicates alone would not. */
  def mediaMetadata(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"), col("meta.mime").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        ascii(substring(col("payload").cast("string"), 1, 1)).as("first_byte"))
      .orderBy("doc_id")

  val mediaMetadataSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  ascii(substring(text, 1, 1)) AS first_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-mime corpus rollup over metadata only. */
  def mediaByMime(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy(col("meta.mime").as("mime"))
      .agg(count(lit(1)).as("n_files"),
           sum(length(col("payload"))).cast("long").as("total_bytes"),
           max(col("meta.width")).as("max_w"),
           max(col("meta.height")).as("max_h"))
      .orderBy("mime")

  val mediaByMimeSql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |            ELSE 'video/mp4' END AS mime,
      |  count(*) AS n_files,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(max(doc_id % 640 + 1) AS INT) AS max_w,
      |  CAST(max(doc_id % 480 + 1) AS INT) AS max_h
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------- decode stub
  /** STUB — stands in for a real codec (libjpeg/ffmpeg/…), which this
    * container does not have. Deterministic fake: "features" are byte
    * histogram moments of the payload. A real deployment swaps ONLY this
    * function; the partition-batched plumbing around it is unchanged. */
  private[graft] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) % 8) += 1f; i += 1 }
    hist
  }

  /** Partition-batched "decode + featurize": the Scala twin of a
    * `mapInPandas` media pipeline — an iterator→iterator transform per
    * partition (constant memory, batch-amortized codec setup), returning a
    * typed Dataset. Feature values are deterministic (stub), so the driver
    * gate gets a stable rows-only result; the scalatest spec pins exact
    * values on a fixture. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .repartition(col("doc_id"))  // spread decode work evenly, not by file
      .mapPartitions { rows =>
        // per-partition codec init happens here (once), then rows are
        // decoded in fixed-size batches — the same batch shape a
        // vectorized/pandas-style decode API wants, with constant memory
        rows.grouped(64).flatMap { batch =>
          batch.map { r =>
            val feats = decodeStub(r.getAs[Array[Byte]]("payload"))
            MediaFeatures(r.getAs[Long]("doc_id"), r.getAs[String]("mime"),
              feats.map(_.toLong).sum, feats.length,
              feats.foldLeft(0.0)((a, f) => a + f))
          }
        }
      }(enc)
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame-sample shape: explode a payload into fixed-stride "frames"
    * (here: 64-byte slices) with per-frame digests — the plumbing of video
    * frame sampling (generator + per-frame map), minus the codec. Slice
    * arithmetic is integer → oracle-checkable in SQL. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"), col("payload").cast("string").as("t"))
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(0, CAST(floor((length(t) - 1) / 64) AS INT)), " +
          "i -> substring(t, i * 64 + 1, 64))")).as(Seq("frame_no", "frame")))
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(encode(col("frame"), "utf-8")).as("frame_digest"))
      .orderBy("doc_id", "frame_no")

  val frameSampleSql: String =
    """WITH v AS (SELECT doc_id, text AS t FROM documents WHERE doc_id % 3 = 2)
      |SELECT doc_id, i - 1 AS frame_no,
      |  CAST(length(substring(t, (i - 1) * 64 + 1, 64)) AS BIGINT) AS frame_len,
      |  md5(substring(t, (i - 1) * 64 + 1, 64)) AS frame_digest
      |FROM v, LATERAL (SELECT unnest(generate_series(1,
      |       CAST(floor((length(t) - 1) / 64) AS BIGINT) + 1)) AS i) g
      |ORDER BY doc_id, frame_no""".stripMargin

  /** Payload-size distribution per mime: exact p50/p90/p99 of byte sizes —
    * the storage-budget profile a corpus owner reads before choosing
    * compression or chunking. Metadata-only (never decodes); DuckDB
    * `quantile_cont` matches Spark `percentile` at round(6). */
  def sizePercentiles(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("meta.mime").as("mime"), length(col("payload")).cast("long").as("nb"))
      .groupBy("mime")
      .agg(count(lit(1)).as("n_files"),
           round(expr("percentile(nb, 0.5)"), 6).as("p50_bytes"),
           round(expr("percentile(nb, 0.9)"), 6).as("p90_bytes"),
           round(expr("percentile(nb, 0.99)"), 6).as("p99_bytes"))
      .orderBy("mime")

  val sizePercentilesSql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |            ELSE 'video/mp4' END AS mime,
      |       count(*) AS n_files,
      |       round(quantile_cont(octet_length(encode(text)), 0.5), 6) AS p50_bytes,
      |       round(quantile_cont(octet_length(encode(text)), 0.9), 6) AS p90_bytes,
      |       round(quantile_cont(octet_length(encode(text)), 0.99), 6) AS p99_bytes
      |FROM documents GROUP BY 1 ORDER BY mime""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata"   -> (mediaMetadata _),
    "mm_by_mime"    -> (mediaByMime _),
    "mm_features"   -> (mediaFeatures _),
    "mm_frame_sample" -> (frameSample _),
    "mm_size_percentiles" -> (sizePercentiles _)
  )

  def oracles: Map[String, String] = Map(
    "mm_metadata"     -> mediaMetadataSql,
    "mm_by_mime"      -> mediaByMimeSql,
    "mm_frame_sample" -> frameSampleSql,
    "mm_size_percentiles" -> sizePercentilesSql
    // mm_features: decode stub is Scala-side → rows-only gate + spec
  )
}
