package graft.ext

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run batch
  * "decode → feature-extract" as a typed partition-local pipeline.
  *
  * No media codecs exist in this environment, so the decode step is a
  * clearly-marked DETERMINISTIC STUB ([[MultimodalStub.decodeStub]]):
  * it derives fake dimensions and a 16-bin byte histogram from the raw
  * bytes. Everything around the stub — the binary schema, the
  * batch-shaped `mapPartitions` (the Scala analog of `mapInPandas`
  * batches), the feature schema, and the metadata projection — is real
  * Spark plumbing and is what this module demonstrates/tests. Swapping
  * the stub for a real JPEG/ffmpeg decoder changes one function.
  *
  * Scale notes: payload columns dominate scan width at 100 TB — the
  * metadata query (q41) never materializes payloads beyond the hash/
  * length kernels (column pruning keeps other queries payload-free),
  * and the feature pipeline (q42) is a narrow partition-local map with
  * bounded batch memory (`grouped(64)`), no shuffle, no driver
  * collect.
  */
object Multimodal {

  val all: Seq[Q] = Seq(
    // ── Binary payload + typed metadata projection ─────────────────────
    // The payload is carried as `binary`; byte length and content hash
    // come from the bytes; "decoded" dimensions/format stand in for
    // codec-header metadata (derived deterministically from the hash so
    // the oracle can verify the full pipeline shape).
    Q(
      "q41_asset_metadata",
      """SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  md5(text) AS content_md5,
        |  16 + ('0x' || substr(md5(text), 1, 4))::INT % 2032  AS width,
        |  16 + ('0x' || substr(md5(text), 5, 4))::INT % 2032  AS height,
        |  CASE ('0x' || substr(md5(text), 9, 2))::INT % 3
        |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          col("text").cast("binary").as("data"))
        .select(
          col("doc_id"),
          octet_length(col("data")).as("n_bytes"),
          md5(col("data")).as("content_md5"),
          expr("16 + cast(conv(substr(md5(text), 1, 4), 16, 10) as int) % 2032").as("width"),
          expr("16 + cast(conv(substr(md5(text), 5, 4), 16, 10) as int) % 2032").as("height"),
          expr("""CASE cast(conv(substr(md5(text), 9, 2), 16, 10) as int) % 3
                 |  WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END""".stripMargin)
            .as("format"))
    },

    // ── Typed batch decode → feature pipeline (stubbed codec) ──────────
    // The decode itself is partition-local imperative code, but every
    // stub output is a pure function of the payload bytes, so the whole
    // pipeline IS oracle-checkable: n_bytes/width/height are length
    // formulas, and the 16-bin high-nibble histogram is recomputed in
    // DuckDB from hex(encode(text)) — hex digit 2i-1 of the UTF-8 blob
    // is byte i's high nibble, so this is byte-level (UTF-8-safe), not
    // an ASCII approximation. Bins are emitted as 16 DOUBLE columns
    // rather than a JSON string: count/len is a single correctly-
    // rounded division of identical integers on both engines (bit-
    // exact), whereas JSON double *formatting* is engine-specific.
    Q(
      "q42_multimodal_features",
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx,
         |         octet_length(encode(text)) AS len
         |  FROM documents
         |), n AS (
         |  SELECT doc_id, ('0x' || substr(hx, 2*CAST(t.i AS INT) - 1, 1))::INT AS nib
         |  FROM b, UNNEST(range(1, len + 1)) AS t(i)
         |)
         |SELECT b.doc_id, b.len AS n_bytes,
         |  16 + (b.len*31+7)%2032 AS width,
         |  16 + (b.len*17+3)%2032 AS height,
         |${(0 until 16).map(k =>
             s"  CASE WHEN b.len=0 THEN 0.0 ELSE (count(*) FILTER (nib=$k))::DOUBLE / b.len END AS h$k")
             .mkString(",\n")}
         |FROM b LEFT JOIN n ON b.doc_id = n.doc_id
         |GROUP BY b.doc_id, b.len""".stripMargin) { (s, d) =>
      MultimodalStub.features(Tables.documents(s, d))
        .select(col("doc_id") +: col("n_bytes") +: col("width") +: col("height") +:
          (0 until 16).map(k => col("histogram").getItem(k).as(s"h$k")): _*)
    })
}

object MultimodalStub {
  /** One decoded asset: fake dimensions + 16-bin byte histogram. */
  final case class AssetFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      histogram: Array[Double])

  /** STUB decoder — stands in for a real codec (jpeg/ffmpeg/…).
    * Deterministic pure function of the payload bytes: callers get
    * stable fake dimensions and a normalized byte histogram. Replace
    * this body with the real decode when codec libs are available; the
    * surrounding pipeline (schema, batching) does not change.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): AssetFeatures = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    if (bytes.length > 0) {
      var k = 0
      while (k < 16) { hist(k) /= bytes.length; k += 1 }
    }
    AssetFeatures(
      doc_id = docId,
      n_bytes = bytes.length,
      // long arithmetic: length * 31 overflows Int for ~69 MB payloads
      width = 16 + ((bytes.length.toLong * 31 + 7) % 2032).toInt,
      height = 16 + ((bytes.length.toLong * 17 + 3) % 2032).toInt,
      histogram = hist)
  }

  /** documents → binary payload → batched partition-local decode.
    * `grouped(64)` gives the decoder batch shape (amortizes real-codec
    * setup per batch, bounds memory), mirroring Arrow-batch semantics
    * of `mapInPandas`.
    */
  def features(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.map { case (id, bytes) => decodeStub(id, bytes) }
        }
      }
      .toDF()
  }
}
