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
    // Not SQL-expressible (partition-local imperative batching) →
    // rows-only driver check; MultimodalSpec covers the semantics.
    // The histogram is emitted as its JSON rendering: the driver's
    // rows-only check sorts/hashes pandas rows and an Array[Double]
    // cell is unhashable there. The typed array stays internal
    // (MultimodalStub.features); only the registered query surface
    // serializes.
    Q.noOracle("q42_multimodal_features") { (s, d) =>
      MultimodalStub.features(Tables.documents(s, d))
        .withColumn("histogram", to_json(col("histogram")))
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
