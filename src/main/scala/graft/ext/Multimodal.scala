package graft.ext

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run batch
  * "decode → feature-extract" as a typed partition-local pipeline.
  *
  * The decode step is PLUGGABLE behind the session flag
  * `spark.graft.multimodal.codec` (see [[MultimodalStub.features]]):
  *  - `stub` (default): a clearly-marked DETERMINISTIC STUB
  *    ([[MultimodalStub.decodeStub]]) deriving fake dimensions and a
  *    16-bin byte histogram from the raw bytes — oracle-checkable, no
  *    codec libs needed.
  *  - `imageio`: a REAL decode path ([[MultimodalStub.decodeImage]])
  *    through the JDK's javax.imageio (jpeg/png/gif/bmp readers ship
  *    with the JVM): actual pixel dimensions and a 16-bin luminance
  *    histogram. This is the production shape — external codecs
  *    (ffmpeg, libjpeg-turbo) slot in as further cases of
  *    [[MultimodalStub.decoder]] without touching the pipeline.
  * Everything around the codec — the binary schema, the batch-shaped
  * `mapPartitions` (the Scala analog of `mapInPandas` batches), the
  * feature schema, and the metadata projection — is identical for
  * every codec; MultimodalSpec runs the same pipeline under both
  * flags. q42 pins `stub` explicitly: its DuckDB oracle re-derives the
  * stub's byte-level features, which a real codec by design does not
  * produce.
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
      MultimodalStub.features(Tables.documents(s, d), codec = Some("stub"))
        .select(col("doc_id") +: col("n_bytes") +: col("width") +: col("height") +:
          (0 until 16).map(k => col("histogram").getItem(k).as(s"h$k")): _*)
    },

    // ── Video frame sampling: 1:N batch decode (every-Nth-frame) ───────
    // The video-pipeline primitive the image path (q42) can't model:
    // one asset fans out to MANY rows. The payload is treated as a
    // fixed-stride frame container (128-byte frames; a real demuxer
    // parses the container header instead — it slots into the same
    // decoder seam), every 4th frame is sampled and its 32-byte prefix
    // ("thumbnail read") summarized. The emission is a partition-local
    // batched flatMap — the Scala analog of a mapInPandas explode, no
    // shuffle, memory bounded by batch × frames-per-asset. Every output
    // is integer byte math, so the oracle re-derives it from
    // hex(encode(text)) byte values exactly (q42's hex trick, two
    // digits per byte this time).
    Q(
      "q74_frame_sample",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS len
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
        |         ('0x' || substr(hx, 2*CAST(t.i AS INT) - 1, 2))::INT AS byteval
        |  FROM b, UNNEST(range(1, len + 1)) AS t(i)
        |)
        |SELECT doc_id, (i - 1) // 128 AS frame_idx,
        |  ((i - 1) // 128) * 128 AS byte_offset,
        |  count(*) AS n_bytes,
        |  CAST(sum(byteval) AS BIGINT) AS byte_sum
        |FROM n
        |WHERE ((i - 1) // 128) % 4 = 0 AND (i - 1) % 128 < 32
        |GROUP BY doc_id, (i - 1) // 128""".stripMargin) { (s, d) =>
      MultimodalStub.frameSamples(Tables.documents(s, d))
    },

    // ── Resize / thumbnail pipeline (fixed-budget downsample) ──────────
    // The remaining multimodal verb: map each payload onto a FIXED
    // 64-sample budget (stride positions (i·len)//n — strictly
    // increasing for len > n, identity below) and summarize the
    // samples. The stub resamples raw bytes (integer-exact, so the
    // oracle re-derives every output from hex byte values); the real
    // image path ([[MultimodalStub.resizeImage]], MultimodalSpec) does
    // an actual Graphics2D scale behind the same seam. Fixed-budget
    // downsampling is the 100 TB property: downstream cost per asset is
    // O(64) regardless of source size, decided at the scan.
    Q(
      "q77_thumbnails",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS len
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, hx,
        |         (CAST(t.i AS BIGINT) * len) // least(64, len) AS p
        |  FROM b, UNNEST(range(0, least(64, len))) AS t(i)
        |), v AS (
        |  SELECT doc_id, ('0x' || substr(hx, 2*CAST(p AS INT) + 1, 2))::INT AS byteval
        |  FROM pos
        |)
        |SELECT doc_id, count(*) AS n_sampled,
        |  CAST(sum(byteval) AS BIGINT) AS thumb_sum,
        |  CAST(min(byteval) AS BIGINT) AS thumb_min,
        |  CAST(max(byteval) AS BIGINT) AS thumb_max
        |FROM v GROUP BY doc_id""".stripMargin) { (s, d) =>
      MultimodalStub.thumbnails(Tables.documents(s, d))
    },

    // ── Audio segmentation: fixed-duration windowing + energy ──────────
    // The audio-modality verb (VAD/windowing): treat the payload as a
    // sample stream, cut it into fixed 1024-byte segments, and emit
    // per-segment energy — the projection every downstream audio step
    // (silence trimming, ASR batching, loudness normalization) keys on.
    // Like q74's frames, one asset fans out to MANY rows through the
    // shared batched partition-local seam (a real PCM decoder slots in
    // front without touching the segmentation); energy is an integer
    // byte sum, so the oracle re-derives every row from hex, and the
    // floor-mean is exact. Empty payloads emit no segments.
    Q(
      "q134_audio_segments",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS len
        |  FROM documents
        |), byt AS (
        |  SELECT doc_id, (CAST(t.i AS INT) - 1) // 1024 AS seg,
        |         ('0x' || substr(hx, 2*CAST(t.i AS INT) - 1, 2))::INT AS v
        |  FROM b, UNNEST(range(1, len + 1)) AS t(i)
        |)
        |SELECT doc_id, CAST(seg AS BIGINT) AS seg_idx,
        |  CAST(count(*) AS BIGINT) AS seg_bytes,
        |  CAST(sum(v) AS BIGINT) AS energy,
        |  CAST(sum(v) * 100 // count(*) AS BIGINT) AS mean_centi
        |FROM byt GROUP BY doc_id, seg""".stripMargin) { (s, d) =>
      MultimodalStub.audioSegments(Tables.documents(s, d))
    })
}

object MultimodalStub {
  /** One-time per-JVM ImageIO setup (r12 ADVICE: the flag flip is a
    * PROCESS-GLOBAL side effect, so it lives in static init, not in the
    * per-row decode path). ImageIO.read(InputStream) wraps its input in
    * a DISK-backed ImageInputStream when useCache is true (the JDK
    * default): every decode creates+writes+deletes a temp file. All
    * graft decode inputs are in-memory byte arrays, so the disk cache
    * is pure contention — the r12 parallelism sweep measured per-core
    * decode throughput 5× LOWER at 32 threads than at 4 with the
    * default on (probe:"multimodal_parts_r12"). GLOBAL EFFECT: any
    * other ImageIO caller in this JVM (e.g. file/network-stream
    * decodes that benefit from the disk cache) also switches to
    * memory-cached streams once a graft decode path has run. A lazy
    * val is JVM-once and thread-safe, and executors reach it through
    * the decode closures on first use.
    */
  private lazy val imageIOMemoryCached: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

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

  /** REAL decode path through the JDK's javax.imageio: actual pixel
    * dimensions plus a 16-bin Rec.601 luminance histogram (integer
    * weights — deterministic across JVMs, unlike float luma). Fails
    * loudly on an undecodable payload: a corrupt asset silently
    * producing zeros would poison downstream training-data filters.
    */
  def decodeImage(docId: Long, bytes: Array[Byte]): AssetFeatures = {
    // memory-cached ImageIO streams (see [[imageIOMemoryCached]]):
    // referencing the lazy val performs the one-time per-JVM setup
    imageIOMemoryCached
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload for doc $docId (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val hist = new Array[Double](16)
    // bulk row fetch: per-pixel getRGB(x, y) pays bounds checks and a
    // ColorModel conversion per call — an order of magnitude slower on
    // megapixel assets, and decode dominates this pipeline's cost. One
    // row at a time bounds the scratch buffer at O(width), not O(w*h).
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 4) += 1.0
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    if (n > 0) { var k = 0; while (k < 16) { hist(k) /= n; k += 1 } }
    AssetFeatures(docId, bytes.length, w, h, hist)
  }

  /** Codec registry for [[features]]. Names resolve to static pure
    * functions (nothing captured → trivially serializable to
    * executors); unknown names fail on the driver before any task
    * launches.
    */
  def decoder(name: String): (Long, Array[Byte]) => AssetFeatures = name match {
    case "stub"    => decodeStub
    case "imageio" => decodeImage
    case other => throw new IllegalArgumentException(
      s"unknown multimodal codec '$other' (expected stub|imageio)")
  }

  /** Flag selecting the decode implementation (see [[decoder]]). */
  val CodecFlag = "spark.graft.multimodal.codec"

  /** One sampled video frame summary (see [[frameSamples]]). */
  final case class FrameSample(
      doc_id: Long,
      frame_idx: Long,
      byte_offset: Long,
      n_bytes: Long,
      byte_sum: Long)

  /** Fixed-stride frame extraction from one payload: frames of
    * `frameBytes`, every `every`-th sampled, `readBytes` prefix
    * summarized by its exact byte sum. A real demuxer replaces the
    * stride arithmetic with container parsing behind the same
    * signature.
    */
  def sampleFrames(
      docId: Long, bytes: Array[Byte],
      frameBytes: Int = 128, every: Int = 4, readBytes: Int = 32): Seq[FrameSample] = {
    val out = Seq.newBuilder[FrameSample]
    var off = 0
    var idx = 0L
    while (off < bytes.length) {
      var sum = 0L
      var n = 0
      while (n < readBytes && off + n < bytes.length) {
        sum += bytes(off + n) & 0xff
        n += 1
      }
      out += FrameSample(docId, idx, off.toLong, n.toLong, sum)
      off += frameBytes * every
      idx += every
    }
    out.result()
  }

  /** assets → binary payload → batched 1:N frame-sample emission (the
    * video analog of [[features]]'s 1:1 decode; same batch discipline,
    * `flatMap` instead of `map`).
    */
  def frameSamples(
      docs: org.apache.spark.sql.DataFrame,
      payloadCol: String = "text"): org.apache.spark.sql.DataFrame =
    perPayload(docs, payloadCol)((id, bytes) => sampleFrames(id, bytes))

  /** One fixed-budget thumbnail summary (see [[thumbnails]]). */
  final case class Thumb(
      doc_id: Long,
      n_sampled: Long,
      thumb_sum: Long,
      thumb_min: Long,
      thumb_max: Long)

  /** STUB resize: downsample the payload to ≤`n` bytes at stride
    * positions (i·len)//m, m = min(n, len) — strictly increasing for
    * len > n, identity below — and summarize. Empty payloads emit
    * nothing (no samples to summarize).
    */
  def resampleStub(docId: Long, bytes: Array[Byte], n: Int = 64): Option[Thumb] = {
    val m = math.min(n, bytes.length)
    if (m == 0) None
    else {
      var sum = 0L; var mn = 255L; var mx = 0L
      var i = 0
      while (i < m) {
        val v = bytes(((i.toLong * bytes.length) / m).toInt) & 0xff
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      Some(Thumb(docId, m.toLong, sum, mn, mx))
    }
  }

  /** REAL resize through Graphics2D: decode via [[decodeImage]]'s
    * reader, scale to `w`×`h`, and return the thumbnail's features —
    * the production resize slotting behind the same fixed-budget seam
    * as [[resampleStub]] (MultimodalSpec drives it on a generated
    * image).
    */
  def resizeImage(docId: Long, bytes: Array[Byte], w: Int, h: Int): AssetFeatures = {
    // same one-time ImageIO setup as decodeImage (this path can run first)
    imageIOMemoryCached
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload for doc $docId (${bytes.length} bytes)")
    val thumb = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = thumb.createGraphics()
    try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(thumb, "png", buf)
    decodeImage(docId, buf.toByteArray)
  }

  /** assets → binary payload → batched fixed-budget thumbnail summary
    * (same batch discipline as [[features]]/[[frameSamples]]).
    */
  def thumbnails(
      docs: org.apache.spark.sql.DataFrame,
      payloadCol: String = "text"): org.apache.spark.sql.DataFrame =
    perPayload(docs, payloadCol)((id, bytes) => resampleStub(id, bytes))

  /** One fixed-duration audio window (see q134). */
  final case class AudioSegment(
      doc_id: Long,
      seg_idx: Long,
      seg_bytes: Long,
      energy: Long,
      mean_centi: Long)

  /** assets → binary payload → fixed 1024-byte segment windows with
    * integer energy (Σ unsigned byte values) — the audio windowing
    * primitive behind the same batched seam as [[frameSamples]]. A
    * real PCM/codec decode slots in front; the segmentation and energy
    * accounting do not change.
    */
  def audioSegments(
      docs: org.apache.spark.sql.DataFrame,
      payloadCol: String = "text",
      segBytes: Int = 1024): org.apache.spark.sql.DataFrame =
    perPayload(docs, payloadCol) { (id, bytes) =>
      bytes.grouped(segBytes).zipWithIndex.map { case (chunk, i) =>
        var energy = 0L
        var j = 0
        while (j < chunk.length) { energy += chunk(j) & 0xff; j += 1 }
        AudioSegment(id, i.toLong, chunk.length.toLong, energy,
          energy * 100 / chunk.length)
      }
    }

  /** assets → binary payload → batched partition-local decode.
    * `grouped(64)` gives the decoder batch shape (amortizes real-codec
    * setup per batch, bounds memory), mirroring Arrow-batch semantics
    * of `mapInPandas`. The codec comes from the explicit `codec`
    * argument when given (q42 pins the stub its oracle mirrors),
    * otherwise from the [[CodecFlag]] session conf — the production
    * feature-flag path.
    */
  def features(
      docs: org.apache.spark.sql.DataFrame,
      payloadCol: String = "text",
      codec: Option[String] = None): org.apache.spark.sql.DataFrame = {
    // resolve on the driver: bad codec names fail fast, and the
    // resolved function (not the conf lookup) ships to executors
    val decode = decoder(
      codec.getOrElse(docs.sparkSession.conf.get(CodecFlag, "stub")))
    perPayload(docs, payloadCol)((id, bytes) => Seq(decode(id, bytes)))
  }

  /** The ONE batched payload-decode wrapper behind features /
    * frameSamples / thumbnails: (doc_id, payload) batches of 64 through
    * a per-asset function emitting 0..N typed rows. Batch discipline
    * (shape, size) lives here only, so the three pipelines cannot
    * drift.
    */
  private def perPayload[T <: Product: _root_.scala.reflect.runtime.universe.TypeTag](
      docs: org.apache.spark.sql.DataFrame,
      payloadCol: String)(
      f: (Long, Array[Byte]) => IterableOnce[T]): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[T] =
      org.apache.spark.sql.Encoders.product[T]
    docs.select(col("doc_id"), col(payloadCol).cast("binary").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          batch.flatMap { case (id, bytes) => f(id, bytes) }
        }
      }
      .toDF()
  }
}
