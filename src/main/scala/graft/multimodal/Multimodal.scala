package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A media asset as it would land from ingestion: opaque bytes + typed
  * metadata. At 100 TB the `payload` column dominates storage; all
  * metadata-only queries must prune it at the parquet scan (never
  * SELECT * a media table).
  */
case class MediaAsset(doc_id: Long, media_type: String, n_bytes: Long,
    checksum: String, payload: Array[Byte])

/** Decoded features for one asset. */
case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, channels: Int, histogram: Array[Double])

/** Resize/thumbnail output: boxed dimensions + scale + content hash. */
case class ThumbFeatures(doc_id: Long, out_w: Int, out_h: Int,
    scale_x: Double, thumb_md5: String)

/** Multimodal-column plumbing: image/audio/video as `binary` columns.
  *
  * The Spark-side structure is real — schema, column pruning, batched
  * per-partition decode (the JVM analog of `mapInPandas` batches), and
  * feature extraction — while the actual codec is a STUB: this container
  * has no image/audio libraries, so `decodeBatch` computes deterministic
  * fake features from the bytes. Swapping in a real decoder changes one
  * function.
  */
object Multimodal {

  /** Media table derived deterministically from `documents` (the corpus
    * has no real binary assets): payload = UTF-8 text bytes.
    */
  def mediaAssets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      // route by id: 0=image, 1=audio, 2=video
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      md5(col("text")).as("checksum"),
      col("text").cast("binary").as("payload"))

  /** Deterministic synthetic PNG per document: dimensions and the solid
    * fill color are pure functions of doc_id, so the oracle can PREDICT
    * them arithmetically while the engine must actually DECODE the PNG
    * bytes to recover them — a real round-trip check on the codec path.
    * Generated executor-side in mapPartitions; bytes never touch the
    * driver.
    */
  def imageAssets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long].mapPartitions { it =>
      // ImageIO's default stream cache spools through a TEMP FILE per
      // image — per-row disk syscalls for fully-in-memory payloads.
      // Thread-safe static toggle; executors only ever use it this way.
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (id % 48 + 16).toInt
        val h = (id % 29 + 16).toInt
        val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 13) % 256)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        MediaAsset(id, "image", bytes.length.toLong,
          md.map("%02x".format(_)).mkString, bytes)
      }
    }
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isBmp(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'B' && b(1) == 'M'

  // ===================== DECODER (real + stub) ====================
  // PNG/BMP payloads take a REAL decode through javax.imageio (ships
  // with the JDK — no new deps): width/height/channels come from the
  // decoded raster and the histogram from actual pixel values. Other
  // media types (audio/video — no codec libs in this container) keep the
  // deterministic fake, clearly stubbed; swapping in ffmpeg-style
  // bindings changes only that branch. The signature — a BATCH of assets
  // in, features out — is the contract that matters for Spark:
  // batch-at-a-time amortizes codec init per partition.
  // ==============================================================
  def decodeBatch(batch: Seq[MediaAsset]): Seq[MediaFeatures] = {
    javax.imageio.ImageIO.setUseCache(false) // in-memory bytes; no temp-file spool
    batch.map { a =>
      val img =
        if (isPng(a.payload) || isBmp(a.payload))
          // the magic sniff is cheap and loose (BMP's is just "BM"), so
          // the codec CAN claim a stream and then throw (IIOException,
          // even NegativeArraySizeException from a hostile BMP header).
          // A poison asset must fall through to the stub, not kill the
          // task — same contract as read() returning null.
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
          catch { case _: Exception => null } // incl. NegativeArraySizeException et al.
        else null
      if (img != null) {
        // real decode: histogram of the red channel over all pixels
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Double](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            hist(((img.getRGB(x, y) >> 16) & 0xff) >> 5) += 1.0
            x += 1
          }
          y += 1
        }
        MediaFeatures(a.doc_id, a.media_type, a.n_bytes, w, h,
          channels = img.getColorModel.getNumComponents,
          histogram = hist.map(_ / (w.toLong * h)))
      } else {
        val n = a.n_bytes
        val hist = new Array[Double](8)
        a.payload.foreach(b => hist(((b & 0xff) >> 5)) += 1.0)
        val total = math.max(1.0, a.payload.length.toDouble)
        MediaFeatures(a.doc_id, a.media_type, n,
          width = (n % 64).toInt + 1,
          height = (n % 37).toInt + 1,
          channels = 3,
          histogram = hist.map(_ / total))
      }
    }
  }

  /** Batched decode over partitions: groups each partition's rows into
    * fixed-size batches (decoder-friendly), never materializing the
    * whole partition. Payload bytes stay executor-local.
    */
  def decodeFeatures(assets: Dataset[MediaAsset], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatch))
  }

  /** Stub resize: decode + fit-to-box + thumbnail hash in ONE batched
    * pass per partition (decode→transform chains must not re-batch or
    * re-shuffle between steps). Real codec swap point = this body.
    */
  val THUMB_BOX = 32

  def resizeBatch(batch: Seq[MediaAsset]): Seq[ThumbFeatures] =
    batch.map { a =>
      val w = (a.n_bytes % 64).toInt + 1
      val h = (a.n_bytes % 37).toInt + 1
      val ow = math.min(w, THUMB_BOX)
      val oh = math.min(h, THUMB_BOX)
      val slice = a.payload.take(ow * oh)
      val md = java.security.MessageDigest.getInstance("MD5").digest(slice)
      ThumbFeatures(a.doc_id, ow, oh, w.toDouble / ow,
        md.map("%02x".format(_)).mkString)
    }

  def resizeFeatures(assets: Dataset[MediaAsset], batchSize: Int = 64): Dataset[ThumbFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(batchSize).flatMap(resizeBatch))
  }

  /** Frame sampling analog: fixed-width windows of the payload as
    * "frames", each fingerprinted — video keyframe extraction shape
    * (explode stays lazy; no driver materialization).
    */
  val FRAME_CHARS = 100

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Metadata/decode projection — oracle-checked (stub features are
    // pure SQL-expressible functions of the bytes).
    "multimodal_decode" -> ((s, d) => {
      import s.implicits._
      decodeFeatures(mediaAssets(s, d).as[MediaAsset])
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("channels"))
    }),

    // REAL codec round trip: synthesize a deterministic solid-color PNG
    // per doc (dims + color are functions of doc_id), then decode it
    // with javax.imageio. The oracle predicts width/height/channels and
    // the histogram's solid bucket arithmetically — the engine can only
    // match by actually decoding the bytes (header AND pixels).
    "multimodal_decode_png" -> ((s, d) => {
      import s.implicits._
      decodeFeatures(imageAssets(s, d))
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          // solid color ⇒ every pixel lands in ONE bucket with weight
          // exactly 1.0; its 1-based index encodes the red channel >> 5
          array_position(col("histogram"), 1.0).as("solid_bucket"))
    }),

    // Resize/thumbnail: batched decode→transform chain; the stub's
    // features are SQL-expressible so the result is fully oracle-checked
    // (thumb hash = md5 of the boxed byte window).
    "multimodal_resize" -> ((s, d) => {
      import s.implicits._
      resizeFeatures(mediaAssets(s, d).as[MediaAsset]).toDF()
    }),

    // Frame sampling: one row per fixed-size window with fingerprint.
    "multimodal_frames" -> ((s, d) => {
      val nFrames =
        expr(s"CAST((length(text) + ${FRAME_CHARS - 1}) DIV $FRAME_CHARS AS INT)")
      Tables.documents(s, d)
        // guard empty docs: sequence(0, -1) would generate a DESCENDING
        // [0, -1] in Spark while the oracle's range(0, 0) is empty
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), nFrames - 1),
            k => struct(k.cast("int").as("frame_id"),
              md5(col("text").substr(k * FRAME_CHARS + 1, lit(FRAME_CHARS)))
                .as("frame_md5")))).as("f"))
        .select(col("doc_id"), col("f.frame_id"), col("f.frame_md5"))
    })
  )

  val oracles: Map[String, String] = Map(
    "multimodal_decode" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
        |  CAST(octet_length(encode(text)) % 37 + 1 AS INT) AS height,
        |  3 AS channels
        |FROM documents""".stripMargin,
    "multimodal_decode_png" ->
      """SELECT doc_id,
        |  CAST(doc_id % 48 + 16 AS INT) AS width,
        |  CAST(doc_id % 29 + 16 AS INT) AS height,
        |  3 AS channels,
        |  CAST((doc_id % 256) // 32 + 1 AS BIGINT) AS solid_bucket
        |FROM documents""".stripMargin,
    "multimodal_resize" ->
      s"""WITH t AS (SELECT doc_id, text,
         |    octet_length(encode(text)) % 64 + 1 AS w,
         |    octet_length(encode(text)) % 37 + 1 AS h
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(LEAST(w, $THUMB_BOX) AS INT) AS out_w,
         |  CAST(LEAST(h, $THUMB_BOX) AS INT) AS out_h,
         |  CAST(w AS DOUBLE) / LEAST(w, $THUMB_BOX) AS scale_x,
         |  md5(substr(text, 1, LEAST(w, $THUMB_BOX) * LEAST(h, $THUMB_BOX))) AS thumb_md5
         |FROM t""".stripMargin,
    "multimodal_frames" ->
      s"""SELECT doc_id, CAST(k AS INT) AS frame_id,
         |  md5(substr(text, k * $FRAME_CHARS + 1, $FRAME_CHARS)) AS frame_md5
         |FROM (SELECT doc_id, text,
         |  unnest(range(0, (length(text) + ${FRAME_CHARS - 1}) // $FRAME_CHARS)) AS k
         |  FROM documents WHERE length(text) > 0) t""".stripMargin
  )
}
