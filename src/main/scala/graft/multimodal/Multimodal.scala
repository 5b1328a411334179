package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
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

/** Decoded audio features for one asset: header metadata + two signal
  * statistics (RMS level, clipping rate) every ingest QC pass wants.
  */
case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
    duration_sec: Double, rms: Double, clip_rate: Double)

/** One decoded frame of a multi-frame (animated GIF) asset: header dims
  * + the solid gray value and the full red-channel pixel sum (the sum
  * forces the engine to decode EVERY pixel, not just the header).
  */
case class GifFrame(doc_id: Long, frame_id: Int, width: Int, height: Int,
    gray: Int, red_sum: Long)

/** Perceptual average-hash of one image: the 64-bit aHash split into two
  * unsigned-32 halves so every engine's integer arithmetic stays inside
  * BIGINT (one signed 64-bit word would need bit-63 two's-complement
  * gymnastics in the oracle).
  */
case class PhashFeatures(doc_id: Long, width: Int, height: Int,
    hash_hi: Long, hash_lo: Long)

/** Multimodal-column plumbing: image/audio/video as `binary` columns.
  *
  * The Spark-side structure is real — schema, column pruning, batched
  * per-partition decode (the JVM analog of `mapInPandas` batches), and
  * feature extraction. So are three codec paths, all pure-JDK: PNG/BMP
  * images and MULTI-FRAME animated GIF through javax.imageio, and
  * WAV/PCM audio through javax.sound.sampled. Only modern compressed
  * codecs (H.264/MP3-class — no such libraries in this container) keep
  * a deterministic fake branch in `decodeBatch` for non-image payloads;
  * swapping in ffmpeg-style bindings changes one function.
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

  /** Gradient-pattern PNG per document for the perceptual-hash path:
    * gray value v(x,y) = (x·a + y·b) mod 256 with slopes (a, b) drawn
    * from SMALL moduli of doc_id, so distinct documents intentionally
    * COLLIDE onto identical patterns — the duplicate structure the
    * perceptual hash must recover from pixels alone. Dimensions are
    * multiples of 8, making every 8×8 average-pool cell an exact integer
    * box; the oracle predicts the full 64-bit aHash arithmetically while
    * the engine must decode the PNG and pool the actual pixels.
    */
  def patternAssets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = ((id % 5) + 2).toInt * 8
        val h = (((id * 3) % 4) + 2).toInt * 8
        val a = (id % 7).toInt
        val b = ((id * 5) % 11).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (x * a + y * b) % 256
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
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

  /** REAL decode + 8×8 average-pool → 64-bit aHash. All-integer: the
    * bit test cellSum·64 ≥ totalSum is the exact form of
    * cellMean ≥ globalMean (cell area = w·h/64), so the hash is
    * bit-identical on any engine that decodes the same pixels.
    */
  def phashFeatures(assets: Dataset[MediaAsset]): Dataset[PhashFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        val w = img.getWidth
        val h = img.getHeight
        val cw = w / 8
        val ch = h / 8
        val cells = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (img.getRGB(x, y) & 0xff).toLong // gray: any channel
            cells((y / ch) * 8 + (x / cw)) += v
            total += v
            x += 1
          }
          y += 1
        }
        var hi = 0L
        var lo = 0L
        var i = 0
        while (i < 64) {
          if (cells(i) * 64 >= total) {
            if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
          }
          i += 1
        }
        PhashFeatures(m.doc_id, w, h, hi, lo)
      }
    }
  }

  /** Deterministic synthetic WAV per document (16-bit mono PCM @ 8 kHz):
    * a ±amp square wave whose length, amplitude, and full-scale-sample
    * pattern are pure functions of doc_id — the audio analog of
    * `imageAssets`. The oracle PREDICTS every feature arithmetically
    * (square wave ⇒ Σx² = nc·32767² + (n−nc)·amp², all integer) while
    * the engine must actually parse the RIFF/WAVE container and the PCM
    * frames to recover them. docs with doc_id % 5 == 0 drive every 4th
    * sample to full scale (32767) to make the clipping detector
    * non-vacuous. Bytes are synthesized executor-side; never collected.
    */
  private[multimodal] val AUDIO_RATE = 8000
  private[multimodal] val CLIP_LEVEL = 32000 // |sample| ≥ this ⇒ clipped

  def audioAssets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (id % 480 + 32).toInt
        val amp = ((id * 37) % 28000 + 1000).toInt
        val clip4 = id % 5 == 0
        val data = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val v: Int =
            if (clip4 && i % 4 == 0) 32767
            else if (i % 2 == 0) amp
            else -amp
          data(2 * i) = (v & 0xff).toByte
          data(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          AUDIO_RATE.toFloat, 16, 1, true, false) // signed little-endian
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val bytes = bos.toByteArray
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        MediaAsset(id, "audio", bytes.length.toLong,
          md.map("%02x".format(_)).mkString, bytes)
      }
    }
  }

  /** REAL audio decode through javax.sound.sampled (ships with the JDK
    * — no codec dependency): container + format come from the parsed
    * WAV header, the signal stats from the PCM frames. Determinism the
    * repo's usual way: Σx² accumulates as LONG (≤ n·2^30, exact), so
    * partial order can't move a bit; rms/duration/clip_rate are then
    * single IEEE ops over engine-identical operands. Non-PCM16-mono or
    * unparseable payloads are skipped (flatMap None), mirroring the
    * image decoder's poison-asset contract: a bad asset must never kill
    * the task.
    */
  def decodeAudioBatch(batch: Seq[MediaAsset]): Seq[AudioFeatures] =
    batch.flatMap { a =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
              f.isBigEndian || f.getEncoding !=
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
          else {
            val raw = in.readAllBytes()
            val n = raw.length / 2
            if (n == 0) None
            else {
              var sumsq = 0L
              var nClip = 0L
              var i = 0
              while (i < n) {
                val v = ((raw(2 * i) & 0xff) |
                  (raw(2 * i + 1).toInt << 8)).toShort.toInt
                sumsq += v.toLong * v
                if (math.abs(v) >= CLIP_LEVEL) nClip += 1
                i += 1
              }
              val rate = f.getSampleRate.toInt
              Some(AudioFeatures(a.doc_id, rate, n.toLong,
                n.toDouble / rate.toDouble,
                math.sqrt(sumsq.toDouble / n.toDouble) / 32768.0,
                nClip.toDouble / n.toDouble))
            }
          }
        } finally in.close()
      } catch { case _: Exception => None }
    }

  def decodeAudioFeatures(assets: Dataset[MediaAsset],
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(batchSize).flatMap(decodeAudioBatch))
  }

  /** Deterministic synthetic ANIMATED GIF per document — the multi-
    * frame (video-like) analog of `imageAssets`: frame count, dims and
    * each frame's solid gray fill are pure functions of doc_id, so the
    * oracle PREDICTS per-frame stats arithmetically while the engine
    * must parse the GIF container and decode every frame's pixels.
    * Dims/gray use SMALL moduli so frames intentionally COLLIDE across
    * documents — the repeated-frame structure `multimodal_frame_dupes`
    * must recover from pixels alone. Gray values are multiples of 8
    * (exact palette entries — GIF round-trips ≤256 colors losslessly).
    * Bytes are synthesized executor-side; never collected.
    */
  def gifAssets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        // The oracle mirrors these dims with DuckDB's FLOORING `//`
        // (doc_id // 3 % 3) while Scala `/` truncates — for a negative
        // doc_id the two diverge and w/h would go ≤ 0 and crash
        // BufferedImage. floorDiv matches `//` exactly for all ids; the
        // require makes the (corpus-impossible) negative case loud
        // instead of a downstream AWT error.
        require(id >= 0, s"gifAssets: negative doc_id $id")
        val nf = (id % 4 + 2).toInt
        val w = ((id % 3) + 1).toInt * 8
        val h = ((Math.floorDiv(id, 3) % 3) + 1).toInt * 8
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val v = (((id + f.toLong * 5) % 32) * 8).toInt
            val rgb = (v << 16) | (v << 8) | v
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
        val bytes = bos.toByteArray
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        MediaAsset(id, "video", bytes.length.toLong,
          md.map("%02x".format(_)).mkString, bytes)
      }
    }
  }

  /** REAL multi-frame decode through javax.imageio's GIF ImageReader
    * (pure JDK): `getNumImages` walks the container, `read(i)` decodes
    * each frame's palette-indexed raster. One row per frame; gray is
    * pixel (0,0)'s red channel and red_sum the whole-raster red sum
    * (proving all pixels were decoded, not just the header). Poison
    * assets skip (flatMap empty) — same contract as the image decoder.
    */
  def gifFrames(assets: Dataset[MediaAsset]): Dataset[GifFrame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(a.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Seq.empty[GifFrame] }
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0 until n).map { i =>
                val img = reader.read(i)
                val w = img.getWidth
                val h = img.getHeight
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    sum += (img.getRGB(x, y) >> 16) & 0xff
                    x += 1
                  }
                  y += 1
                }
                GifFrame(a.doc_id, i, w, h,
                  (img.getRGB(0, 0) >> 16) & 0xff, sum)
              }
            } finally { reader.dispose(); iis.close() }
          }
        } catch { case _: Exception => Seq.empty[GifFrame] }
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
  // decoded raster and the histogram from actual pixel values. WAV/PCM
  // audio takes a real decode too (decodeAudioBatch below, via
  // javax.sound.sampled). Remaining media types (compressed video/audio
  // — no codec libs in this container) keep the deterministic fake,
  // clearly stubbed; swapping in ffmpeg-style bindings changes only
  // that branch. The signature — a BATCH of assets
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

  /** Shared decoded-frame relation: both frame queries consume the
    * SAME analyzed plan, so one CacheManager entry serves them — the
    * GIF synth+decode pass (the dominant cost) runs once per session,
    * not once per query (the bigram-posting pattern).
    */
  private def gifFramesDf(s: SparkSession, d: String): DataFrame =
    graft.CachePool.persist(gifFrames(gifAssets(s, d)).toDF())

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

    // REAL perceptual-hash dedup: decode gradient-pattern PNGs, 8×8
    // integer average-pool into the 64-bit aHash, then group identical
    // hashes — near-dup image detection from pixels alone. The oracle
    // re-derives every hash bit arithmetically (cellSum·64 ≥ totalSum
    // per cell) and must agree on all 64 bits of every image AND on the
    // collision-group sizes. The group join is co-partitioned on the
    // hash (the groupBy partitioning serves it); at 100 TB the hash
    // relation is 16 bytes/image and the pool pass is scan-local.
    "multimodal_phash" -> ((s, d) => {
      import s.implicits._
      val ph = phashFeatures(patternAssets(s, d)).toDF()
        .transform(graft.CachePool.persist) // decode once: hash pass + group pass
      val groups = ph.groupBy("hash_hi", "hash_lo")
        .agg(count(lit(1)).as("n_same_hash"))
      ph.join(groups, Seq("hash_hi", "hash_lo"))
        .select(col("doc_id"), col("width"), col("height"),
          col("hash_hi"), col("hash_lo"), col("n_same_hash"))
    }),

    // Near-duplicate IMAGE detection at scale: 4×16-bit band blocking
    // over the distinct aHash relation (the Manku multi-index the
    // simhash family uses) — every pair at hamming ≤ 3 shares at least
    // one untouched band by pigeonhole, so recall is 1.0 BY
    // CONSTRUCTION while candidates stay O(band collisions), never the
    // quadratic distinct-hash cross product the brute oracle runs. The
    // report is the O(3)-row dedup-volume census by distance: how many
    // hash pairs, and how many underlying image pairs, a near-dup merge
    // at each radius would fuse.
    "multimodal_phash_neardup" -> ((s, d) => {
      val hashes = phashFeatures(patternAssets(s, d)).toDF()
        .groupBy("hash_hi", "hash_lo").agg(count(lit(1)).as("n_docs"))
        .transform(graft.CachePool.persist)
      val banded = hashes.select(col("hash_hi"), col("hash_lo"),
        explode(array(
          struct(lit(0).as("band_id"),
            expr("hash_lo % 65536").as("band_val")),
          struct(lit(1).as("band_id"),
            expr("(hash_lo div 65536) % 65536").as("band_val")),
          struct(lit(2).as("band_id"),
            expr("hash_hi % 65536").as("band_val")),
          struct(lit(3).as("band_id"),
            expr("(hash_hi div 65536) % 65536").as("band_val")))).as("b"))
      val a = banded.as("a")
      val b = banded.as("b")
      val pairs = a.join(b, col("a.b") === col("b.b"))
        .filter(col("a.hash_hi") < col("b.hash_hi") ||
          (col("a.hash_hi") === col("b.hash_hi") &&
            col("a.hash_lo") < col("b.hash_lo")))
        .select(col("a.hash_hi").as("ha"), col("a.hash_lo").as("la"),
          col("b.hash_hi").as("hb"), col("b.hash_lo").as("lb"))
        .distinct() // a pair can collide in several bands
        .withColumn("hamming",
          expr("cast(bit_count(ha ^ hb) + bit_count(la ^ lb) as int)"))
        .filter(col("hamming") <= 3)
      pairs
        .join(hashes.withColumnRenamed("hash_hi", "ha")
          .withColumnRenamed("hash_lo", "la")
          .withColumnRenamed("n_docs", "na"), Seq("ha", "la"))
        .join(hashes.withColumnRenamed("hash_hi", "hb")
          .withColumnRenamed("hash_lo", "lb")
          .withColumnRenamed("n_docs", "nb"), Seq("hb", "lb"))
        .groupBy("hamming")
        .agg(count(lit(1)).as("n_hash_pairs"),
          sum(col("na") * col("nb")).as("n_doc_pairs"))
    }),

    // Cross-modal pair curation — the caption-consistency audit an
    // image-text pipeline runs before contrastive training. Each doc is
    // an (image, caption) pair; the screen flags the two group shapes
    // that poison a contrastive batch: the SAME image carrying several
    // distinct captions (which caption is "the" positive?) and the SAME
    // caption attached to several distinct images (false negatives when
    // they meet in one batch). Image identity is the REAL decoded aHash
    // (the multimodal_phash fingerprint); caption identity is the text
    // family's exact-dedup fingerprint md5(lower(trim(text))) — one
    // definition per modality, shared with each family's own queries.
    // Per flagged group: total docs, distinct variants on the varying
    // side, and two WITNESS ids guaranteed to differ on that side (the
    // smallest doc of each of the two first-ranked variants — not just
    // min/max, which could share a variant in a ≥3-variant group).
    // Scale shape (the multimodal_frame_dupes discipline): payload
    // bytes never cross a shuffle — the aHash is computed scan-local
    // and only (doc_id, fp) rows move; the doc_id join is co-sized with
    // the corpus; both screens are hash aggs + one bounded per-group
    // window over the variant REPRESENTATIVES (≤ variants rows/group).
    "multimodal_caption_screen" -> ((s, d) => {
      val ph = phashFeatures(patternAssets(s, d)).toDF()
        .select(col("doc_id"),
          concat_ws(":", col("hash_hi"), col("hash_lo")).as("image_fp"))
      val cap = Tables.documents(s, d)
        .select(col("doc_id"), md5(lower(trim(col("text")))).as("caption_fp"))
      val joined = ph.join(cap, "doc_id")
        .transform(graft.CachePool.persist) // decode once: both screens
      def screen(groupCol: String, varCol: String, band: String): DataFrame = {
        val reps = joined.groupBy(col(groupCol).as("group_key"), col(varCol))
          .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
        val w = Window.partitionBy("group_key").orderBy(col("rep"))
        reps.withColumn("rn", row_number().over(w))
          .groupBy("group_key")
          .agg(sum(col("n")).as("n_docs"),
            count(lit(1)).as("n_variants"),
            min(when(col("rn") === 1, col("rep"))).as("example_a"),
            min(when(col("rn") === 2, col("rep"))).as("example_b"))
          .filter(col("n_variants") > 1)
          .select(lit(band).as("band"), col("group_key"), col("n_docs"),
            col("n_variants"), col("example_a"), col("example_b"))
      }
      screen("image_fp", "caption_fp", "same_image_diff_caption")
        .unionByName(
          screen("caption_fp", "image_fp", "same_caption_diff_image"))
    }),

    // Resize/thumbnail: batched decode→transform chain; the stub's
    // features are SQL-expressible so the result is fully oracle-checked
    // (thumb hash = md5 of the boxed byte window).
    "multimodal_resize" -> ((s, d) => {
      import s.implicits._
      resizeFeatures(mediaAssets(s, d).as[MediaAsset]).toDF()
    }),

    // REAL audio codec round trip: synthesize a deterministic square-
    // wave WAV per doc, parse the RIFF header + PCM frames back with
    // javax.sound.sampled, report rate/length/duration/RMS/clip-rate.
    // The oracle derives every value arithmetically from doc_id — the
    // engine can only match by actually decoding the container.
    "multimodal_audio_stats" -> ((s, d) => {
      import s.implicits._
      decodeAudioFeatures(audioAssets(s, d)).toDF()
    }),

    // Repeated-frame detection across the corpus on REAL decoded GIF
    // frames: fingerprint each frame by its decoded (dims, gray),
    // group, keep those appearing more than once, report the top
    // repeats — intros/outros/test-cards in video terms. The engine
    // must decode every frame's pixels to fingerprint it; the oracle
    // re-derives the fingerprints arithmetically from the synthesis
    // formulas. One hash aggregation over the frame relation + a
    // bounded TakeOrdered; at scale the frame fingerprints (a few
    // bytes/frame) are the persisted intermediate and the dupe census
    // a reusable roll-up — payload bytes never cross a shuffle.
    "multimodal_frame_dupes" -> ((s, d) => {
      gifFramesDf(s, d)
        .select(col("doc_id"), md5(concat_ws("|",
          col("width"), col("height"), col("gray"))).as("frame_md5"))
        .groupBy("frame_md5")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_frames") > 1)
        .orderBy(col("n_frames").desc, col("frame_md5"))
        .limit(20)
    }),

    // REAL multi-frame codec round trip: synthesize a deterministic
    // animated GIF per doc (frame count, dims, per-frame solid gray all
    // functions of doc_id), decode EVERY frame with javax.imageio's
    // ImageReader, report per-frame stats. The oracle predicts frame
    // counts, dims, gray values AND the full red-channel pixel sum
    // arithmetically — the engine can only match by actually walking
    // the container and decoding each frame's raster.
    "multimodal_frames" -> ((s, d) => {
      gifFramesDf(s, d)
        .select(col("doc_id"), col("frame_id"), col("width"),
          col("height"), col("gray"), col("red_sum"))
    })
  )

  /** Shared closed-form aHash derivation (DuckDB): rebuilds every
    * gradient image pixel-by-pixel from its doc_id formula and pools the
    * same integer 8×8 cells the engine pools from DECODED pixels. Ends
    * with CTE `hashes`(doc_id, width, height, hash_hi, hash_lo).
    */
  private val PHASH_HASHES_CTE: String =
    """WITH p AS (SELECT doc_id,
      |    CAST(doc_id % 5 + 2 AS BIGINT) * 8 AS w,
      |    CAST((doc_id * 3) % 4 + 2 AS BIGINT) * 8 AS h,
      |    CAST(doc_id % 7 AS BIGINT) AS a,
      |    CAST((doc_id * 5) % 11 AS BIGINT) AS b
      |  FROM documents),
      |px AS (SELECT doc_id, w, h,
      |    (x // (w // 8)) AS cx, (y // (h // 8)) AS cy,
      |    (x * a + y * b) % 256 AS v
      |  FROM p, unnest(range(0, w)) AS tx(x), unnest(range(0, h)) AS ty(y)),
      |cells AS (SELECT doc_id, w, h, cy * 8 + cx AS idx, SUM(v) AS cellsum
      |  FROM px GROUP BY 1, 2, 3, 4),
      |tot AS (SELECT doc_id, SUM(cellsum) AS total FROM cells GROUP BY 1),
      |bits AS (SELECT c.doc_id, c.w, c.h, c.idx,
      |    CASE WHEN c.cellsum * 64 >= t.total THEN 1 ELSE 0 END AS bit
      |  FROM cells c JOIN tot t USING (doc_id)),
      |hashes AS (SELECT doc_id,
      |    CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
      |    CAST(SUM(CASE WHEN idx >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (idx - 32)) ELSE 0 END)
      |      AS BIGINT) AS hash_hi,
      |    CAST(SUM(CASE WHEN idx < 32
      |      THEN bit * (CAST(1 AS BIGINT) << idx) ELSE 0 END)
      |      AS BIGINT) AS hash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin

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
    // Square wave ⇒ Σx² = nc·32767² + (n−nc)·amp² exactly; the BIGINT
    // sum crosses to DOUBLE in one cast, then the identical three IEEE
    // ops (÷n, sqrt, ÷32768) the engine applies — bitwise match.
    "multimodal_audio_stats" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(doc_id % 480 + 32 AS BIGINT) AS n,
        |    CAST((doc_id * 37) % 28000 + 1000 AS BIGINT) AS amp,
        |    CAST(CASE WHEN doc_id % 5 = 0
        |      THEN (doc_id % 480 + 32 + 3) // 4 ELSE 0 END AS BIGINT) AS nc
        |  FROM documents)
        |SELECT doc_id,
        |  8000 AS sample_rate,
        |  n AS n_samples,
        |  CAST(n AS DOUBLE) / 8000.0 AS duration_sec,
        |  sqrt(CAST(nc * 32767 * 32767 + (n - nc) * amp * amp AS DOUBLE)
        |    / CAST(n AS DOUBLE)) / 32768.0 AS rms,
        |  CAST(nc AS DOUBLE) / CAST(n AS DOUBLE) AS clip_rate
        |FROM p""".stripMargin,
    // Brute-force pixel reconstruction: the oracle rebuilds every image
    // from its closed form, pools the same 8×8 integer cells, and packs
    // the same two unsigned-32 hash halves — bit-for-bit.
    "multimodal_phash" ->
      s"""$PHASH_HASHES_CTE
         |SELECT doc_id, width, height, hash_hi, hash_lo,
         |  COUNT(*) OVER (PARTITION BY hash_hi, hash_lo) AS n_same_hash
         |FROM hashes""".stripMargin,
    // The oracle runs the O(distinct²) brute cross product the banded
    // engine plan exists to avoid — exactly the recall check.
    "multimodal_phash_neardup" ->
      s"""$PHASH_HASHES_CTE,
         |hs AS (SELECT hash_hi, hash_lo, COUNT(*) AS n_docs
         |  FROM hashes GROUP BY 1, 2),
         |pairs AS (SELECT
         |    CAST(bit_count(xor(a.hash_hi, b.hash_hi))
         |      + bit_count(xor(a.hash_lo, b.hash_lo)) AS INT) AS hamming,
         |    a.n_docs * b.n_docs AS dp
         |  FROM hs a JOIN hs b
         |    ON (a.hash_hi, a.hash_lo) < (b.hash_hi, b.hash_lo))
         |SELECT hamming, COUNT(*) AS n_hash_pairs,
         |  CAST(SUM(dp) AS BIGINT) AS n_doc_pairs
         |FROM pairs WHERE hamming <= 3 GROUP BY hamming""".stripMargin,
    // The cross-modal screen's oracle: the closed-form aHash chain
    // (image identity) joined to the exact-dedup caption fingerprint,
    // then each band's variant-representative ranking mirrored.
    "multimodal_caption_screen" ->
      s"""$PHASH_HASHES_CTE,
         |fp AS (SELECT h.doc_id,
         |    CAST(hash_hi AS VARCHAR) || ':' || CAST(hash_lo AS VARCHAR)
         |      AS image_fp,
         |    md5(lower(trim(d.text))) AS caption_fp
         |  FROM hashes h JOIN documents d USING (doc_id)),
         |img_reps AS (SELECT image_fp AS group_key, caption_fp,
         |    MIN(doc_id) AS rep, COUNT(*) AS n FROM fp GROUP BY 1, 2),
         |img_rank AS (SELECT *, row_number() OVER (
         |    PARTITION BY group_key ORDER BY rep) AS rn FROM img_reps),
         |img AS (SELECT 'same_image_diff_caption' AS band, group_key,
         |    CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_variants,
         |    MIN(CASE WHEN rn = 1 THEN rep END) AS example_a,
         |    MIN(CASE WHEN rn = 2 THEN rep END) AS example_b
         |  FROM img_rank GROUP BY group_key HAVING COUNT(*) > 1),
         |cap_reps AS (SELECT caption_fp AS group_key, image_fp,
         |    MIN(doc_id) AS rep, COUNT(*) AS n FROM fp GROUP BY 1, 2),
         |cap_rank AS (SELECT *, row_number() OVER (
         |    PARTITION BY group_key ORDER BY rep) AS rn FROM cap_reps),
         |cap AS (SELECT 'same_caption_diff_image' AS band, group_key,
         |    CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_variants,
         |    MIN(CASE WHEN rn = 1 THEN rep END) AS example_a,
         |    MIN(CASE WHEN rn = 2 THEN rep END) AS example_b
         |  FROM cap_rank GROUP BY group_key HAVING COUNT(*) > 1)
         |SELECT * FROM img UNION ALL SELECT * FROM cap""".stripMargin,
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
    // Closed-form reconstruction of every GIF frame the engine decodes:
    // the fingerprint md5 runs over the IDENTICAL "w|h|gray" text both
    // engines render from integers.
    "multimodal_frame_dupes" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(doc_id % 4 + 2 AS BIGINT) AS nf,
        |    CAST((doc_id % 3 + 1) * 8 AS INT) AS w,
        |    CAST((doc_id // 3 % 3 + 1) * 8 AS INT) AS h
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    md5(CAST(w AS VARCHAR) || '|' || CAST(h AS VARCHAR) || '|' ||
        |      CAST(CAST(((doc_id + fi * 5) % 32) * 8 AS INT) AS VARCHAR))
        |      AS frame_md5
        |  FROM p, unnest(range(0, nf)) AS t(fi))
        |SELECT frame_md5, COUNT(*) AS n_frames,
        |  COUNT(DISTINCT doc_id) AS n_docs
        |FROM f GROUP BY frame_md5
        |HAVING COUNT(*) > 1
        |ORDER BY n_frames DESC, frame_md5 LIMIT 20""".stripMargin,
    // Per-frame stats predicted arithmetically: solid fill ⇒
    // red_sum = gray·w·h exactly.
    "multimodal_frames" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(doc_id % 4 + 2 AS BIGINT) AS nf,
        |    CAST((doc_id % 3 + 1) * 8 AS INT) AS w,
        |    CAST((doc_id // 3 % 3 + 1) * 8 AS INT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(fi AS INT) AS frame_id, w AS width,
        |  h AS height,
        |  CAST(((doc_id + fi * 5) % 32) * 8 AS INT) AS gray,
        |  CAST(((doc_id + fi * 5) % 32) * 8 AS BIGINT) * w * h AS red_sum
        |FROM p, unnest(range(0, nf)) AS t(fi)""".stripMargin
  )
}
