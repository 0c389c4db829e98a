package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (SURVEY §2.6 #83).
  *
  * Media are opaque `BINARY` columns plus a typed metadata struct —
  * the lakehouse-native layout: bytes travel with the row, metadata
  * is queryable/prunable without touching bytes.
  *
  * IMAGE decode is REAL: [[decodeImages]] decodes PNG/JPEG through
  * `javax.imageio` (ships in the JDK — zero added dependencies) and
  * extracts luminance statistics per image. AUDIO decode is REAL for
  * WAV/PCM: [[decodeAudio]] goes through `javax.sound.sampled`
  * (also JDK-only) and extracts duration/RMS/peak/zero-crossing
  * features. VIDEO decode is REAL for Motion-JPEG AVI:
  * [[decodeVideo]] parses the RIFF/AVI container directly (the format
  * is a flat chunk list) and decodes each `00dc` frame through the
  * JDK's JPEG codec — frame sampling, per-frame luminance and a
  * pixel-difference motion score, no added dependencies. Inter-coded
  * codecs (H.264/VP9/AV1) have no JDK decoder and remain behind
  * [[decodeStub]], whose Spark-side contract (schema, per-partition
  * batching, partition sizing, null handling) is real and tested, so
  * a codec (JNI/FFI or `mapInArrow` from PySpark) can be swapped in
  * without touching any plan structure.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)
  case class MediaRow(media_id: Long, meta: MediaMeta, data: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: String, features: Array[Double])

  /** Deterministic fake corpus: bytes derived from the id via md5 —
    * stable across runs/partitions, so tests can assert values.
    */
  def fakeCorpus(spark: SparkSession, n: Int, kind: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"media_$kind$id".getBytes("UTF-8"))
      val data = Array.fill(64)(digest).flatten // 1 KiB deterministic payload
      MediaRow(id, MediaMeta(kind, 32, 32, 16000, 1000L), data)
    }
  }

  /** STUB decode/feature-extract: per-partition batch iteration (the
    * shape a real codec kernel needs — amortized init per partition,
    * streaming over rows). Features = 8 deterministic doubles from
    * the byte content.
    */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // real impl: initialize the codec ONCE here (expensive), then stream
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val sum = digest.digest(r.data)
        val hex = sum.map("%02x".format(_)).mkString
        val feats = sum.take(8).map(b => (b & 0xff) / 255.0)
        MediaFeatures(r.media_id, r.meta.kind, r.data.length.toLong, hex, feats)
      }
    }
  }

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_lum: Double, var_lum: Double,
      min_lum: Double, max_lum: Double, quadrant_lum: Array[Double])

  /** Deterministic REAL-PNG corpus: a gradient keyed by (x, y, id),
    * encoded through the JDK's PNG writer — decodable test media with
    * asserteable pixel statistics, no fixture files.
    */
  def pngCorpus(spark: SparkSession, n: Int, w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            ((x * 255 / math.max(w - 1, 1)) << 16) |
              ((y * 255 / math.max(h - 1, 1)) << 8) |
              (id.toInt & 0xff))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(id, MediaMeta("image", w, h, 0, 0L), bos.toByteArray)
    }
  }

  /** REAL image decode (PNG/JPEG via `javax.imageio`): width/height +
    * luminance mean/variance/min/max + per-quadrant means — the
    * feature-extraction stage of an image curation pipeline. Same
    * per-partition kernel shape as [[decodeStub]] (decode init is
    * amortized, rows stream through); a corrupt/undecodable payload
    * fails loudly rather than emitting garbage features.
    */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
        require(img != null, s"media ${r.media_id}: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0; var sq = 0.0; var mn = 1.0; var mx = 0.0
        val qSum = new Array[Double](4)
        val qN = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 0.299 +
              ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114) / 255.0
            sum += lum; sq += lum * lum
            if (lum < mn) mn = lum
            if (lum > mx) mx = lum
            val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
            qSum(q) += lum; qN(q) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val mean = sum / n
        ImageFeatures(r.media_id, w, h, n, mean, sq / n - mean * mean, mn, mx,
          Array.tabulate(4)(i => if (qN(i) == 0) 0.0 else qSum(i) / qN(i)))
      }
    }
  }

  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
      n_samples: Long, duration_ms: Long, rms: Double, peak: Double,
      zero_cross_rate: Double)

  /** Deterministic REAL-WAV corpus: a 16-bit PCM mono sine wave whose
    * frequency is keyed by the id, encoded through the JDK's WAV
    * writer — decodable test media with closed-form feature values
    * (RMS = amp/√2, zero-crossing rate = 2f/sr), no fixture files.
    */
  def wavCorpus(spark: SparkSession, n: Int, sampleRate: Int = 8000,
      seconds: Double = 0.25): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val nSamples = (sampleRate * seconds).toInt
      val freq = 200.0 + 50.0 * id // id-keyed tone
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * 0.5 * Short.MaxValue).toInt
        pcm(i * 2) = (s & 0xff).toByte // little-endian
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRow(id, MediaMeta("audio", 0, 0, sampleRate, (seconds * 1000).toLong),
        bos.toByteArray)
    }
  }

  /** REAL audio decode (WAV/PCM via `javax.sound.sampled`): sample
    * rate/channels/duration + RMS, peak and zero-crossing rate over
    * the first channel — the feature stage of an audio curation
    * pipeline (silence/clipping/tone filters). Same per-partition
    * kernel shape as [[decodeImages]]; an undecodable payload fails
    * loudly rather than emitting garbage features.
    */
  def decodeAudio(ds: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val ais = try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.data))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"media ${r.media_id}: payload is not a decodable audio file", e)
        }
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"media ${r.media_id}: only 16-bit little-endian PCM supported, got $fmt")
        val bytes = ais.readAllBytes()
        val ch = fmt.getChannels
        val stride = 2 * ch // first channel of each frame
        val nSamples = bytes.length / stride
        var sq = 0.0; var peak = 0.0; var crossings = 0L; var prev = 0
        var i = 0
        while (i < nSamples) {
          val lo = bytes(i * stride) & 0xff
          val hi = bytes(i * stride + 1).toInt
          val s = ((hi << 8) | lo).toShort / 32768.0
          sq += s * s
          val a = math.abs(s); if (a > peak) peak = a
          val sign = if (s > 0) 1 else if (s < 0) -1 else 0
          if (sign != 0 && prev != 0 && sign != prev) crossings += 1
          if (sign != 0) prev = sign
          i += 1
        }
        AudioFeatures(r.media_id, fmt.getSampleRate.toInt, ch, nSamples.toLong,
          (nSamples * 1000L) / fmt.getSampleRate.toInt,
          math.sqrt(sq / math.max(nSamples, 1)), peak,
          crossings.toDouble / math.max(nSamples, 1))
      }
    }
  }

  case class VideoFeatures(media_id: Long, width: Int, height: Int,
      n_frames: Long, fps: Double, duration_ms: Long, n_sampled: Int,
      frame_lum: Array[Double], motion: Double)

  // ---- Motion-JPEG AVI: RIFF container writer/parser (JDK-only) ----

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** RIFF chunk: fourcc + little-endian size + body + pad-to-even. */
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourCC(id) ++ le32(body.length) ++ body ++ pad
  }

  private def riffList(listType: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fourCC(listType) ++ body)

  /** Assemble a spec-shaped Motion-JPEG AVI from pre-encoded JPEG
    * frames: RIFF(AVI ) → LIST(hdrl){avih, LIST(strl){strh,strf}} →
    * LIST(movi){00dc…}. Every size field is computed, not guessed, so
    * any standards-following reader (including [[decodeVideo]]'s
    * parser) can walk it.
    */
  def buildAvi(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val usPerFrame = 1000000 / fps
    val avih = riffChunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = riffChunk("strh",
      fourCC("vids") ++ fourCC("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
        le32(0) ++ le32(-1) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = riffChunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        fourCC("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi", frames.flatMap(f => riffChunk("00dc", f)).toArray)
    val body = fourCC("AVI ") ++ hdrl ++ movi
    fourCC("RIFF") ++ le32(body.length) ++ body
  }

  private def readLe32(d: Array[Byte], off: Int): Int =
    (d(off) & 0xff) | ((d(off + 1) & 0xff) << 8) |
      ((d(off + 2) & 0xff) << 16) | ((d(off + 3) & 0xff) << 24)

  private def cc(d: Array[Byte], off: Int): String =
    new String(d, off, 4, "US-ASCII")

  /** Parsed AVI: (width, height, usPerFrame, declared frame count,
    * video chunks in stream order). Walks the chunk list exactly as
    * the spec lays it out; a malformed container fails loudly.
    */
  private[operators] def parseAvi(d: Array[Byte]): (Int, Int, Int, Int, Vector[Array[Byte]]) = {
    require(d.length >= 12 && cc(d, 0) == "RIFF" && cc(d, 8) == "AVI ",
      "payload is not a RIFF/AVI container")
    var w = 0; var h = 0; var usPerFrame = 0; var declared = 0
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = cc(d, off)
        val size = readLe32(d, off + 4)
        require(size >= 0 && off + 8 + size <= end, s"chunk $id overruns container")
        if (id == "LIST") {
          // list type occupies the first 4 body bytes; contents follow
          walk(off + 12, off + 8 + size)
        } else if (id == "avih") {
          usPerFrame = readLe32(d, off + 8)
          declared = readLe32(d, off + 8 + 16)
          w = readLe32(d, off + 8 + 32)
          h = readLe32(d, off + 8 + 36)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += java.util.Arrays.copyOfRange(d, off + 8, off + 8 + size)
        }
        off += 8 + size + (size % 2) // chunks are word-aligned
      }
    }
    walk(12, d.length)
    (w, h, usPerFrame, declared, frames.result())
  }

  /** Deterministic REAL-AVI corpus: per id, `nFrames` JPEG frames of
    * a gradient background with a white vertical bar that moves one
    * step per frame — real container, real codec, closed-form motion
    * for the spec to assert. `moving = false` freezes the bar (the
    * zero-motion control case).
    */
  def aviCorpus(spark: SparkSession, n: Int, w: Int, h: Int,
      nFrames: Int, fps: Int = 4, moving: Boolean = true): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val barX = (if (moving) f else 0) * math.max(w / math.max(nFrames, 1), 1) % w
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = (y * 255 / math.max(h - 1, 1)) & 0xff
            val v = if (x == barX) 0xffffff else ((id.toInt & 0xff) << 16) | (g << 8) | g
            img.setRGB(x, y, v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      MediaRow(id, MediaMeta("video", w, h, 0, nFrames * 1000L / fps),
        buildAvi(w, h, fps, frames))
    }
  }

  /** REAL video decode (Motion-JPEG AVI): parse the RIFF container,
    * sample `sample` frames evenly across the stream, decode each
    * through the JDK JPEG codec, and emit per-frame mean luminance
    * plus a motion score (mean absolute pixel-luminance difference
    * between consecutive sampled frames — the shot-boundary /
    * static-clip signal a video curation pipeline filters on). Same
    * per-partition kernel shape as [[decodeImages]]; undecodable
    * payloads fail loudly.
    */
  def decodeVideo(ds: Dataset[MediaRow], sample: Int = 4): Dataset[VideoFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, usPerFrame, declared, frames) = parseAvi(r.data)
        require(frames.nonEmpty, s"media ${r.media_id}: AVI has no video frames")
        require(declared == 0 || declared == frames.length,
          s"media ${r.media_id}: header declares $declared frames, found ${frames.length}")
        val k = math.min(sample, frames.length)
        val idx = if (k == 1) Seq(0)
          else (0 until k).map(i => i * (frames.length - 1) / (k - 1))
        var prev: Array[Double] = null
        var motionSum = 0.0; var motionN = 0
        val lums = idx.map { i =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(i)))
          require(img != null, s"media ${r.media_id}: frame $i is not decodable JPEG")
          require(img.getWidth == w && img.getHeight == h,
            s"media ${r.media_id}: frame $i is ${img.getWidth}x${img.getHeight}, header says ${w}x$h")
          val cur = new Array[Double](w * h)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 0.299 +
                ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114) / 255.0
              cur(y * w + x) = lum
              sum += lum
              x += 1
            }
            y += 1
          }
          if (prev != null) {
            var j = 0; var acc = 0.0
            while (j < cur.length) { acc += math.abs(cur(j) - prev(j)); j += 1 }
            motionSum += acc / cur.length
            motionN += 1
          }
          prev = cur
          sum / (w * h)
        }
        VideoFeatures(r.media_id, w, h, frames.length.toLong,
          1000000.0 / math.max(usPerFrame, 1),
          frames.length.toLong * usPerFrame / 1000L, k, lums.toArray,
          if (motionN == 0) 0.0 else motionSum / motionN)
      }
    }
  }

  // ---- image perceptual hashing (near-dup detection) ---------------

  /** 64-bit perceptual hash (the classic pHash construction): decode
    * → area-average to 32×32 luminance → 2-D DCT-II → keep the 8×8
    * low-frequency block → bit i set iff coefficient i exceeds the
    * median of the 63 non-DC coefficients. Robust to re-encoding,
    * mild noise and resizing (those perturb high frequencies, which
    * the 8×8 block discards), while structurally different images
    * land far apart in Hamming distance — the image analogue of
    * SimHash for text (q46/q48), enabling image DEDUP on a crawl
    * corpus where exact byte hashing catches only identical files.
    * Pure JDK (javax.imageio + own DCT) — zero added dependencies.
    */
  def phashBits(img: java.awt.image.BufferedImage): Long = {
    val N = 32
    val w = img.getWidth; val h = img.getHeight
    val g = Array.ofDim[Double](N, N)
    var by = 0
    while (by < N) {
      var bx = 0
      while (bx < N) {
        val x0 = bx * w / N; val x1 = math.max((bx + 1) * w / N, x0 + 1)
        val y0 = by * h / N; val y1 = math.max((by + 1) * h / N, y0 + 1)
        var s = 0.0; var c = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xff) * 0.299 + ((rgb >> 8) & 0xff) * 0.587 +
              (rgb & 0xff) * 0.114
            c += 1; x += 1
          }
          y += 1
        }
        g(by)(bx) = if (c == 0) 0.0 else s / c
        bx += 1
      }
      by += 1
    }
    // 2-D DCT-II of the 32×32 block, low 8×8 corner only; cos tables
    // hoisted (8 × 32 entries)
    val cosT = Array.tabulate(8, N)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2 * N)))
    val dct = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < N) {
          var x = 0
          val cy = cosT(v)(y)
          while (x < N) { s += g(y)(x) * cosT(u)(x) * cy; x += 1 }
          y += 1
        }
        dct(v)(u) = s
        v += 1
      }
      u += 1
    }
    val flat = Array.tabulate(64)(i => dct(i / 8)(i % 8))
    val nonDc = flat.drop(1).sorted
    val med = nonDc(31) // median of the 63 non-DC coefficients
    var bits = 0L
    var i = 0
    while (i < 64) { if (flat(i) > med) bits |= 1L << i; i += 1 }
    bits
  }

  case class ImageHash(media_id: Long, phash: Long)

  /** Per-partition pHash extraction — same streaming kernel shape as
    * [[decodeImages]]; a corrupt payload fails loudly.
    */
  def phashImages(ds: Dataset[MediaRow]): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
        require(img != null, s"media ${r.media_id}: payload is not a decodable image")
        ImageHash(r.media_id, phashBits(img))
      }
    }
  }

  /** Near-duplicate pairs among 64-bit perceptual hashes with
    * Hamming ≤ maxDist, via the SimHash pigeonhole (q48's shape on
    * the media domain): split the hash into maxDist+1 bands — any
    * pair within maxDist agrees exactly on ≥1 band — block on
    * (band, key), expand in-block pairs with the codegen'd double
    * explode, verify with the native bit_count(a XOR b). Block sizes
    * are bounded by per-band collisions, never corpus size; the cap
    * guard turns a pathological band into a loud error. Shared by
    * image pHash and audio fingerprints — the hash domain is
    * incidental to the pairing machinery.
    */
  def nearDupHashes(hashes: DataFrame, hashCol: String, maxDist: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    val bands = maxDist + 1
    val width = 64 / bands
    val hc = col(hashCol)
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(hc, b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("key"))
    }
    hashes
      .select(col("media_id"), hc.as("h"),
        explode(array(bandKeys: _*)).as("bk"))
      .groupBy(col("bk"))
      .agg(collect_list(struct(col("media_id"), col("h"))).as("ms"))
      .filter(size(col("ms")) > 1)
      .withColumn("ms", Dedup.cappedMembers(col("ms"), maxBucket, s"$hashCol band"))
      .select(col("ms"), explode(col("ms")).as("a"))
      // upper-triangle directly (r16): explode only members above the
      // pivot instead of all n² ordered pairs then a filter
      .select(col("a"), explode(Dedup.membersAboveBy(col("ms"), col("a"), "media_id")).as("b"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Image-named convenience over [[nearDupHashes]]. */
  def nearDupImages(hashes: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 10000): DataFrame =
    nearDupHashes(hashes, "phash", maxDist, maxBucket)

  // ---- audio fingerprinting (near-dup detection) -------------------

  /** 64-bit spectral band-shape fingerprint (the Haitsma–Kalker
    * family, per-frame form): 4 frames × 1024 samples; per frame,
    * Goertzel energy at 17 log-spaced band centers; bit (f, b) set
    * iff E[f][b] > E[f][b+1]. Ordering adjacent band energies (not
    * their absolute values) makes the hash invariant to gain and
    * robust to broadband noise, while different spectral shapes land
    * far apart — the audio analogue of [[phashBits]]. Pure JVM, own
    * Goertzel — no added dependencies.
    */
  def afingerprintBits(samples: Array[Double], sampleRate: Int): Long = {
    val frameLen = 1024
    val nFrames = 4
    require(samples.length >= frameLen * nFrames,
      s"need ${frameLen * nFrames} samples for a fingerprint, got ${samples.length}")
    val bandHz = Array.tabulate(17)(b => 200.0 * math.pow(1.2, b))
    def goertzel(off: Int, hz: Double): Double = {
      val w = 2 * math.Pi * hz / sampleRate
      val coeff = 2 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < frameLen) {
        s0 = samples(off + i) + coeff * s1 - s2
        s2 = s1; s1 = s0
        i += 1
      }
      s1 * s1 + s2 * s2 - coeff * s1 * s2
    }
    var bits = 0L
    var f = 0
    while (f < nFrames) {
      val off = f * frameLen
      val e = bandHz.map(hz => goertzel(off, hz))
      var b = 0
      while (b < 16) {
        if (e(b) > e(b + 1)) bits |= 1L << (f * 16 + b)
        b += 1
      }
      f += 1
    }
    bits
  }

  case class AudioHash(media_id: Long, afp: Long)

  /** Per-partition audio fingerprint extraction (WAV/PCM via
    * javax.sound — same decode contract as [[decodeAudio]]).
    */
  def fingerprintAudio(ds: Dataset[MediaRow]): Dataset[AudioHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.data))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"media ${r.media_id}: only 16-bit little-endian PCM supported")
        val bytes = ais.readAllBytes()
        val stride = 2 * fmt.getChannels
        val n = bytes.length / stride
        val samples = new Array[Double](n)
        var i = 0
        while (i < n) {
          val lo = bytes(i * stride) & 0xff
          val hi = bytes(i * stride + 1).toInt
          samples(i) = ((hi << 8) | lo).toShort / 32768.0
          i += 1
        }
        AudioHash(r.media_id, afingerprintBits(samples, fmt.getSampleRate.toInt))
      }
    }
  }

  /** Deterministic corpus with PLANTED audio near-dups: each base is
    * a BROADBAND chord — one tone per analysis band with a per-base
    * PERMUTATION of well-separated amplitudes, so every adjacent-band
    * energy comparison the fingerprint makes is decisively ordered
    * (the [[phashCorpus]] lesson: structure must sit far from the
    * decision threshold or its bits are coin flips). Dups add
    * deterministic white noise and a gain change — the perturbations
    * the band-ORDER hash is designed to shrug off.
    */
  def audioFpCorpus(spark: SparkSession, nBase: Int, dupsPerBase: Int,
      sampleRate: Int = 8000): Dataset[MediaRow] = {
    import spark.implicits._
    val group = dupsPerBase + 1
    spark.range(nBase.toLong * group).as[Long].map { id =>
      val base = id / group
      val variant = (id % group).toInt
      val nSamples = 5120 // 4 frames + slack
      val bandHz = Array.tabulate(17)(b => 200.0 * math.pow(1.2, b))
      def mix(k: Long): Long = {
        var z = k * 0x9E3779B97F4A7C15L
        z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
        z
      }
      // per-base permutation of amplitude ranks 0..16 (sort by hash)
      val ranks = (0 until 17).sortBy(b => mix(base * 131 + b))
      val amp = new Array[Double](17)
      ranks.zipWithIndex.foreach { case (b, r) => amp(b) = 0.01 + 0.005 * r }
      val gain = 1.0 + variant * 0.03
      var noiseState = base * 7919 + variant
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        var s = 0.0
        var b = 0
        while (b < 17) {
          s += amp(b) * math.sin(2 * math.Pi * bandHz(b) * i / sampleRate)
          b += 1
        }
        if (variant > 0) {
          noiseState = (noiseState * 6364136223846793005L + 1442695040888963407L)
          s += ((noiseState >>> 33).toDouble / (1L << 31) - 0.5) * 0.004
        }
        val v = (s * gain * Short.MaxValue).toInt
          .max(Short.MinValue.toInt).min(Short.MaxValue.toInt)
        pcm(i * 2) = (v & 0xff).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRow(id, MediaMeta("audio", 0, 0, sampleRate,
        nSamples * 1000L / sampleRate), bos.toByteArray)
    }
  }

  /** Deterministic corpus with PLANTED image near-dups: `nBase`
    * structurally distinct sinusoid-pattern images (pattern frequency
    * keyed by id), each followed by `dupsPerBase` re-encodes with a
    * few lightly perturbed pixels — close in pHash space but not
    * byte-identical. ids: base b = b*(dupsPerBase+1), its dups follow.
    */
  def phashCorpus(spark: SparkSession, nBase: Int, dupsPerBase: Int,
      w: Int = 64, h: Int = 64): Dataset[MediaRow] = {
    import spark.implicits._
    val group = dupsPerBase + 1
    spark.range(nBase.toLong * group).as[Long].map { id =>
      val base = id / group
      val variant = (id % group).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // compose the image directly in the DCT low-frequency basis
      // with ±-signed per-(base,u,v) coefficients: every coefficient
      // the hash thresholds sits FAR from the median, so the planted
      // structure is stable under pixel noise (a smooth gradient
      // image would leave most coefficients at ~0 = the median, and
      // its hash bits would be coin flips)
      def sign(u: Int, v: Int): Double = {
        var z = base * 0x9E3779B97F4A7C15L + u * 0xC2B2AE3D27D4EB4FL + v * 0x165667B19E3779F9L
        z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
        if ((z & 1L) == 0L) 1.0 else -1.0
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var s = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              if (u + v > 0)
                // distinct magnitude per (u,v): coefficients must not
                // cluster at one value, or the 63-coefficient median
                // lands ON a cluster and its bits become noise flips
                s += sign(u, v) * (1.0 + (u * 8 + v) / 4.0) *
                  math.cos(math.Pi * u * (x + 0.5) / w) *
                  math.cos(math.Pi * v * (y + 0.5) / h)
              v += 1
            }
            u += 1
          }
          val lum = (128 + s * 10).toInt.max(0).min(255)
          img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
          x += 1
        }
        y += 1
      }
      if (variant > 0) {
        // perturb a handful of pixels deterministically — high-
        // frequency noise the DCT low block barely sees
        var k = 0
        while (k < 8) {
          val px = ((base * 31 + variant * 17 + k * 13) % w).toInt.abs
          val py = ((base * 19 + variant * 23 + k * 29) % h).toInt.abs
          val old = img.getRGB(px, py) & 0xff
          val nl = (old + 40).min(255)
          img.setRGB(px, py, (nl << 16) | (nl << 8) | nl)
          k += 1
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRow(id, MediaMeta("image", w, h, 0, 0L), bos.toByteArray)
    }
  }

  /** Frame sampling stub: split the payload into n equal "frames"
    * (real impl: keyframe extraction) — pure binary-substring
    * expressions, no UDF, so it stays inside codegen.
    */
  def frameSample(df: DataFrame, n: Int): DataFrame =
    df.withColumn("frames",
      expr(s"transform(sequence(0, ${n - 1}), i -> substring(data, 1 + i * (length(data) DIV $n), length(data) DIV $n))"))

  /** Metadata-only pruning demo: selecting meta fields must not read
    * byte columns (verified in the spec via the scan's ReadSchema).
    */
  def metaOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("meta.kind"), col("meta.width"), col("meta.height"))
}
