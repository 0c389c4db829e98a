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
  * features. VIDEO decode stays the one **STUB** ([[decodeStub]]:
  * deterministic fake features — no video codec exists in the JDK or
  * this container); its Spark-side contract (schema, per-partition
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
