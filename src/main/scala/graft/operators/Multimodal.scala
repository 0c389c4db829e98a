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
  * extracts luminance statistics per image. AUDIO/VIDEO decode stays
  * a **STUB** ([[decodeStub]]: deterministic fake features — no
  * audio/video codecs exist in the JDK or this container); its
  * Spark-side contract (schema, per-partition batching, partition
  * sizing, null handling) is real and tested, so a codec (JNI/FFI or
  * `mapInArrow` from PySpark) can be swapped in without touching any
  * plan structure.
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
