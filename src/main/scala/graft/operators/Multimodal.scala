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
  * The decode/feature kernels are **STUBS** — no image/audio codecs
  * exist in this container. `decodeStub` derives deterministic fake
  * features from the bytes so the Spark-side contract (schema,
  * batching, partition sizing, null handling) is real and tested;
  * swap `stubFeatures` for an actual codec (JNI/FFI or `mapInArrow`
  * from PySpark) without touching any plan structure.
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
