package graft.sources

import scala.sys.process._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch sources & sinks mapping the reference's I/O surface
  * (deva/core/sources.py, core.py:1262 to_textfile) onto Spark's
  * data source API.
  *
  * Network/poll sources that need a live endpoint (kafka, socket,
  * rate) live in graft.streaming.EventFlow — streams are their
  * natural shape. Here: files, command output, and the KV sink.
  */
object Sources {

  /** deva from_textfile (sources.py:199): one row per line. */
  def textFile(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** deva filenames (sources.py:266): which files back the data —
    * as a column, so it distributes (no driver-side directory poll).
    */
  def withFilenames(df: DataFrame): DataFrame =
    df.withColumn("__file", input_file_name())

  /** deva from_command/from_process (sources.py:511,607): capture a
    * local command's stdout lines as a DataFrame. Driver-side by
    * nature (the process runs where it runs) — parallelize the
    * *lines*, not the process.
    */
  def fromCommand(spark: SparkSession, cmd: Seq[String]): DataFrame = {
    val lines = cmd.!!.split("\n").toIndexedSeq
    import spark.implicits._
    lines.toDF("value")
  }

  /** deva to_textfile (core.py:1262): newline-terminated sink. */
  def toTextFile(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)
}

/** Keyed upsert store — the reference's `DBStream` (store.py:44)
  * persistence pattern ("stream >> DB('table')") as a parquet-backed
  * last-write-wins table. In production this is exactly the
  * foreachBatch-merge shape used with lakehouse formats; here the
  * merge target is plain parquet (no extra deps available).
  */
class KvStore(spark: SparkSession, path: String, keyCols: Seq[String], versionCol: String) {

  // SINGLE-WRITER store (like the reference's sqlite-backed DB): the
  // stage-then-swap below is not safe under concurrent writers or a
  // reader racing the swap window. Recover from a crash mid-swap on
  // open: if the main path vanished but `.old` survived, the previous
  // table is intact — restore it; a leftover `.old` next to a live
  // main path is a completed swap's debris.
  locally {
    val main = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    if (!main.exists() && old.exists()) {
      if (!old.renameTo(main))
        throw new java.io.IOException(s"KvStore recovery failed: cannot restore $old to $path")
    } else if (main.exists() && old.exists()) deleteRec(old)
  }

  /** Upsert a batch: new rows win over stored rows at equal keys by
    * (versionCol, then presence in the incoming batch).
    */
  def upsert(batch: DataFrame): Unit = {
    val incoming = batch.withColumn("__gen", lit(1))
    val merged = current() match {
      case Some(cur) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc, col("__gen").desc)
        cur.withColumn("__gen", lit(0)).unionByName(incoming)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn", "__gen")
      case None => incoming.drop("__gen")
    }
    // parquet has no transactional replace: stage then swap.
    // renameTo reports failure via its return value, not an exception
    // — an unchecked false would silently lose the upsert.
    val staged = path + ".staged"
    merged.write.mode("overwrite").parquet(staged)
    val fs = new java.io.File(path)
    if (fs.exists()) {
      val old = new java.io.File(path + ".old")
      deleteRec(old)
      if (!fs.renameTo(old))
        throw new java.io.IOException(s"KvStore swap failed: cannot move $path aside")
    }
    if (!new java.io.File(staged).renameTo(new java.io.File(path)))
      throw new java.io.IOException(s"KvStore swap failed: cannot move $staged to $path")
    deleteRec(new java.io.File(path + ".old"))
  }

  def current(): Option[DataFrame] =
    if (new java.io.File(path).exists()) Some(spark.read.parquet(path)) else None

  /** The stored table; fails loudly when nothing has been written yet
    * (an empty store has no schema to return).
    */
  def get(): DataFrame =
    current().getOrElse(throw new NoSuchElementException(
      s"KvStore at $path is empty — upsert a batch before reading"))

  // Files.delete throws on failure — a partially-undeletable dir must
  // fail the current call, not poison the NEXT swap with a stale .old
  private def deleteRec(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    java.nio.file.Files.delete(f.toPath)
  }
}
