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
  *
  * The table is hash-bucketed by key into `numBuckets` directories
  * (`b=0 … b=N-1`); an upsert merges and rewrites ONLY the buckets
  * its keys land in — a batch touching k keys rewrites ≤ min(k, N)
  * buckets, not the whole table. That is the property that keeps
  * per-batch write cost proportional to the batch (× table/N), the
  * same layout contract a lakehouse MERGE gets from clustering.
  * Bucket count is fixed at creation (persisted in `_graft_buckets`)
  * so every future batch hashes keys identically.
  */
class KvStore(spark: SparkSession, path: String, keyCols: Seq[String],
    versionCol: String, numBuckets: Int = 16) {

  // SINGLE-WRITER store (like the reference's sqlite-backed DB): the
  // per-bucket stage-then-swap below is not safe under concurrent
  // writers or a reader racing a swap window. Recover from a crash
  // mid-swap on open, bucket by bucket: a `.old` whose main dir
  // vanished is the intact previous bucket — restore it; a `.old`
  // next to a live main dir is a completed swap's debris.
  locally {
    val root = new java.io.File(path)
    if (root.exists()) {
      root.listFiles().filter(_.getName.endsWith(".old")).foreach { old =>
        val main = new java.io.File(path, old.getName.stripSuffix(".old"))
        if (!main.exists()) {
          if (!old.renameTo(main))
            throw new java.io.IOException(s"KvStore recovery failed: cannot restore $old to $main")
        } else deleteRec(old)
      }
      // refuse to silently shadow a store written in another layout:
      // anything at the root that is not a bucket dir or the meta
      // file (e.g. a pre-bucketing flat parquet table) would become
      // invisible to current() and permanently masked by upserts
      val strangers = root.listFiles().filterNot { f =>
        f.getName == "_graft_buckets" ||
          (f.isDirectory && (f.getName.startsWith("b=")))
      }
      if (strangers.nonEmpty)
        throw new IllegalStateException(
          s"KvStore at $path contains non-bucketed entries ${strangers.map(_.getName).mkString(", ")} — " +
            "migrate the old flat-layout table (read it, then upsert into a fresh path) instead of opening it in place")
      // bucket dirs without the creation-time bucket count are
      // ambiguous: a different constructor count would mis-bucket
      // every future key
      if (root.listFiles().exists(f => f.isDirectory && f.getName.startsWith("b=")) &&
          !new java.io.File(path, "_graft_buckets").exists())
        throw new IllegalStateException(
          s"KvStore at $path has bucket dirs but no _graft_buckets meta — bucket count unknown")
    }
  }

  private val metaFile = new java.io.File(path, "_graft_buckets")

  /** Buckets in the on-disk layout (creation-time count wins). */
  private def buckets: Int =
    if (metaFile.exists())
      new String(java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8").trim.toInt
    else numBuckets

  private def bucketOf = pmod(hash(keyCols.map(col): _*), lit(buckets))

  private def bucketDirs: Seq[java.io.File] = {
    val root = new java.io.File(path)
    if (!root.exists()) Seq.empty
    else root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("b=") &&
      !f.getName.endsWith(".old")).toSeq.sortBy(_.getName)
  }

  /** Upsert a batch: new rows win over stored rows at equal keys by
    * (versionCol, then presence in the incoming batch). Only buckets
    * containing incoming keys are read, merged, and swapped.
    */
  def upsert(batch: DataFrame): Unit = {
    val nb = buckets
    // persisted: evaluated once for the touched-bucket probe and once
    // more by the staged write — without caching, a foreachBatch
    // source would be re-read per action
    val incoming = batch.withColumn("__gen", lit(1)).withColumn("__b", bucketOf)
      .persist()
    // bucket ids are bounded by nb (a constant), so this collect is a
    // ≤ nb-element driver list, not a data-sized one
    val touched = incoming.select("__b").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) { incoming.unpersist(); return }
    val existingTouched = touched.map(b => new java.io.File(path, s"b=$b"))
      .filter(_.exists())
    val merged = if (existingTouched.nonEmpty) {
      // bucket id re-derived from the keys (same deterministic hash)
      // rather than parsed from the directory name
      val cur = spark.read.parquet(existingTouched.map(_.getPath): _*)
        .withColumn("__gen", lit(0)).withColumn("__b", bucketOf)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col(versionCol).desc, col("__gen").desc)
      cur.unionByName(incoming)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn", "__gen")
    } else incoming.drop("__gen")
    // one job stages every touched bucket; then each bucket dir is
    // swapped into place. renameTo reports failure via its return
    // value, not an exception — an unchecked false would silently
    // lose the upsert.
    val staged = path + ".staged"
    deleteRec(new java.io.File(staged))
    merged.write.partitionBy("__b").mode("overwrite").parquet(staged)
    new java.io.File(path).mkdirs()
    if (!metaFile.exists())
      java.nio.file.Files.write(metaFile.toPath, nb.toString.getBytes("UTF-8"))
    touched.foreach { b =>
      val stagedB = new java.io.File(staged, s"__b=$b")
      val mainB = new java.io.File(path, s"b=$b")
      val oldB = new java.io.File(path, s"b=$b.old")
      if (!stagedB.exists())
        throw new IllegalStateException(s"KvStore staged bucket $b missing under $staged")
      if (mainB.exists()) {
        deleteRec(oldB)
        if (!mainB.renameTo(oldB))
          throw new java.io.IOException(s"KvStore swap failed: cannot move $mainB aside")
      }
      if (!stagedB.renameTo(mainB))
        throw new java.io.IOException(s"KvStore swap failed: cannot move $stagedB to $mainB")
      deleteRec(oldB)
    }
    deleteRec(new java.io.File(staged))
    incoming.unpersist()
  }

  def current(): Option[DataFrame] = {
    val dirs = bucketDirs
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.getPath): _*))
  }

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
