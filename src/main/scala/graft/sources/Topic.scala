package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.streaming.EventFlow

/** File-backed pub/sub topic — the reference's Topic / RedisStream /
  * sub-pub surface (deva/core/sources.py:1463 `Topic`, :768
  * `RedisStream`; core.py:1141 `sub`/`pub`) with a directory as the
  * broker.
  *
  * Layout: one directory per topic; every published batch appends
  * immutable parquet files. Subscribers are independent streaming
  * readers, each with its OWN checkpoint — so N subscribers each see
  * the full topic exactly once, at their own pace, with no broker
  * process and no coordination (the filesystem's atomic file listing
  * is the log). This is the same dir-as-log pattern production stacks
  * use before graduating to Kafka; swapping in EventFlow.kafkaReader
  * changes only the source line, not the dataflow.
  *
  * Retention/compaction is the owner's job (files are immutable;
  * delete by age), matching the reference's maxlen-trimmed streams.
  */
final case class Topic(spark: SparkSession, root: String, name: String) {

  val dir = s"$root/$name"

  /** Publish a batch (deva `pub`). Atomicity contract: the batch is
    * written to a dot-prefixed staging dir (invisible to Spark's file
    * listings) and its part files are renamed into the topic only
    * AFTER the write job commits — so a failed publish never leaves
    * partial data in the topic (only a staging dir, deleted here /
    * trivially GC-able), and the visibility window for a multi-file
    * batch shrinks from job-duration to a loop of metadata renames.
    * Visibility is per-FILE atomic: a subscriber polling inside that
    * rename loop can see a prefix of the batch — delivery is still
    * exactly-once per row, just possibly split across two polls.
    */
  def publish(df: DataFrame): Unit = {
    val spark = df.sparkSession
    // zero-padded so the stage id sorts lexicographically == numerically
    // (an unpadded nanoTime inverts order when its digit count grows)
    val stageName = f".stage_${System.nanoTime()}%020d"
    val stage = new org.apache.hadoop.fs.Path(s"$dir/$stageName")
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(stage.toString)
    val parts = fs.listStatus(stage).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    parts.foreach { st =>
      // prefix with the stage id so two concurrent publishes cannot
      // collide on part-file names. rename reports failure via its
      // return value — an unchecked false would silently drop rows,
      // and the staging dir must survive a failed rename (the data
      // lives there until every move lands), so deletion happens only
      // after the loop completes.
      val target = new org.apache.hadoop.fs.Path(dst, s"${stageName.drop(1)}_${st.getPath.getName}")
      if (!fs.rename(st.getPath, target))
        throw new java.io.IOException(
          s"Topic.publish rename failed: ${st.getPath} -> $target (staged batch left at $stage)")
    }
    fs.delete(stage, true)
  }

  /** Continuous publisher (a stream >> topic): exactly-once via the
    * writer's checkpoint.
    */
  def publishStream(flow: EventFlow, checkpoint: String): StreamingQuery =
    flow.toParquet(dir, checkpoint)

  /** Subscribe (deva `sub`): a streaming read of the topic. Each
    * subscriber passes its own checkpoint to whatever sink it drives;
    * distinct checkpoints → independent full-topic delivery.
    */
  def subscribe(schema: StructType): EventFlow =
    EventFlow(spark.readStream.schema(schema).parquet(dir))

  /** Schema of what's been published so far (footer read). */
  def schema: StructType = spark.read.parquet(dir).schema

  /** Batch view of the whole topic (deva Topic replay). */
  def replay(): DataFrame = spark.read.parquet(dir)

  /** Retention trim — the reference's maxlen-bounded streams
    * (deva/core/sources.py RedisStream trims with `maxlen`): delete
    * the oldest topic files beyond `keepFiles`, returning how many
    * were removed. Trimming is LOSSY BY DESIGN (exactly Redis
    * maxlen semantics): the owner must only trim past every
    * subscriber's checkpointed progress — a subscriber that still
    * needs a deleted file surfaces Spark's missing-file error rather
    * than silently skipping data. Order is (mtime, name); publish()
    * prefixes part files with their monotonic stage id, so same-
    * millisecond batches still trim in publish order.
    */
  def trim(keepFiles: Int): Int = {
    require(keepFiles >= 0, s"keepFiles must be >= 0, got $keepFiles")
    val doomed = oldestFirst().dropRight(keepFiles)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach(st => fs.delete(st.getPath, false))
    doomed.length
  }

  /** Checkpoint-aware trim: like [[trim]], but refuses to delete any
    * file some subscriber has not yet COMMITTED — the "only trim past
    * every subscriber's progress" contract as a mechanical check
    * instead of a comment. Pass every subscriber's checkpoint dir;
    * the trimmable set is the oldest-first prefix of files that all
    * of them have committed (prefix, not scatter, so retention stays
    * log-shaped). A lagging subscriber simply caps the trim at its
    * own frontier; it never sees a missing-file error.
    */
  def trimSafe(keepFiles: Int, subscriberCheckpoints: Seq[String]): Int = {
    require(keepFiles >= 0, s"keepFiles must be >= 0, got $keepFiles")
    require(subscriberCheckpoints.nonEmpty,
      "trimSafe needs at least one subscriber checkpoint (use trim() for unmanaged topics)")
    val committed = subscriberCheckpoints
      .map(committedFileNames)
      .reduce(_ intersect _)
    val doomed = oldestFirst().dropRight(keepFiles)
      .takeWhile(st => committed.contains(st.getPath.getName))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach(st => fs.delete(st.getPath, false))
    doomed.length
  }

  /** Topic data files, oldest first: (mtime, stage id, name) — the
    * numeric stage id (not its string form) breaks same-mtime ties so
    * ordering is correct even across historical unpadded ids.
    */
  private def oldestFirst(): Array[org.apache.hadoop.fs.FileStatus] = {
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst)) return Array.empty
    def stageSeq(n: String): Long =
      if (n.startsWith("stage_")) {
        val digits = n.drop("stage_".length).takeWhile(_.isDigit)
        if (digits.isEmpty) Long.MaxValue else digits.toLong
      } else Long.MaxValue // streamed part files order by name below
    fs.listStatus(dst).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.sortBy(st => (st.getModificationTime, stageSeq(st.getPath.getName), st.getPath.getName))
  }

  /** File names a file-stream subscriber has fully processed: the
    * source log entries (under checkpoint/sources/N/ for EVERY source
    * index — a multi-source query puts the topic at an arbitrary N —
    * including compacts) for batches with a commit marker
    * (commits/<b>). A file only SEEN (logged for an uncommitted batch)
    * is not counted. Entries are parsed as JSON (the v1 log is one
    * JSON object per line after the version header) so JSON-escaped
    * characters in paths can't silently shrink the committed set; in a
    * FILE-source dir, a committed log whose entries yield zero paths
    * fails LOUDLY — that is format drift, and silent under-parsing
    * there would stall retention forever. A source dir whose logs
    * carry no "path" field at all is a different source TYPE in a
    * multi-source checkpoint and is skipped, not flagged. Only entries
    * whose full parent path equals THIS topic's directory count
    * (other sources' files are not ours to trim by).
    */
  private[graft] def committedFileNames(checkpoint: String): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val commitsDir = new org.apache.hadoop.fs.Path(s"$checkpoint/commits")
    val cfs = commitsDir.getFileSystem(conf)
    if (!cfs.exists(commitsDir)) return Set.empty
    val committedMax = cfs.listStatus(commitsDir)
      .flatMap(st => st.getPath.getName.toLongOption)
      .foldLeft(-1L)(math.max)
    if (committedMax < 0) return Set.empty
    val sourcesRoot = new org.apache.hadoop.fs.Path(s"$checkpoint/sources")
    if (!cfs.exists(sourcesRoot)) return Set.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // the committed-set filter compares the decoded entry's FULL parent
    // path against this topic's qualified dir — name-only matching lets
    // two topics that share a directory NAME under different roots
    // cross-contaminate the set in a multi-source checkpoint
    val topicParent = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p).toUri.getPath
    }
    cfs.listStatus(sourcesRoot).filter(_.isDirectory).flatMap { srcDir =>
      // Parse every committed log in this source dir LENIENTLY first: a
      // source whose entries carry no "path" field at all is a
      // different source TYPE (an offset-based source sharing the
      // multi-source checkpoint), not format drift — it is simply not
      // ours to trim by, so the whole dir is skipped. Strict drift
      // checks (unparseable entry / entries-without-path) apply only
      // once the dir has identified itself as a file source by
      // yielding at least one path — THERE silent under-parsing would
      // stall retention forever.
      val logs: Seq[(org.apache.hadoop.fs.Path, Int, Seq[String], Option[Exception])] =
        cfs.listStatus(srcDir.getPath).filter(_.isFile).toSeq.flatMap { st =>
          val n = st.getPath.getName
          val batch = n.stripSuffix(".compact").toLongOption
          // a compact at id b carries all entries through batch b; either
          // form is admissible only once its batch is committed
          if (batch.exists(_ <= committedMax)) {
            val in = cfs.open(st.getPath)
            val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
            val entryLines = body.split("\n").map(_.trim)
              .filter(l => l.nonEmpty && l.startsWith("{"))
            var firstErr: Option[Exception] = None
            val paths = entryLines.toSeq.flatMap { l =>
              try Option(mapper.readTree(l).get("path")).map(_.asText)
              catch { case e: Exception => if (firstErr.isEmpty) firstErr = Some(e); None }
            }
            Some((st.getPath, entryLines.length, paths, firstErr))
          } else None
        }
      if (!logs.exists(_._3.nonEmpty)) Seq.empty // not a file source
      else {
        logs.foreach { case (logPath, nEntries, paths, err) =>
          err.foreach(e => throw new IllegalStateException(
            s"Topic.trimSafe: unparseable source-log entry in $logPath: " +
              s"${e.getMessage} — refusing to trim on a log format this code does not understand", e))
          if (nEntries > 0 && paths.isEmpty)
            throw new IllegalStateException(
              s"Topic.trimSafe: source log $logPath has $nEntries entries but none " +
                "carried a \"path\" field — the checkpoint log format has drifted; refusing to trim " +
                "(silent under-parsing would stall retention forever)")
        }
        logs.flatMap(_._3).map { p =>
          // the log stores the file's URI string; decode it so names
          // compare equal to listStatus's decoded names (fall back to
          // the raw string for non-URI-parseable paths)
          try new org.apache.hadoop.fs.Path(new java.net.URI(p).getPath)
          catch { case _: Exception => new org.apache.hadoop.fs.Path(p) }
        }.filter(e => Option(e.getParent).exists(_.toUri.getPath == topicParent))
          .map(_.getName)
      }
    }.toSet
  }
}
