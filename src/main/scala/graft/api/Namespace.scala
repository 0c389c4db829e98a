package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{KvStore, Topic}

/** Named-object registry — the reference's namespace surface
  * (deva/core/namespace.py:56 `Namespace`, :76 `create`, :148 `NS` /
  * :183 `NT` / :213 `NB`): get-or-create globally named streams,
  * topics, and tables so independent modules share one object by
  * name instead of wiring references through.
  *
  * Spark-first mapping — the engine already HAS a name registry:
  *  - named flow  → a temp view in the session catalog (`NS`),
  *    PREFIXED with a root-derived tag so two namespaces with
  *    different roots cannot see each other's names (and cannot
  *    collide with unrelated catalog tables)
  *  - named topic → a directory under the namespace root (`NT`)
  *  - named table → ONE [[KvStore]] instance per (root, name),
  *    cached JVM-wide — KvStore is single-writer, so every module
  *    resolving the name must share the same handle, not construct
  *    its own
  *
  * Get-or-create is serialized on a JVM-global lock (the reference
  * uses an RLock on its global namespace): two modules racing the
  * same name run the producer exactly once.
  */
final class Namespace(spark: SparkSession, rawRoot: String) {

  /** Canonical identity. Two spellings of one directory (trailing
    * slash, relative vs absolute, `..` segments) must resolve to ONE
    * namespace — otherwise two KvStore handles exist over the same
    * files and the single-writer guarantee silently breaks. And two
    * DIFFERENT roots must never alias: the previous 32-bit
    * `root.hashCode` tag could collide (silent cross-namespace
    * visibility), so the tag is the full md5 of the canonical root.
    */
  private val root: String = {
    val scheme = try new java.net.URI(rawRoot).getScheme catch {
      case _: java.net.URISyntaxException => null
    }
    // local paths canonicalize through the filesystem (resolves `..`,
    // trailing slash, relative-vs-absolute); URI roots (hdfs://,
    // s3a://) must NOT go through java.io.File — it would collapse the
    // scheme slashes and prepend the cwd — so they normalize through
    // Hadoop's Path (redundant/trailing separators) instead
    if (scheme == null) new java.io.File(rawRoot).getCanonicalPath
    else new org.apache.hadoop.fs.Path(rawRoot).toString
  }

  private val rootTag: String = java.security.MessageDigest
    .getInstance("MD5").digest(root.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private def tag(name: String): String = s"graft_ns_${rootTag}_$name"

  /** deva `NS(name)` with a producer: return the flow registered
    * under `name`, creating and registering it on first call.
    */
  def flow(name: String)(create: => DataFrame): Flow = Namespace.lock.synchronized {
    val v = tag(name)
    if (spark.catalog.tableExists(v)) Flow(spark.table(v))
    else {
      val df = create
      df.createOrReplaceTempView(v)
      Flow(df)
    }
  }

  /** deva `NS(name)` lookup form; fails loudly when absent. */
  def get(name: String): Flow = {
    val v = tag(name)
    if (spark.catalog.tableExists(v)) Flow(spark.table(v))
    else throw new NoSuchElementException(s"namespace has no flow named '$name'")
  }

  /** deva `NT(name)`: the named topic (same name → same directory →
    * same log, from any module or process).
    */
  def topic(name: String): Topic = Topic(spark, s"$root/topics", name)

  /** deva `namespace.create(name, 'table')` (DBStream): the named
    * keyed table. Same (root, name) → the SAME KvStore instance
    * JVM-wide (the store is single-writer); asking for an existing
    * name with a different key configuration is an error, not a
    * silent re-keying.
    */
  def table(name: String, keyCols: Seq[String], versionCol: String): KvStore =
    Namespace.lock.synchronized {
      val path = s"$root/tables/$name"
      Namespace.tables.get(path) match {
        case null =>
          val s = new KvStore(spark, path, keyCols, versionCol)
          Namespace.tables.put(path, (s, keyCols, versionCol))
          s
        case (s, k, v) =>
          require(k == keyCols && v == versionCol,
            s"table '$name' already registered with keys $k/version $v — got $keyCols/$versionCol")
          s
      }
    }
}

private object Namespace {
  val lock = new Object
  val tables = new java.util.concurrent.ConcurrentHashMap[String, (KvStore, Seq[String], String)]()
}
