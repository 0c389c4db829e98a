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
  *  - named stream  → a temp view in the session catalog (`NS`)
  *  - named topic   → a directory under the namespace root (`NT`;
  *    [[Topic]] is stateless over its dir, so get-or-create is just
  *    the path convention)
  *  - named table   → a [[KvStore]] under the root (`table`/DBStream)
  *
  * Thread-safety comes from the catalog itself plus a local monitor
  * for the create-if-absent race (the reference uses an RLock).
  */
final class Namespace(spark: SparkSession, root: String) {

  /** deva `NS(name)` with a producer: return the flow registered
    * under `name`, creating and registering it on first call.
    */
  def flow(name: String)(create: => DataFrame): Flow = synchronized {
    if (spark.catalog.tableExists(name)) Flow(spark.table(name))
    else {
      val df = create
      df.createOrReplaceTempView(name)
      Flow(df)
    }
  }

  /** deva `NS(name)` lookup form; fails loudly when absent. */
  def get(name: String): Flow =
    if (spark.catalog.tableExists(name)) Flow(spark.table(name))
    else throw new NoSuchElementException(s"namespace has no flow named '$name'")

  /** deva `NT(name)`: the named topic (same name → same directory →
    * same log, from any module or process).
    */
  def topic(name: String): Topic = Topic(spark, s"$root/topics", name)

  /** deva `namespace.create(name, 'table')` (DBStream): the named
    * keyed table.
    */
  def table(name: String, keyCols: Seq[String], versionCol: String): KvStore =
    synchronized { new KvStore(spark, s"$root/tables/$name", keyCols, versionCol) }
}
