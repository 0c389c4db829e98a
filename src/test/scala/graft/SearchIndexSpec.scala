package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SearchIndex

/** The persisted-index contract (deva search.py IndexStream): build
  * once, serve from the store, and an incremental update tick makes
  * NEW documents searchable with no rebuild and no raw-text scan.
  */
class SearchIndexSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("index-served search equals the from-corpus answer; update tick adds new docs") {
    val base = Files.createTempDirectory("graft_sidx").toString
    val src = s"$base/incoming"; val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val store = SearchIndex.open(spark, s"$base/postings", numBuckets = 8)

    // tick 1: initial corpus arrives
    val wave1 = docsDf(Seq(
      (1L, "spark query engine"),
      (2L, "query the table with spark query"),
      (3L, "unrelated text about nothing")))
    wave1.write.mode("append").parquet(src)
    SearchIndex.updateTick(spark, src, wave1.schema, ckpt, store, "doc_id", "text")
    val r1 = SearchIndex.search(spark, store, Seq("spark", "query"), 10).collect()
    assert(r1.map(_.getLong(1)).toSeq == Seq(2L, 1L), "doc 2 has 3 hits, doc 1 has 2")
    assert(r1.head.getLong(2) == 3L, "n_hits counts total occurrences")

    // tick 2: a NEW doc arrives; it must become searchable through the
    // incremental tick alone — no rebuild of docs 1-3's postings
    docsDf(Seq((4L, "spark spark spark query"))).write.mode("append").parquet(src)
    SearchIndex.updateTick(spark, src, wave1.schema, ckpt, store, "doc_id", "text")
    val r2 = SearchIndex.search(spark, store, Seq("spark", "query"), 10).collect()
    assert(r2.map(_.getLong(1)).toSeq == Seq(4L, 2L, 1L))

    // a duplicated query term must not make the AND filter
    // unsatisfiable (terms dedupe before the n_terms comparison)
    val dup = SearchIndex.search(spark, store, Seq("spark", "spark", "query"), 10).collect()
    assert(dup.map(_.getLong(1)).toSeq == r2.map(_.getLong(1)).toSeq)

    // idle tick: nothing new → store unchanged (exactly-once contract)
    val before = store.get().count()
    SearchIndex.updateTick(spark, src, wave1.schema, ckpt, store, "doc_id", "text")
    assert(store.get().count() == before, "idle tick must be a no-op")
  }

  test("serving reads only the buckets the query terms hash into") {
    val base = Files.createTempDirectory("graft_sidx_prune").toString
    val store = SearchIndex.open(spark, s"$base/postings", numBuckets = 8)
    // many distinct terms so all 8 buckets exist
    val docs = docsDf((0L until 64L).map(i => (i, s"term$i common")))
    SearchIndex.index(store, docs, "doc_id", "text")
    val allBuckets = new java.io.File(s"$base/postings").listFiles()
      .count(_.getName.startsWith("b="))
    assert(allBuckets == 8, s"expected all 8 buckets populated, got $allBuckets")
    import spark.implicits._
    val posts = store.lookup(Seq("term3", "term17").toDF("tok")).get
    // the pruned frame's files must come from ≤ 2 bucket dirs
    val dirsRead = posts.inputFiles.map(f => f.split("/").dropRight(1).last).distinct
    assert(dirsRead.length <= 2, s"lookup must prune to term buckets, read ${dirsRead.toSeq}")
    assert(dirsRead.forall(_.startsWith("b=")))
    // and pruning does not change the answer
    val viaLookup = posts.filter(col("tok") === "term3").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaLookup == Seq(3L))
  }
}
