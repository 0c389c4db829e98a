package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RangeJoin, Skew}

/** Scale-path operators: the bucketed range join and salted join must
  * be RESULT-identical to their naive forms (only distribution
  * differs), and bucketed tables must join without an Exchange.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  test("RangeJoin.pointInInterval equals the naive BETWEEN join") {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("ts").cast("long").as("es"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").cast("long").as("lo"), (col("ts").cast("long") + 3600).as("hi"))
    val bucketed = RangeJoin.pointInInterval(clicks, purch, "user_id", "es", "lo", "hi", 900)
      .select("cid", "pid")
    val naive = clicks.join(purch, Seq("user_id"))
      .filter(col("es") >= col("lo") && col("es") <= col("hi"))
      .select("cid", "pid")
    assert(bucketed.count() == naive.count())
    assert(bucketed.exceptAll(naive).count() == 0 && naive.exceptAll(bucketed).count() == 0)
  }

  test("RangeJoin plans an equi-join, not a nested loop") {
    val ev = Tables.events(spark, dir)
    val clicks = ev.select(col("event_id").as("cid"), col("user_id"), col("ts").cast("long").as("es"))
    val purch = ev.select(col("event_id").as("pid"), col("user_id"),
      col("ts").cast("long").as("lo"), (col("ts").cast("long") + 3600).as("hi"))
    val plan = RangeJoin.pointInInterval(clicks, purch, "user_id", "es", "lo", "hi", 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  test("saltedJoin result-identical to plain join") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    val supp = Tables.supplier(spark, dir).withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, Seq("l_suppkey"))
    val salted = Skew.saltedJoin(li, supp, Seq("l_suppkey"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // Spark's InjectRuntimeFilter builds a bloom filter from the
    // selective (filtered) dim side and applies might_contain on the
    // fact scan — the engine-native form of bloom-join pruning. The
    // thresholds exist to avoid the overhead on small scans; at
    // 100 TB the defaults (10 GB application side) fire on their own,
    // here they are lowered so the tiny test tables qualify.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join so pruning matters
      val li = Tables.lineitem(spark, dir)
      val part = Tables.part(spark, dir).filter(col("p_size") === 1)
      val j = li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_type")).agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter (might_contain) on the fact scan:\n$plan")
      assert(j.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the adaptive plan)") {
    // salting (Skew.saltedJoin) is the PLAN-level tool; AQE's
    // OptimizeSkewedJoin is the RUNTIME tool the doctrine defers to
    // for everything else — prove it actually fires, on a cloned
    // session with the size thresholds lowered so a local-mode toy
    // skew qualifies (at 100 TB the 256MB default fires on its own)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    // one hot key carries ~80% of the rows; payload inflates its bytes
    val big = s2.range(250000).select(
      when(col("id") < 200000, lit(1L)).otherwise(col("id")).as("k"),
      concat(lit("payload_"), col("id")).as("p"))
    val small = s2.range(1000).select(col("id").as("k"), col("id").as("v"))
    // keep the incompressible payload THROUGH the shuffle — projecting
    // it away would let the constant hot key compress under the
    // skew threshold and the test would pass or fail on lz4 behavior
    val j = big.join(small, "k").select("k", "p")
    j.collect() // the collect finalizes THIS dataset's adaptive QE
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE must mark the skewed join (skew=true):\n$plan")
  }

  test("gate queries q84/q85 keep their scale shapes (bloom prune; bucket co-location)") {
    // the oracle checks only VALUES; these pin the PLANS the rows claim:
    // q84's fact scan carries the runtime bloom filter, and q85's
    // sort-merge join reads both bucketed sides without an exchange
    // (the only hashpartitioning exchange is the groupBy above the join)
    val q84 = SparkEntry.queries("q84_bloom")(spark, dir)
    val p84 = q84.queryExecution.executedPlan.toString
    assert(p84.contains("might_contain"),
      s"q84 must bloom-prune the fact scan:\n$p84")
    val q85 = SparkEntry.queries("q85_bucket")(spark, dir)
    val p85 = q85.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p85).size
    assert(p85.contains("SortMergeJoin"), s"q85 must sort-merge-join:\n$p85")
    assert(exchanges <= 1,
      s"q85's bucketed join must not shuffle its inputs (>1 exchange found):\n$p85")
  }

  test("bucketed tables sort-merge-join without shuffle exchanges") {
    // warehouse dir is a static conf — use the default ./spark-warehouse.
    // The in-memory catalog forgets tables between JVMs but the files
    // remain → clear locations too, or saveAsTable fails.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("li_b", "ord_b").foreach { t =>
      val d = new java.io.File(wh, t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (d.exists()) rm(d)
    }
    Tables.lineitem(spark, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, dir)
      .withColumnRenamed("o_orderkey", "l_orderkey").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("ord_b")
    val joined = spark.sql(
      """SELECT /*+ MERGE(li_b) */ l.l_orderkey, l.l_quantity, o.o_totalprice
        |FROM li_b l JOIN ord_b o USING (l_orderkey)""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 0, s"bucketed join must not shuffle, found $exchanges exchanges:\n$plan")
    assert(joined.count() > 0)
  }

  test("a planted giant LSH bucket fails LOUDLY instead of expanding quadratically") {
    import spark.implicits._
    import graft.operators.Dedup
    // 12 docs with IDENTICAL signatures land in one bucket per band
    val sig = (0L until 12L).toDF("id")
    val full = Dedup.perms.indices.foldLeft(sig)((d, i) => d.withColumn(s"m$i", lit(7L)))
    // under the cap: the expansion still works and yields C(12,2) pairs
    val ok = Dedup.lshCandidatePairs(full, "id", maxBucket = 100)
    assert(ok.count() == 66)
    // over the cap: loud in-plan failure with an actionable message
    val e = intercept[Exception]( // SparkRuntimeException (USER_RAISED_EXCEPTION)
      Dedup.lshCandidatePairs(full, "id", maxBucket = 5).count())
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
    assert(msg.contains("exceeds 5 members"), s"unexpected failure: $msg")
  }
}
