package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's scale-oriented defaults.
  *
  * Mirrors the event-loop bootstrap role of the reference's
  * `deva.core.Deva.run` (deva/core/core.py:1964) — but in Spark the
  * "loop" is the cluster scheduler; we only pin configuration:
  * UTC (oracle parity), AQE (runtime re-planning / skew joins),
  * shuffle partitions sized for the local test harness.
  */
object Sessions {
  def local(cores: Int = 4, shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalesces post-shuffle partitions by BYTE size; this
      // engine's text/graph kernels carry seconds of compute per MB
      // (shingle explode, array_distinct, intersect verification), so
      // the default 1 MB floor collapses those stages to 1–2 tasks at
      // test SFs (measured: q127's shingle build 9 s single-task vs
      // 0.4 s wide). A 64 KB floor keeps small-but-hot shuffles at the
      // parallelism target; at production scale shuffle bytes dwarf
      // any floor and this setting is inert.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // codegen cache sized for many-query sessions — see Bench.scala
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
