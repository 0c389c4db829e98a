package graft.tools
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    try graft.SparkEntry.queries("q01_agg")(spark, dir).count() catch { case _: Throwable => }
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[timeq] $q%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
