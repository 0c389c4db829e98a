package graft.tools
import graft.{Sessions, SparkEntry}
/** Plan inspector: sbt "runMain graft.tools.ExplainQ q06_join5 [sfdir]" */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(cores = 8, shufflePartitions = 32)
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
