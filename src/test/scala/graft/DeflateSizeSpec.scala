package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.DeflateSize

/** graft_deflate_size — the compression-ratio repetition/quality
  * signal (Gopher/RefinedWeb family). No SQL engine exposes deflate,
  * so this is spec-verified: reference equality against a direct
  * java.util.zip run, codegen vs interpreted parity, the
  * discrimination property the curation pipelines rely on, and the
  * codegen span.
  */
class DeflateSizeSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  private def referenceSize(s: String): Long = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end(); n
  }

  test("expression equals a direct Deflater run on corpus docs + edges") {
    import spark.implicits._
    val edge = Seq("", "a", "ab" * 4000, "你好" * 100, "😀")
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq ++ edge
    val got = texts.toDF("text")
      .select(col("text"), DeflateSize(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(got(t) == referenceSize(t), s"mismatch on ${t.take(40)}…")
    }
  }

  test("codegen and interpreted modes agree") {
    import spark.implicits._
    val df = Tables.documents(spark, "/root/testdata/sf0.001").select(col("text"))
    val on = df.select(DeflateSize(col("text")).as("n")).as[Long].collect().sorted
    val off = spark.sessionState.conf
    val prev = off.getConfString("spark.sql.codegen.wholeStage", "true")
    try {
      off.setConfString("spark.sql.codegen.wholeStage", "false")
      val interp = df.select(DeflateSize(col("text")).as("n")).as[Long].collect().sorted
      assert(on.toSeq == interp.toSeq)
    } finally off.setConfString("spark.sql.codegen.wholeStage", prev)
  }

  test("discriminates repetition from entropy (the curation property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val boiler = ("click here to subscribe " * 200).trim     // template spam
    val noise = new String(Array.fill(4000)((rnd.nextInt(94) + 33).toChar)) // gibberish
    val rows = Seq(boiler, noise).toDF("text")
      .select(col("text"),
        (DeflateSize(col("text")).cast("double") / octet_length(col("text"))).as("ratio"))
      .collect().map(r => r.getDouble(1))
    val (boilerRatio, noiseRatio) = (rows(0), rows(1))
    assert(boilerRatio < 0.05, s"boilerplate should crush: $boilerRatio")
    assert(noiseRatio > 0.7, s"high-entropy text should not compress: $noiseRatio")
  }

  test("null in → null out; SQL registration works") {
    import spark.implicits._
    val r = Seq[(java.lang.Long, String)]((1L, null), (2L, "abc")).toDF("id", "text")
      .select(DeflateSize(col("text")).as("n")).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
    val viaSql = spark.sql("SELECT graft_deflate_size('abcabcabc')").collect()(0).getLong(0)
    assert(viaSql == referenceSize("abcabcabc"))
  }

  test("runs inside WholeStageCodegen") {
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(DeflateSize(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), s"no codegen span:\n$plan")
  }
}
