package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Determinism

/** The native Hash60 expression must agree with the composed
  * builtins form (and therefore with the DuckDB oracle rendering)
  * on every input, and must run inside whole-stage codegen.
  */
class Hash60Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, shufflePartitions = 4)

  // Since r10, RewriteHash60 rewrites the composed form to the
  // native expression session-wide — which would make these A/B
  // equality tests compare Hash60 to itself. Run them on a cloned
  // session with the rule excluded so the INTERPRETED composed path
  // stays the reference.
  lazy val abSpark = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RewriteHash60")
    s
  }

  test("native == composed on corpus tokens + edge cases") {
    import abSpark.implicits._
    val edge = Seq("", " ", "a", "你好", "😀", "x" * 10000)
    val docs = Tables.documents(abSpark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("s")).limit(5000)
      .union(edge.toDF("s"))
    val ab = docs.select(
        Determinism.hash60(col("s")).as("a"),
        Determinism.hash60Composed(col("s")).as("b"))
    assert(ab.queryExecution.optimizedPlan.toString.contains("conv("),
      "exclusion conf did not keep the composed reference path")
    assert(ab.filter(col("a") =!= col("b")).count() == 0)
  }

  test("agreement on 10k random unicode strings (seeded)") {
    import abSpark.implicits._
    val rnd = new scala.util.Random(42)
    val ss = Seq.fill(10000) {
      val len = rnd.nextInt(40)
      new String(Array.fill(len)((rnd.nextInt(0xD700) + 0x20).toChar))
    }
    val bad = ss.toDF("s")
      .select(Determinism.hash60(col("s")).as("a"),
        Determinism.hash60Composed(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("hash60 runs inside WholeStageCodegen") {
    val plan = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Determinism.hash60(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    // executedPlan.toString marks whole-stage-codegen stages with "*(n)"
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), s"no codegen span:\n$plan")
  }

  test("values are non-negative 60-bit") {
    val mm = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Determinism.hash60(col("text")).as("h"))
      .agg(min("h"), max("h")).collect()(0)
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << 60))
  }

  /** The composed HigherOrderFunction form ArrayDot replaces — kept
    * here as the equality reference (it is also what the DuckDB
    * oracle's list_reduce rendering mirrors).
    */
  private def dotComposed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("ArrayDot: bit-identical to the composed fold on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(e.limit(20).select(col("embedding").as("b")))
    val bad = pairs.select(
        graft.plans.ArrayDot(col("a"), col("b")).as("fast"),
        dotComposed(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")) // exact bit equality, no tolerance
      .count()
    assert(bad == 0)
  }

  test("ArrayDot: null/length semantics match zip_with padding; mixed element types work") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)), // 11.0
      (Seq(1.0f), Seq(1.0f, 2.0f)) // length mismatch → null
    ).toDF("a", "b")
    val rows = df.select(graft.plans.ArrayDot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0), "length mismatch must be null like the composed form")
    // null element → null (composed form: null product poisons the sum)
    val withNull = spark.sql("SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) a, array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)) b")
      .select(graft.plans.ArrayDot(col("a"), col("b")).as("d")).collect()
    assert(withNull(0).isNullAt(0))
    // float × long-literal plane (the lshBucket shape)
    val mixed = Seq((Seq(2.0f, 3.0f))).toDF("a")
      .select(graft.plans.ArrayDot(col("a"), array(lit(10L), lit(100L))).as("d")).collect()
    assert(mixed(0).getDouble(0) == 320.0)
  }

  test("ArrayDot runs inside WholeStageCodegen") {
    val plan = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(graft.plans.ArrayDot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), s"no codegen span:\n$plan")
  }

  test("graft_array_dot is SQL-registered via GraftExtensions") {
    val viaSql = spark.sql(
      "SELECT graft_array_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(2.0D, 3.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(viaSql == 9.0)
  }

  private def rwh(w: Int) = graft.plans.RollingWindowHash(
    org.apache.spark.sql.catalyst.expressions.Literal.create(null,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)), w)

  private def rwhKernel(tks: Seq[String], w: Int): Seq[Long] = {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      tks.map(t => org.apache.spark.unsafe.types.UTF8String.fromString(t)).toArray[Any])
    rwh(w).kernel(arr).toLongArray().toSeq
  }

  test("RollingWindowHash: rolled windows equal freshly-computed windows (property, seeded)") {
    // the rolling update (drop t·B^(w-1), shift, add) must equal a
    // fresh polynomial per window — an exactly-w-length array never
    // rolls, so the no-roll path is the independent reference. Sweeps
    // empty input, n < w, n == w, heavy duplicate tokens, unicode.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "ab", "你好", "x" * 100, "tok1", "tok2", "", "a")
    val cases = ((0 until 300).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
    } :+ Seq.empty[String]) :+ Seq.fill(20)("dup")
    for (w <- Seq(1, 2, 3, 7, 50)) {
      cases.foreach { tks =>
        val rolled = rwhKernel(tks, w)
        assert(rolled.length == math.max(0, tks.length - w + 1), s"w=$w n=${tks.length}")
        rolled.zipWithIndex.foreach { case (h, i) =>
          val fresh = rwhKernel(tks.slice(i, i + w), w)
          assert(fresh == Seq(h), s"rolled($i) != fresh at w=$w n=${tks.length}")
        }
      }
    }
    // identical windows hash identically; the all-dup case proves it
    assert(rwhKernel(Seq.fill(20)("dup"), 7).distinct.length == 1)
  }

  test("RollingWindowHash: codegen equals the interpreted kernel on real corpus tokens") {
    val tk = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), graft.operators.TextAnalysis.tokens(col("text")).as("tk"))
    val viaPlan = tk.select(col("doc_id"),
        graft.plans.RollingWindowHash(col("tk"), 5).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaKernel = tk.collect()
      .map(r => r.getLong(0) -> rwhKernel(r.getSeq[String](1), 5).toVector).toMap
    assert(viaPlan == viaKernel)
    val plan = tk.select(graft.plans.RollingWindowHash(col("tk"), 5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), s"no codegen span:\n$plan")
  }

  test("RollingWindowHash: shared-window structure matches q87's md5 formulation on the real corpus") {
    // the production kernel must flag exactly the same per-doc window
    // counts and cross-doc shared windows as the gate's
    // md5-of-joined-window formulation — same structure, O(tokens)
    // instead of O(tokens·w) bytes hashed
    import org.apache.spark.sql.expressions.Window
    val w = 50
    val tk = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), graft.operators.TextAnalysis.tokens(col("text")).as("tk"))
    def perDoc(hs: org.apache.spark.sql.Column): Map[Long, (Long, Long)] = {
      val pp = tk.select(col("doc_id"), explode(hs).as("h"))
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("m"))
      pp.withColumn("nd", count(lit(1)).over(Window.partitionBy(col("h"))))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("nw"),
          sum(when(col("nd") >= 2, col("m")).otherwise(lit(0L))).as("ns"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val viaRoll = perDoc(graft.plans.RollingWindowHash(col("tk"), w))
    val viaMd5 = perDoc(
      when(size(col("tk")) >= w,
        transform(sequence(lit(0), size(col("tk")) - w),
          i => md5(concat_ws(" ", slice(col("tk"), i + 1, lit(w))))))
        .otherwise(array().cast("array<string>")))
    assert(viaRoll == viaMd5,
      "rolling-hash window structure must equal the md5 formulation's")
    assert(viaRoll.values.exists(_._2 > 0), "nonvacuous: the corpus has shared windows")
  }

  test("graft_rolling_hash is SQL-registered via GraftExtensions") {
    val r = spark.sql("SELECT graft_rolling_hash(array('a','b','c'), 2) AS hs")
      .collect()(0).getSeq[Long](0)
    assert(r.length == 2 && r.distinct.length == 2)
    // same windows → same hashes, cross-checked against the kernel
    assert(r == rwhKernel(Seq("a", "b", "c"), 2))
  }
}
