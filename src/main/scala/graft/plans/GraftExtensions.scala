package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: makes graft's custom expressions
  * first-class for SQL users (`SELECT graft_hash60(col)`) and injects
  * the library's optimizer rules ([[RewriteArrayDot]] — the natural
  * HOF dot-product silently gets the codegen'd kernel). A custom
  * Strategy/SparkPlan would register through the same channel if an
  * operator genuinely needed one (SURVEY §8 records why none does).
  *
  * Use: SparkSession.builder().withExtensions(new GraftExtensions) …
  * or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // injected Rules (r10): the natural HOF dot-product and the
    // composed md5-hex hash idiom rewrite to their codegen'd kernels;
    // (r11) the exact-cents cast chain fuses to the Cents kernel
    ext.injectOptimizerRule(_ => RewriteArrayDot)
    ext.injectOptimizerRule(_ => RewriteHash60)
    ext.injectOptimizerRule(_ => RewriteCents)
    // (r11 cont.) the natural word-shingling HOF fuses to the
    // codegen'd Shingles kernel
    ext.injectOptimizerRule(_ => RewriteShingles)
    // (r12) the journey/path idiom — transform(sort_array(
    // collect_list(struct)), x -> x.f) — fuses to the codegen'd
    // SortedTrail kernel (both steps were interpreter-bound)
    ext.injectOptimizerRule(_ => RewriteSortedTrail)
    ext.injectFunction((
      new FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "graft_hash60"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_hash60`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        Hash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_array_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_array_dot`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        ArrayDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingWindowHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_rolling_hash`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        val w = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_rolling_hash window length must be an integer literal, got $other")
        }
        RollingWindowHash(children.head, w)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_shingles`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingles width must be an integer literal, got $other")
        }
        Shingles(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cents"),
      new ExpressionInfo(classOf[Cents].getName, "graft_cents"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_cents`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        Cents(children.head,
          org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler_q4"),
      new ExpressionInfo(classOf[JaroWinklerQ4].getName, "graft_jaro_winkler_q4"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_jaro_winkler_q4`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        JaroWinklerQ4(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_trail"),
      new ExpressionInfo(classOf[SortedTrail].getName, "graft_sorted_trail"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_sorted_trail`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        val idx = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_sorted_trail field ordinal must be an integer literal, got $other")
        }
        SortedTrail(children.head, idx)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_size"),
      new ExpressionInfo(classOf[DeflateSize].getName, "graft_deflate_size"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_deflate_size`",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        DeflateSize(children.head)
      }))
  }
}
