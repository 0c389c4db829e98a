package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational/analytical queries: the deva pipe/aggregation surface
  * (`deva/core/pipe.py` groupby/aggregate/average/count/sort) and the
  * multi-table compositions deva applications build over pandas
  * frames, re-expressed as declarative Spark plans.
  *
  * Determinism doctrine (SURVEY §4): money arithmetic on
  * DECIMAL(18,2|4) so sums are exact and order-independent, result
  * cast to DOUBLE for a bit-identical DuckDB oracle.
  */
object RelationalQueries {

  /** decimal(18,2) view of a double column — exact, order-independent sums. */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  def q01_agg(spark: SparkSession, dir: String): DataFrame = {
    // TPC-H Q1 shape: map + groupby + aggregate + sort
    // (deva pipe.py:1001 aggregate, 1011 groupby, 527 average, 561 count).
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01_agg_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q01_agg _)
  )

  def oracles: Map[String, String] = Map(
    "q01_agg" -> q01_agg_sql
  )
}
