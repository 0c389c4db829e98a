package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** Minimal bridge into the engine's InternalRow plane, for the one
  * operator (graft.operators.Sequence) that must leave Catalyst for a
  * per-partition stateful kernel. `internalCreateDataFrame` is
  * package-private to `org.apache.spark.sql`, hence this package;
  * nothing else engine-internal is touched.
  *
  * Why it matters: `SparkSession.createDataFrame(RDD[Row], schema)`
  * pays an InternalRow→Row→InternalRow double conversion per row and
  * re-encodes every value through external converters; building the
  * frame from the InternalRow RDD directly keeps rows in the engine's
  * binary format end to end, and the resulting scan feeds whole-stage
  * codegen downstream like any other leaf.
  */
object InternalRows {

  def createDataFrame(spark: SparkSession, rows: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rows, schema)
}
