package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graftshim.InternalRows
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global sequencing — the scale-safe form of deva's
  * arrival-order operators (`zip` ops.py:179, `partition` ops.py:875),
  * whose reference implementations are single-threaded event loops
  * and whose naive Spark translation (row_number over a partition-less
  * Window) funnels the whole input through ONE task.
  *
  * This is the classic two-pass scalable rank (RDD zipWithIndex's
  * shape, with an explicit total order):
  *
  *  1. range-repartition on the order key (a PARALLEL total sort:
  *     disjoint ordered ranges, one per partition) and sort within
  *     partitions;
  *  2. per-partition row counts (one partition-count-bounded collect);
  *  3. prefix-summed offsets + the per-partition running counter,
  *     map-side — no window, no second exchange.
  *
  * idx = offset(partition) + local — bit-identical to `row_number()
  * OVER (ORDER BY order)` for a TOTAL order key (ties land in the same
  * range partition, so a total tie-break makes the result
  * deterministic, as SQL row_number also requires).
  *
  * Both passes run over ONE RDD instance, so the count job and the
  * index pass share the SAME shuffle materialization — Spark skips the
  * exchange stage on the second job and re-reads its files. That is
  * what makes the two passes see identical partition layouts WITHOUT
  * caching: range-boundary sampling is seeded by the RDD id, so two
  * separate query executions (the pre-r6 shape, which persisted the
  * frame to pin the layout — and leaked the cache) can land rows in
  * different partitions. No persist, no cached blocks to leak in
  * long-lived sessions; shuffle files are owned and GC'd by the
  * shuffle manager like any join's.
  *
  * The kernel runs on the engine's own InternalRow plane
  * (`queryExecution.toRdd` in, [[InternalRows.createDataFrame]] out):
  * rows stay in Tungsten binary format with NO external-Row round
  * trip, the appended index rides a 1-field [[JoinedRow]], and the
  * resulting scan feeds whole-stage codegen downstream like any leaf
  * (spec-asserted in PlanAuditSpec). The RDD hop is invisible to row
  * format and codegen; what it still costs — as any eager two-pass
  * must — is the optimizer barrier at this boundary (pushdown/pruning
  * don't cross it), which is inherent to computing offsets before the
  * plan continues.
  *
  * Cost at 100 TB: one range exchange (parallel) + one map pass +
  * a #partitions-sized driver collect.
  *
  * EAGER: calling this runs a Spark job (the per-partition counts)
  * at plan-construction time, unlike ordinary transformations.
  */
object Sequence {

  def globalRowNumber(df: DataFrame, order: Seq[Column], idxName: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    // ONE InternalRow RDD instance — the counts job below materializes
    // its shuffle; the index pass reuses those exact files (layout
    // pinned by the shuffle itself, not by a cache)
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val indexed = rdd.mapPartitionsWithIndex { case (i, it) =>
      // per-row: bump the counter, splice the index onto the UNCOPIED
      // input row via JoinedRow — the downstream scan's unsafe
      // projection materializes each row before the next is produced,
      // so the one-at-a-time reuse contract holds (standard operator
      // convention)
      var next = offsets(i)
      val idxCell = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        next += 1; idxCell.update(0, next)
        joined(r, idxCell): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    InternalRows.createDataFrame(spark, indexed,
      StructType(sorted.schema.fields :+ StructField(idxName, LongType, nullable = false)))
  }

  /** Global RUNNING SUM of a long column under a total order — the
    * scale-safe form of `sum(x) OVER (ORDER BY …)`, which Spark
    * executes through ONE task. Same two-pass discipline as
    * [[globalRowNumber]]: range-repartition + in-partition sort, a
    * partition-count-bounded collect of per-partition value sums,
    * then a map-side pass seeded with each partition's prefix offset.
    * Bit-identical to the window form because long addition is
    * associative and the range partitions are disjoint ordered runs.
    *
    * Cost at 100 TB: one range exchange + one map pass + a
    * #partitions-sized driver collect. EAGER like globalRowNumber.
    */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], valueCol: String,
      cumName: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.queryExecution.toRdd
    val sums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(valueIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val summed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var run = offsets(i)
      val cumCell = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        run += r.getLong(valueIdx); cumCell.update(0, run)
        joined(r, cumCell): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    InternalRows.createDataFrame(spark, summed,
      StructType(sorted.schema.fields :+ StructField(cumName, LongType, nullable = false)))
  }
}
