package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global sequencing — the scale-safe form of deva's
  * arrival-order operators (`zip` ops.py:179, `partition` ops.py:875),
  * whose reference implementations are single-threaded event loops
  * and whose naive Spark translation (row_number over a partition-less
  * Window) funnels the whole input through ONE task.
  *
  * This is the classic two-pass scalable rank instead:
  *
  *  1. range-repartition on the order key (a PARALLEL total sort:
  *     disjoint ordered ranges, one per partition) and sort within
  *     partitions;
  *  2. per-partition local sequence, map-side: after the sort,
  *     monotonically_increasing_id()'s documented layout (upper bits
  *     = partition id, lower 33 = the per-partition row counter in
  *     iteration order) IS the local index — no window, no exchange;
  *  3. per-partition row counts (one partition-count-bounded collect)
  *     prefix-summed into offsets and joined back as a map literal.
  *
  * idx = offset(partition) + local + 1 — bit-identical to
  * `row_number() OVER (ORDER BY order)` for a TOTAL order key (ties
  * land in the same range partition, so a total tie-break makes the
  * result deterministic; pass one, as SQL row_number also requires
  * for determinism).
  *
  * Cost at 100 TB: one range exchange (parallel) + one map pass +
  * a #partitions-sized driver collect. The frame is persisted across
  * the two passes so the count job and the downstream consumer see
  * the same materialization (blocks freed by the ContextCleaner once
  * the result is consumed; callers in loops can unpersist eagerly).
  */
object Sequence {

  private val LocalMask = (1L << 33) - 1

  def globalRowNumber(df: DataFrame, order: Seq[Column], idxName: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // nondeterministic expression: Catalyst will not reorder it
      // below the sort, so the counter follows sorted order
      .withColumn("__seq", monotonically_increasing_id().bitwiseAND(lit(LocalMask)))
      .persist()
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = acc; acc += n; pid -> o }.toMap
    sorted
      .withColumn(idxName, element_at(typedLit(offsets), col("__pid")) + col("__seq") + lit(1L))
      .drop("__pid", "__seq")
  }
}
