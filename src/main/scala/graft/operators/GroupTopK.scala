package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof exact per-group top-k — the per-group analogue of
  * Spark's own global TakeOrderedAndProject (each partition keeps its
  * local top-k, a final pass ranks the survivors).
  *
  * The naive formulation — `row_number() OVER (PARTITION BY key ORDER
  * BY ord) <= k` — shuffles EVERY row of a group into one task and
  * sorts it there; at 100 TB one planetary-sized group (a dominant
  * domain, a hot key) becomes the stage's straggler. Here no task ever
  * sorts more than its own partition's share:
  *
  *  1. local pass: rank within (key, input partition id) — the window
  *     partitions by (key, pid), so the heaviest group is spread over
  *     however many partitions it arrived in — and keep k per cell;
  *  2. global pass: rank the ≤ k × #partitions survivors per key.
  *
  * Both passes are plain hash shuffles + bounded sorts; the survivor
  * frame of pass 2 is k-bounded per (key, partition), so its window
  * sort is tiny regardless of group skew. Result is EXACTLY the naive
  * window's (spec-asserted in PlanAuditSpec, which sweeps sizes, skew,
  * k, and partition counts; q09_rank_slice runs through this operator
  * against its unchanged SQL oracle): every global top-k row is
  * necessarily in its partition's local top-k (the rank function is
  * monotone under row removal), so pass 1 never discards a winner.
  *
  * `order` must totally order rows within a key (add a unique
  * tie-break column, as for any deterministic rank).
  */
object GroupTopK {

  def rank(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
      rankName: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    rank(df, keys, order, lit(k), rankName)
  }

  /** Per-group k from a COLUMN (constant within each group — e.g. a
    * joined quota): same two-pass shape, each group bounded by its
    * own k. The monotone argument is unchanged because k never
    * varies inside a group; a row whose global rank ≤ k(group) has
    * local rank ≤ k(group) in its partition a fortiori. With large
    * k this degrades gracefully toward the naive window (the local
    * pass keeps everything) — the skew protection pays off exactly
    * when k ≪ group size, which is the top-k regime.
    */
  def rank(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Column,
      rankName: String): DataFrame = {
    val keyCols = keys.map(col)
    val local = Window.partitionBy(keyCols :+ col("__gtk_pid"): _*).orderBy(order: _*)
    val global = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    df.withColumn("__gtk_k", k)
      .withColumn("__gtk_pid", spark_partition_id())
      .withColumn("__gtk_lr", row_number().over(local))
      .filter(col("__gtk_lr") <= col("__gtk_k"))
      .drop("__gtk_pid", "__gtk_lr")
      .withColumn(rankName, row_number().over(global).cast("long"))
      .filter(col(rankName) <= col("__gtk_k"))
      .drop("__gtk_k")
  }
}
