package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Condition-triggered actions — the reference's `EventTrigger`
  * (deva/core/when.py:316, `when(condition).then(callback)`): a
  * predicate watches a stream; the callback fires for each
  * micro-batch that contains matching rows.
  *
  * Spark-first: the predicate is a Column pushed into the stream plan
  * (filter pushdown, codegen), the callback is a checkpointed
  * foreachBatch — so firing is exactly-once per micro-batch across
  * crashes, which the reference's in-process callback cannot offer.
  */
object Triggers {

  def when(flow: EventFlow, cond: Column): Armed = new Armed(flow, cond)

  final class Armed(flow: EventFlow, cond: Column) {

    /** Fire `action` once per micro-batch holding ≥1 matching row
      * (deva `.then(callback)`; named thenRun since `then` is reserved
      * in Scala 3). Empty batches do not fire.
      */
    def thenRun(checkpoint: String, trigger: Trigger = Trigger.AvailableNow())(
        action: (DataFrame, Long) => Unit): StreamingQuery =
      flow.where(cond).foreachBatchSink(checkpoint, trigger) { (batch, id) =>
        val hits = batch.persist()
        try if (hits.count() > 0) action(hits, id)
        finally { hits.unpersist(blocking = true); () }
      }
  }
}
