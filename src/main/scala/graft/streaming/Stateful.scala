package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-key folds — the reference's `accumulate`/`scan`
  * (deva/core/compute/ops.py:738): state = f(state, event), state
  * carried across events and (in streaming) across micro-batches in
  * the state store.
  *
  * Works on both batch and streaming Datasets (Spark evaluates
  * flatMapGroupsWithState per group on batch too).
  */
object Stateful {

  /** Per-key running fold, emitting one output per input event —
    * deva `accumulate(returns_state=False)` semantics.
    */
  def scanPerKey[K: Encoder, I: Encoder, S: Encoder, O: Encoder](
      ds: Dataset[I])(key: I => K)(zero: S)(step: (S, I) => S)(out: (K, S, I) => O): Dataset[O] = {
    ds.groupByKey(key)
      .flatMapGroupsWithState[S, O](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, it: Iterator[I], state: GroupState[S]) =>
          var s = state.getOption.getOrElse(zero)
          val outs = it.map { i =>
            s = step(s, i)
            state.update(s)
            out(k, s, i)
          }.toVector
          outs.iterator
      }
  }

  /** Per-key fold emitting only the final state per batch — the
    * `accumulate` → `latest` composition (running totals snapshot).
    */
  def foldPerKey[K: Encoder, I: Encoder, S: Encoder, O: Encoder](
      ds: Dataset[I])(key: I => K)(zero: S)(step: (S, I) => S)(out: (K, S) => O): Dataset[O] = {
    ds.groupByKey(key)
      .flatMapGroupsWithState[S, O](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, it: Iterator[I], state: GroupState[S]) =>
          var s = state.getOption.getOrElse(zero)
          it.foreach(i => s = step(s, i))
          state.update(s)
          Iterator.single(out(k, s))
      }
  }
}
