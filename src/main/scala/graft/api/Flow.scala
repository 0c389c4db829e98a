package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** The deva-named batch DSL: a user of the reference's pipe/stream
  * API can express the same dataflow here, and each combinator lowers
  * to a declarative Spark plan (so Catalyst still sees through it —
  * nothing is opaque to pushdown/codegen).
  *
  * Reference surface → Flow:
  *   `x | pipe.map(f)`        → `flow.map(expr)`        (pipe.py:426)
  *   `x | pipe.filter(p)`     → `flow.filter(col)`      (pipe.py:456)
  *   `stream.pluck(k)`        → `flow.pluck(...)`       (ops.py:526)
  *   `stream.unique(key)`     → `flow.unique(...)`      (ops.py:403)
  *   `stream.union(s2)`       → `flow.union(f2)`        (ops.py:489)
  *   `stream.zip(s2)`         → `flow.zipByIndex(f2)`   (ops.py:179)
  *   `stream.combine_latest`  → `flow.combineLatest`    (ops.py:291)
  *   `stream.sliding_window`  → `flow.slidingWindow`    (ops.py:925)
  *   `stream.partition(n)`    → `flow.partitioned(n)`   (ops.py:875)
  *   `stream.accumulate(f)`   → `flow.accumulate(...)`  (ops.py:738)
  *   `pipe.head/tail/sort`    → `flow.head/tail/sort`   (pipe.py:277+)
  *   `pipe.sample(n)`         → `flow.sampleHash(...)`  (pipe.py:1381)
  *   `pipe.dedup(key)`        → `flow.firstPerKey(...)` (pipe.py:337)
  *
  * Ordering note: deva streams have implicit arrival order; a
  * distributed DataFrame does not. Every order-sensitive combinator
  * therefore takes explicit (and ideally total) ordering columns —
  * the price of running the same dataflow on 1000 executors.
  */
final case class Flow(df: DataFrame) {

  def map(cols: Column*): Flow = Flow(df.select(cols: _*))

  def mapWith(f: DataFrame => DataFrame): Flow = Flow(f(df))

  def filter(p: Column): Flow = Flow(df.filter(p))

  /** Extract a field/key — JSON path or struct/array access. */
  def pluckJson(src: Column, path: String, as: String): Flow =
    Flow(df.withColumn(as, get_json_object(src, path)))

  def flatten(src: Column, as: String): Flow =
    Flow(df.withColumn(as, explode(src)))

  /** Recursive flatten (deva `traverse`, pipe.py:699): fully unnest a
    * nested array column to its atoms, one output row per atom. deva
    * recurses per element at runtime; a DataFrame's nesting depth is
    * static in the schema, so the recursion runs at PLAN time — one
    * `flatten` per level collapses the nesting, then a single explode
    * emits the atoms (all codegen'd, no per-row recursion).
    */
  def traverse(src: String, as: String): Flow = {
    import org.apache.spark.sql.types.{ArrayType, DataType}
    def depth(dt: DataType): Int = dt match {
      case ArrayType(e, _) => 1 + depth(e)
      case _ => 0
    }
    val d = depth(df.schema(src).dataType)
    require(d >= 1, s"traverse: column '$src' is not an array")
    val collapsed = (1 until d).foldLeft(col(src))((c, _) =>
      org.apache.spark.sql.functions.flatten(c))
    Flow(df.withColumn(as, explode(collapsed)).drop(src))
  }

  def union(other: Flow): Flow = Flow(df.unionByName(other.df))

  /** Multi-way predicate dispatch (deva `route`, core.py:1064): each
    * named branch gets the rows matching its predicate; `rest`
    * collects rows no predicate claimed. One scan feeds all branches
    * when the sinks share an action (Catalyst reuses the subplan).
    */
  def route(branches: Seq[(String, Column)]): Map[String, Flow] = {
    val named = branches.map { case (name, p) => name -> Flow(df.filter(p)) }.toMap
    val claimed = branches.map(_._2).reduce(_ || _)
    named + ("rest" -> Flow(df.filter(!claimed)))
  }

  /** Keep first row per key under an explicit total order. */
  def firstPerKey(keys: Seq[String], order: Seq[Column]): Flow = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    Flow(df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn"))
  }

  /** Keep newest row per key (deva latest). */
  def latestPerKey(keys: Seq[String], order: Seq[Column]): Flow =
    Flow(AsOf.latest(df, keys, order))

  def unique(keys: Seq[String]): Flow = Flow(df.dropDuplicates(keys))

  /** Graphviz DOT of this flow's operator topology (deva
    * graph.py:358 visualization parity) — see [[graft.tools.PlanDot]].
    */
  def toDot(title: String = "flow"): String = graft.tools.PlanDot.dot(df, title)

  /** Pair rows of two flows by position under explicit total orders
    * (deva zip). The global index is the distributed two-pass rank
    * ([[graft.operators.Sequence]]), not a single-task window; keyed
    * [[combineLatest]] remains the alternative when position isn't
    * semantic.
    *
    * EAGER: runs the two-pass rank's count job (one per side) at call
    * time — this is not a lazy transformation.
    */
  def zipByIndex(other: Flow, thisOrder: Seq[Column], otherOrder: Seq[Column]): Flow = {
    val a = graft.operators.Sequence.globalRowNumber(df, thisOrder, "__idx")
    val b = graft.operators.Sequence.globalRowNumber(other.df, otherOrder, "__idx")
    Flow(a.join(b, "__idx").drop("__idx"))
  }

  /** As-of pairing: each left row gets the latest right row at or
    * before its timestamp per key (deva combine_latest/zip_latest).
    * Right-side ties on (key, rightTs) are resolved deterministically
    * by the payload struct (newest wins) before the join.
    */
  def combineLatest(right: Flow, key: String, leftTs: String, rightTs: String,
      payload: Seq[String], tolerance: Option[Long] = None): Flow = {
    val dedupedRight = AsOf.latest(right.df, Seq(key, rightTs),
      payload.map(col))
    Flow(AsOf.joinLeft(df, dedupedRight, key, leftTs, rightTs, payload, tolerance))
  }

  /** Rows-frame sliding aggregate per key (deva sliding_window):
    * each (aggregate expression, output name) is evaluated over the
    * trailing n-row frame, e.g. `(sum(col("v")), "mov_sum")`.
    */
  def slidingWindow(n: Int, keys: Seq[String], order: Seq[Column], aggs: (Column, String)*): Flow = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    Flow(aggs.foldLeft(df) { case (d, (agg, name)) => d.withColumn(name, agg.over(w)) })
  }

  /** Cumulative fold per key (deva accumulate as a window). */
  def accumulate(keys: Seq[String], order: Seq[Column], agg: Column, as: String): Flow = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Flow(df.withColumn(as, agg.over(w)))
  }

  /** Chunk into size-n groups under a total order (deva partition) —
    * distributed two-pass rank, no partition-less window. EAGER: runs
    * the rank's count job at call time (see [[graft.operators.Sequence]]).
    */
  def partitioned(n: Int, order: Seq[Column]): Flow =
    Flow(graft.operators.Sequence.globalRowNumber(df, order, "__idx")
      .withColumn("__grp", expr(s"(__idx - 1) div $n"))
      .drop("__idx"))

  def head(n: Int, order: Seq[Column]): Flow = Flow(df.orderBy(order: _*).limit(n))

  /** Last n rows under an ASCENDING order (plain columns — direction
    * is handled here), returned in that same ascending order like
    * deva's tail preserves stream order.
    */
  def tail(n: Int, order: Seq[Column]): Flow =
    Flow(df.orderBy(order.map(_.desc): _*).limit(n).orderBy(order: _*))

  def sort(order: Column*): Flow = Flow(df.orderBy(order: _*))

  /** Deterministic hash-mod sample (deva sample — but reproducible
    * at any parallelism, which `.sample()` is not across reruns).
    */
  def sampleHash(keyExpr: Column, oneIn: Int): Flow =
    Flow(df.filter(pmod(graft.functions.Determinism.hash60(keyExpr), lit(oneIn)) === 0))

  def groupAgg(keys: Seq[Column], aggs: Seq[Column]): Flow =
    Flow(df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))

  /** deva `append` (pipe.py:1102): a pipe can push one more element;
    * here a literal row unions in by NAME. Callers pass
    * (colName → value) pairs so the row can never bind to the wrong
    * column, and unionByName rejects a missing/extra field loudly.
    */
  def append(values: (String, Any)*): Flow = {
    val row = df.sparkSession.range(1).select(
      values.map { case (n, v) => lit(v).as(n) }: _*)
    Flow(df.unionByName(row.select(df.columns.map(col).toIndexedSeq: _*)))
  }

  /** deva `index` (pipe.py:1037): 0-based position of the first row
    * matching a predicate under an explicit total order (list.index
    * semantics) — the distributed reading of "where in the pipe is
    * this element". Runs through Sequence.globalRowNumber
    * (range-partitioned two-pass, no global window funnel; 1-based,
    * hence the −1), then a 1-row min agg. No match → one null row.
    */
  def indexOf(p: Column, order: Seq[Column], as: String = "idx"): Flow =
    Flow(graft.operators.Sequence.globalRowNumber(df, order, as)
      .filter(p).agg((min(col(as)) - 1L).as(as)))

  /** deva `islice`/`pslice` (pipe.py:29,852): ordered offset+limit.
    * offset() composes with limit() into ONE TakeOrdered-style plan —
    * never collect-then-drop.
    */
  def slice(from: Int, until: Int, order: Seq[Column]): Flow =
    Flow(df.orderBy(order: _*).offset(from).limit(math.max(until - from, 0)))

  def toDF: DataFrame = df
}
