package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the batch analogue of the reference's
  * `combine_latest` / `zip_latest` stream nodes
  * (deva/core/compute/ops.py:291, :618): every left event is paired
  * with the *latest* right event at or before its timestamp, per key.
  *
  * Scale design: one shuffle on the key via a tagged union + ordered
  * window scan — never a range cross-join. At 100 TB both sides
  * shuffle-partition by key; state per partition is a single "last
  * seen right row" cursor, which sort-merge evaluates streamingly.
  * (This is the same algorithm Flink/QuestDB use for ASOF JOIN.)
  */
object AsOf {

  /** Left as-of join.
    *
    * @param left      driving rows (all preserved)
    * @param right     lookup rows
    * @param key       equi-join key column name (same name both sides)
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payload   right columns to carry (renamed as given)
    * @param tolerance optional max age in seconds (right row older
    *                  than leftTs - tolerance is not matched)
    */
  /** NOTE: when two right rows share (key, rightTs) exactly, which
    * one wins is undefined — pre-dedup with [[latest]] (as q30/q38
    * and Flow.combineLatest do) to make the pick total.
    */
  def joinLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    // fail at call time, not with silent duplicate output columns
    val reserved = Set("__t", "__side", "__p", "__c", "__c_ts")
    val payloadClash = payload.toSet.intersect(leftCols.toSet)
    require(payloadClash.isEmpty,
      s"as-of payload column(s) ${payloadClash.mkString(", ")} collide with left columns — rename the payload")
    val reservedClash = (leftCols.toSet ++ payload.toSet).intersect(reserved)
    require(reservedClash.isEmpty,
      s"column name(s) ${reservedClash.mkString(", ")} are reserved by AsOf.joinLeft — rename them")
    // tag: right rows sort before left rows at equal timestamps → "<=" semantics.
    // The payload travels as ONE struct so the carried values always
    // come from a single right row (per-column last() could mix a
    // NULL field from the newest row with a value from an older one).
    val taggedRight = right.select(
      col(key).as(key),
      col(rightTs).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"))
    val taggedLeft = left.select(
      (col(key).as(key) +:
        col(leftTs).cast("timestamp").as("__t") +:
        lit(1).as("__side") +:
        leftCols.filterNot(_ == key).toIndexedSeq.map(c => col(c))): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__c_ts", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    val matched = tolerance match {
      case Some(sec) =>
        // outside tolerance → null out the carried payload
        carried.withColumn("__c",
          when(col("__c_ts").isNotNull &&
            col("__t").cast("long") - col("__c_ts").cast("long") <= sec, col("__c")))
      case None => carried
    }
    matched
      .filter(col("__side") === 1)
      .select((leftCols.toIndexedSeq.map(col) ++ payload.map(p => col(s"__c.$p").as(p))): _*)
  }

  /** Latest row per key — deva `latest` (ops.py:682): deterministic
    * "newest value wins" with an explicit total order.
    */
  def latest(df: DataFrame, key: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
