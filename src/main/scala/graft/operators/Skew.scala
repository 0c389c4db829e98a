package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §5).
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting
  * is the plan-level tool when one side has a few enormous keys and
  * the other side is small enough to replicate per salt: the big
  * side scatters each row to one of `salts` sub-keys, the small side
  * is replicated to all of them, so one hot key spreads over `salts`
  * tasks instead of one straggler.
  */
object Skew {

  /** Salted inner equi-join: result rows identical to
    * `big.join(small, keys)` — only the distribution changes.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    // deterministic scatter: hash of all columns mod salts (spreads
    // duplicates of the hot key too, unlike rand()-based salting)
    val scatter = pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(salts))
    val bigS = big.withColumn("__salt", scatter)
    val smallS = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
