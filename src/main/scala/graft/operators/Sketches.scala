package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketches as typed [[Aggregator]]s — the public custom-
  * aggregate API (brief preference (b) family): partial states merge
  * associatively, so Spark evaluates them map-side first and ships
  * only the k-element state per partition — the property that makes
  * them 100 TB-safe where exact distinct needs a full shuffle.
  */
object Sketches {

  /** KMV (k-minimum-values) bottom-k sketch over 60-bit hashes.
    *
    * State: the k smallest distinct hash values seen. Estimates
    * distinct count as (k-1) * 2^60 / kth_min (exact when fewer than
    * k distinct values exist). Two sketches' Jaccard ≈ overlap of
    * their unions' bottom-k — the streaming/exact-free counterpart
    * of the MinHash signatures in [[Dedup]].
    */
  class BottomK(k: Int) extends Aggregator[Long, List[Long], Array[Long]] {
    require(k > 0)

    override def zero: List[Long] = Nil

    override def reduce(b: List[Long], a: Long): List[Long] =
      if (b.contains(a)) b
      else if (b.size < k) a :: b
      else {
        val worst = b.max
        if (a < worst) a :: b.filterNot(_ == worst) else b
      }

    override def merge(b1: List[Long], b2: List[Long]): List[Long] =
      (b1 ++ b2).distinct.sorted.take(k)

    override def finish(reduction: List[Long]): Array[Long] =
      reduction.sorted.toArray

    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()

    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Distinct-count estimate from a KMV state (hash domain 2^60). */
  def kmvEstimate(bottom: Array[Long], k: Int): Double =
    if (bottom.length < k) bottom.length.toDouble
    else (k - 1).toDouble * math.pow(2.0, 60) / bottom.last.toDouble
}
