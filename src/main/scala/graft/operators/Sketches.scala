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

  /** Count-min sketch over pre-hashed keys: `depth` rows of `width`
    * counters; row j buckets a key by the j-th [[Dedup.perms]]
    * permutation of its hash. Counters merge by elementwise addition,
    * so partials combine map-side and only depth×width longs travel
    * per partition — frequency estimation for heavy-hitter mining at
    * stream scale (estimate = min over rows; never under, over by
    * ≤ ~2·N/width with high probability).
    *
    * Input MUST be a hash already reduced mod [[Dedup.P]] (e.g.
    * `pmod(hash60(key), P)`) so the permutation arithmetic cannot
    * overflow int64 — the same contract the MinHash pipeline uses.
    */
  class CountMin(depth: Int, width: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(depth > 0 && depth <= Dedup.perms.length && width > 1)

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var j = 0
      while (j < depth) {
        val (a, c) = Dedup.perms(j)
        b(j * width + (((a * h + c) % Dedup.P) % width).toInt) += 1
        j += 1
      }
      b
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def finish(reduction: Array[Long]): Array[Long] = reduction

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Point-frequency estimate from a CountMin state, as a pure
    * Catalyst expression (same cell arithmetic as the aggregator).
    * `h` must be the same mod-P hash the sketch was built from.
    */
  def cmsEstimate(cms: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
      depth: Int, width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    least((0 until depth).map { j =>
      val (a, c) = Dedup.perms(j)
      element_at(cms,
        (lit(j * width) + pmod(pmod(lit(a) * h + lit(c), lit(Dedup.P)), lit(width))).cast("int") + 1)
    }: _*)
  }
}
