package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for multi-dimensional data layout.
  *
  * The 100 TB problem this solves: parquet zone maps (per-row-group
  * min/max) prune scans on ONE leading sort column only. Sorting by
  * a Z-order key interleaves the bits of several columns, so rows
  * close in the key are close in EVERY interleaved dimension —
  * row-groups then carry tight min/max bounds on all of them, and a
  * selective predicate on any dimension skips most of the file (the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`). The key is
  * pure bit arithmetic — a codegen'd projection, no shuffle of its
  * own; the layout write is `repartitionByRange(z) +
  * sortWithinPartitions(z)`.
  *
  * Reference behavior: deva materializes query results into plain
  * row-order tables (`deva/core/sources.py` DBStream persistence)
  * and has no layout optimizer; this is the Spark-native scale path
  * for the same persisted-table serving.
  *
  * Bit-spread via the classic magic-mask doubling (each step doubles
  * the gap between occupied bits); everything is int64 `&`/`|`/`<<`
  * so the arithmetic renders identically in DuckDB for the oracle.
  */
object ZOrder {

  /** Masks for spreading 16 bits to even positions of 32 bits. */
  private val steps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `v` so bit i lands at position 2i. */
  def spread16(v: Column): Column =
    steps.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (acc, (sh, m)) =>
      (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two 16-bit dimensions: x in even bits,
    * y in odd bits.
    */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** DuckDB rendering of [[spread16]] (same masks, same order). */
  def spread16Sql(expr: String): String =
    steps.foldLeft(s"($expr & 65535)") { case (acc, (sh, m)) =>
      s"((($acc | ($acc << $sh)) & $m))"
    }

  /** DuckDB rendering of [[interleave16]]. */
  def interleave16Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"
}
