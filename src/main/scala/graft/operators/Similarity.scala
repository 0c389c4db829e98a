package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity search over embedding columns (SURVEY §2.6):
  * brute-force cosine top-k (baseline), IVF coarse quantization and
  * random-hyperplane LSH (the 100 TB paths — candidate cells/buckets
  * keep the pair space linear).
  *
  * Determinism: dot products are a *sequential* left fold in array
  * order (Spark `aggregate` ≡ DuckDB `list_reduce`), so the same
  * bits come out of both engines — float sums are order-dependent,
  * a parallel/grouped sum would not verify.
  */
object Similarity {

  /** Sequential-fold dot product, elements widened to double — the
    * codegen'd [[graft.plans.ArrayDot]] kernel (bit-identical to
    * `aggregate(zip_with(a, b, *), 0.0, +)`, which runs on the
    * interpreted HigherOrderFunction path and allocates the product
    * array per evaluation; the ANN family evaluates this n×k times).
    */
  def dot(a: Column, b: Column): Column = graft.plans.ArrayDot(a, b)

  /** DuckDB rendering of [[dot]] — identical fold order incl. the 0.0
    * seed (list_reduce alone would seed with element 1).
    */
  def dotSql(aRef: String, bRef: String, dim: Int): String =
    s"list_reduce(list_concat([CAST(0 AS DOUBLE)], " +
      s"list_transform(range(1, ${dim + 1}), i -> CAST($aRef[i] AS DOUBLE) * CAST($bRef[i] AS DOUBLE))), " +
      s"(x, y) -> x + y)"

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normSql(aRef: String, dim: Int): String = s"sqrt(${dotSql(aRef, aRef, dim)})"

  /** 8 random hyperplanes × 64 dims from a fixed LCG — literal
    * constants shared by the Spark plan and the SQL oracle.
    */
  val lshPlanes: Array[Array[Long]] = {
    var x = 42L
    Array.fill(8) {
      Array.fill(64) {
        x = (1103515245L * x + 12345L) % 2147483648L
        (x % 2001L) - 1000L
      }
    }
  }

  /** Sign-bit bucket id (0..255) of an embedding under [[lshPlanes]]. */
  def lshBucket(emb: Column): Column =
    lshPlanes.zipWithIndex.map { case (w, j) =>
      val plane = array(w.toIndexedSeq.map(v => lit(v)): _*)
      when(dot(emb, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(embRef: String, dim: Int): String =
    lshPlanes.zipWithIndex.map { case (w, j) =>
      val planeLit = w.mkString("[", ", ", "]")
      s"(CASE WHEN ${dotSql(embRef, planeLit, dim)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  // ---- int8 quantization (4× smaller vectors for the ANN index) ----
  //
  // Symmetric per-vector scheme: scale = max|x| / 127, code =
  // floor(x/scale + 0.5) ∈ [-127, 127]. floor(+0.5) instead of
  // round(): both engines floor identically, while round() half-away
  // vs half-even would desync the oracle.

  /** Per-vector quantization scale (max-abs / 127). The greatest()
    * floor keeps an all-zero vector from yielding scale 0 → 0/0 NaN
    * codes, where Spark's non-ANSI long cast (0) and DuckDB's
    * erroring cast would diverge; with the floor both engines emit
    * all-zero codes for it.
    */
  def qScale(emb: Column): Column =
    greatest(array_max(transform(emb, x => abs(x.cast("double")))), lit(1e-30)) / lit(127.0)

  def qScaleSql(embRef: String): String =
    s"greatest(list_max(list_transform($embRef, x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0"

  /** Int8 codes for an embedding under a given scale column. */
  def quantize(emb: Column, scale: Column): Column =
    transform(emb, x => floor(x.cast("double") / scale + lit(0.5)).cast("long"))

  def quantizeSql(embRef: String, scaleRef: String): String =
    s"list_transform($embRef, x -> CAST(floor(CAST(x AS DOUBLE) / $scaleRef + 0.5) AS BIGINT))"

  /** Dequantized (double) vector from codes + scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, v => v.cast("double") * scale)

  def dequantizeSql(codesRef: String, scaleRef: String): String =
    s"list_transform($codesRef, v -> CAST(v AS DOUBLE) * $scaleRef)"
}
