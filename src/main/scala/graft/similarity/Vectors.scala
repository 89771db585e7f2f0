package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Det

/** Embedding similarity primitives over `array<float>` columns (SURVEY
  * "similarity search" rows). Dot products are the native codegen'd
  * [[graft.expressions.DotExpr]] — no UDF, no interpreted higher-order
  * functions — with explicit cast-to-double so accumulation order and
  * precision are identical in the DuckDB oracle's sequential
  * `list_reduce` fold.
  *
  * Scale path: brute-force top-k is O(Q·N) per query batch and is the
  * correctness baseline; [[lshBucket]] gives the 100 TB path — a
  * random-hyperplane signature bucketing that turns ANN into an equi-join on
  * bucket id (shuffle on bucket, no cross product).
  */
object Vectors {

  /** Σ a_i · b_i with left-to-right double accumulation — the native
    * codegen'd [[graft.expressions.DotExpr]], bit-identical to (and ~50×
    * faster on pair hot paths than) the interpreted
    * `aggregate(zip_with(a, b, (x, y) => x.cast * y.cast), 0.0, _ + _)`
    * composition (DotExprSpec pins the parity, nulls and all). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotExpr.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Deterministic random-hyperplane LSH bucket (nBits ≤ 16): bit j is the
    * sign of Σ_d h_jd·v_d where h_jd ∈ {-1,+1} comes from the shared keyed
    * LCG ([[Det.frac]] of j·1024+d) — reproducible on any cluster and in SQL. */
  def lshBucket(vec: Column, dim: Int, nBits: Int, seed: Long): Column =
    (0 until nBits).map { j =>
      val proj = (0 until dim).map { d =>
        val sign = when(lit(hyperplaneSign(j, d, seed)) === 1, 1.0).otherwise(-1.0)
        element_at(vec, d + 1).cast("double") * sign
      }.reduce(_ + _)
      when(proj > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB twin of [[dot]]: same left-to-right double fold (`list_reduce`
    * is sequential; `0.0 + p1 == p1` bitwise), so cross-engine results are
    * bit-identical — no rounding tolerance needed anywhere downstream. */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(generate_series(1, $dim), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** DuckDB twin of [[cosine]]. */
  def cosineSql(a: String, b: String, dim: Int): String = {
    val d = s"(sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)}))"
    s"(CASE WHEN $d = 0.0 THEN 0.0 ELSE ${dotSql(a, b, dim)} / $d END)"
  }

  /** DuckDB twin of [[lshBucket]] — identical left-associated sum order, so
    * the projection doubles (and thus the sign bits) are bit-equal. */
  def lshBucketSql(vec: String, dim: Int, nBits: Int, seed: Long): String =
    (0 until nBits).map { j =>
      val proj = (0 until dim).map { d =>
        val s = if (hyperplaneSign(j, d, seed) == 1) "1.0" else "-1.0"
        s"CAST($vec[${d + 1}] AS DOUBLE) * $s"
      }.mkString("(", " + ", ")")
      s"(CASE WHEN $proj > 0.0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Host-side twin of the hyperplane sign (used to fold constants into the
    * plan and to generate the oracle SQL): LCG fraction of (seed, j·1024+d). */
  def hyperplaneSign(j: Int, d: Int, seed: Long): Int =
    if (Det.fracHost(j * 1024L + d, seed) < 0.5) -1 else 1
}
