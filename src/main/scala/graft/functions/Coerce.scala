package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar coercions + score transforms (SURVEY F5, F7).
  *
  * All are single codegen'd `CASE`/arithmetic expressions — no UDFs — with
  * exact SQL twins so the DuckDB oracle reproduces them bit-for-bit.
  */
object Coerce {

  /** F5 label normalization (reference
    * `Backend/Simulator/BatchImport/batchimport.py:249-276`): `'true'/'false'`
    * strings (case-insensitive), booleans rendered as strings, numeric
    * `1`/`1.0`/`0` → {0,1}; anything else → 0 (the reference's total-function
    * fallback). Input is a string column. */
  def labelNormalize(c: Column): Column =
    when(lower(trim(c)) === "true", 1)
      .when(lower(trim(c)) === "false", 0)
      .when(try_cast(trim(c), "double") === 1.0, 1)
      .when(try_cast(trim(c), "double") === 0.0, 0)
      .otherwise(0)

  /** ANSI-safe cast-or-null (mirrors SQL TRY_CAST). */
  private def try_cast(c: Column, to: String): Column =
    c.try_cast(org.apache.spark.sql.types.DataType.fromDDL(to))

  /** SQL twin of [[labelNormalize]] for the DuckDB oracle. */
  def labelNormalizeSql(c: String): String =
    s"""CASE WHEN lower(trim($c)) = 'true' THEN 1
       | WHEN lower(trim($c)) = 'false' THEN 0
       | WHEN TRY_CAST(trim($c) AS DOUBLE) = 1.0 THEN 1
       | WHEN TRY_CAST(trim($c) AS DOUBLE) = 0.0 THEN 0
       | ELSE 0 END""".stripMargin.replaceAll("\n", "")

  /** F7 sigmoid pseudo-probability (reference
    * `Backend/ML_models/lstm.py:361-388`): `1/(1+exp(-clip(z, ±500)))` with
    * `z = (score-thr)/scale`, `scale = thr/4` (reference convention). */
  def sigmoidProba(score: Column, thr: Double): Column = {
    val scale = thr / 4.0
    val z = (score - lit(thr)) / lit(scale)
    val clipped = greatest(least(z, lit(500.0)), lit(-500.0))
    lit(1.0) / (lit(1.0) + exp(-clipped))
  }

  /** SQL twin of [[sigmoidProba]]. */
  def sigmoidProbaSql(score: String, thr: Double): String = {
    val scale = thr / 4.0
    val z = s"(($score - $thr) / $scale)"
    s"(1.0 / (1.0 + exp(-greatest(least($z, 500.0), -500.0))))"
  }
}
