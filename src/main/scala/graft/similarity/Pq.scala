package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.DotExpr

/** Product quantization (Jégou et al. 2011) over quantized integer
  * vectors — the codebook-compressed ANN index format. The vector space
  * splits into `m` contiguous subspaces; each subspace has its own small
  * codebook, and an indexed row stores only `m` code ids (m bytes at
  * k' ≤ 256) — the [[IvfRq]] compression idea taken to its standard
  * per-subspace form. Search is asymmetric distance computation (ADC):
  * the query precomputes a (subspace × code) lookup table of exact
  * integer squared distances, candidates score as Σ_b LUT[b][code_b],
  * and only the approximate top `refine·k` rows are re-ranked exactly.
  *
  * Exactness contract (the [[KMeansQ]] recipe): inputs are integer-
  * valued `array<double>` micro-unit vectors, every encode/ADC distance
  * is an exact integer carried in doubles, and all argmins tie-break on
  * the lower code/id — bit-reproducible and SQL-unrollable.
  *
  * 100 TB shape: the codebook is a broadcast literal (m·k' rows), encode
  * is one map-only pass (m·k' fused 8-element [[DotExpr]] kernels per
  * row), the LUT is |Q|·m·k' rows broadcast to the exploded code lists,
  * and ADC aggregates on (query, candidate) — index rows never carry
  * floats.
  */
object Pq {

  /** codebooks(b)(c) = integer sub-vector of subspace b, code c. */
  case class Index(codebooks: Array[Array[Array[Long]]]) {
    val m: Int = codebooks.length
    val subDim: Int = codebooks.head.head.length

    /** Per-subspace nearest-code ids appended as `codes: array<int>`.
      * `qCol` must be integer-valued `array<double>` of length m·subDim. */
    def encode(df: DataFrame, qCol: String): DataFrame = {
      val codeCols = (0 until m).map { b =>
        val sub = slice(col(qCol), b * subDim + 1, subDim)
        val ss = DotExpr.dot(sub, sub)
        val picks = codebooks(b).zipWithIndex.map { case (cw, c) =>
          val cc = cw.map(v => v.toDouble * v.toDouble).sum
          struct((ss - lit(2.0) * DotExpr.dot(sub,
            lit(cw.map(_.toDouble))) + lit(cc)).as("d"), lit(c).as("c"))
        }
        least(picks: _*)("c")
      }
      df.withColumn("codes", array(codeCols: _*))
    }

    /** Exact-integer ADC lookup table for a (small) query frame: one row
      * per (query id, subspace, code). */
    def lut(queries: DataFrame, queryId: String, qCol: String): DataFrame = {
      val spark = queries.sparkSession
      import spark.implicits._
      val cb = codebooks.zipWithIndex.flatMap { case (cs, b) =>
        cs.zipWithIndex.map { case (cw, c) => (b, c, cw.toSeq) }
      }.toSeq.toDF("b", "c", "cw")
      queries.crossJoin(broadcast(cb))
        .select(col(queryId), col("b"), col("c"), {
          val sub = slice(col(qCol), col("b") * subDim + 1, lit(subDim))
          val cwd = transform(col("cw"), x => x.cast("double"))
          (DotExpr.dot(sub, sub) - lit(2.0) * DotExpr.dot(sub, cwd) +
            DotExpr.dot(cwd, cwd)).as("ld")
        })
    }
  }

  /** Fixed codebook from designated corpus rows (the e6 fixed-quantizer
    * recipe: deterministic, training-free, shared verbatim with the SQL
    * twin): code c of subspace b = rows(c)'s sub-vector b. */
  def fixedIndex(rows: Array[Array[Long]], m: Int): Index = {
    val subDim = rows.head.length / m
    Index(Array.tabulate(m, rows.length) { (b, c) =>
      rows(c).slice(b * subDim, (b + 1) * subDim)
    })
  }
}
