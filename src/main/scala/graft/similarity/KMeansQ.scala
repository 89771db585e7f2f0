package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.DotExpr

/** Integer fixed-point Lloyd k-means over an embedding column — the
  * clustering primitive of large-scale data curation (cluster-balanced
  * sampling, SemDeDup cells, topic bucketing). Reference capability:
  * TedBoman/EXACT wraps sklearn estimators per model
  * (`Backend/ML_models/`); this is the same "fit a partition of the
  * corpus" capability re-expressed as a distributed fixed-point
  * iteration.
  *
  * Exactness contract (the PageRank/HLL recipe): vectors are quantized
  * ONCE to integer micro-units stored as integer-VALUED doubles
  * (`round(x·1e6)` per element). Every distance and every update sum is
  * then exact integer arithmetic carried in doubles — assignment
  * tie-breaks on the lower cluster id, centroid updates floor-divide
  * integer sums — so the whole iteration is bit-reproducible under any
  * partitioning AND expressible verbatim in the DuckDB oracle.
  *
  * 100 TB shape per iteration: assignment is one codegen'd map pass (k
  * native [[DotExpr]] kernels per row against broadcast literal
  * centroids — no join, no shuffle); the update is `posexplode` →
  * `groupBy(cluster, dim)` whose map-side partial aggregation collapses
  * every task to ≤ k·d rows before the (tiny) shuffle; the k·d sum table
  * is a bounded driver artifact (same contract as the IVF codebook).
  *
  * Exactness bounds: |q_i| ≤ Q ⇒ distances ≤ d·(2Q)² and per-
  * (cluster,dim) sums ≤ n·Q, both of which must stay < 2^53 for the
  * double-carried integers to be exact — at Q = 1e6 that is n ≲ 9e9 rows
  * per update shard; beyond that, shard the update by cluster.
  */
object KMeansQ {

  /** One Lloyd state: centroids as k rows of d integer components. */
  type Centroids = Array[Array[Long]]

  /** `iters` full Lloyd steps (assign → update) from `init`. `qCol` must
    * be integer-valued `array<double>` (see [[quantize]]). Returns the
    * final assignment frame (`idCol`, `cluster`) and the final
    * centroids; empty clusters keep their previous centroid. */
  def lloyd(vecs: DataFrame, idCol: String, qCol: String, k: Int,
            iters: Int, init: Centroids): (DataFrame, Centroids) = {
    require(init.length == k, s"init has ${init.length} centroids, want $k")
    var cents = init
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(vecs, qCol, cents)
      cents = update(assigned, qCol, cents)
    }
    (assigned.select(col(idCol), col("cluster")), cents)
  }

  /** Nearest-centroid id appended as `cluster` (squared-L2, ties → lower
    * cluster id). dist²(q, c) = q·q − 2·q·c + c·c with q·q one native
    * kernel per row and c·c a plan-time literal — all exact integers in
    * double arithmetic. */
  def assign(vecs: DataFrame, qCol: String, cents: Centroids): DataFrame = {
    val qd = col(qCol)
    val qq = DotExpr.dot(qd, qd)
    val picks = cents.zipWithIndex.map { case (c, j) =>
      val cc = c.map(v => v.toDouble * v.toDouble).sum
      val qc = DotExpr.dot(qd, lit(c.map(_.toDouble)))
      struct((qq - lit(2.0) * qc + lit(cc)).as("d"), lit(j).as("j"))
    }
    // `least` rejects a single argument (k = 1: everything is cluster 0)
    val pick = if (picks.length == 1) picks.head else least(picks: _*)
    vecs.withColumn("cluster", pick("j"))
  }

  /** Per-(cluster, dim) integer sums + counts → floor-divided means.
    * The k·d aggregate is collected (bounded, codebook-sized); empty
    * clusters keep `prev`. */
  private def update(assigned: DataFrame, qCol: String,
                     prev: Centroids): Centroids = {
    val rows = assigned
      .select(col("cluster"), posexplode(col(qCol)).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect()
    val next = prev.map(_.clone())
    rows.foreach { r =>
      // the double sum is an exact integer (< 2^53 by the header bound);
      // the DuckDB twin uses the SAME exact BIGINT floor division
      // (`s // n` with a negative-remainder correction — DuckDB's `//`
      // truncates toward zero while floorDiv floors), so the two engines
      // agree bit-for-bit with no reliance on double-quotient rounding
      next(r.getInt(0))(r.getInt(1)) =
        Math.floorDiv(r.getDouble(2).toLong, r.getLong(3))
    }
    next
  }

  /** Quantize a float/double array column to integer micro-units held as
    * doubles (`round(x·scale)` per element, HALF_UP in both engines). */
  def quantize(vec: Column, scale: Double): Column =
    transform(vec, x => round(x.cast("double") * scale))
}
