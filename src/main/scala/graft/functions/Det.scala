package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, partition-invariant pseudo-randomness.
  *
  * The reference seeds one process-global RNG for its whole injection pass
  * (`Backend/Simulator/AnomalyInjector/anomalyinjector.py:20-22`) and draws in
  * row-iteration order — semantics that cannot be reproduced on a distributed
  * engine where partition order is not stable. We instead derive randomness
  * from a keyed LCG hash of a stable row id, which is (a) partition-, retry-
  * and scale-invariant on a cluster and (b) exactly reproducible in plain
  * INT64 SQL arithmetic, so the DuckDB oracle can run the identical formula.
  *
  * All intermediates stay below 2^63: (2^31 + seed) * A < 2.4e18.
  */
object Det {
  val A = 1103515245L // glibc LCG multiplier
  val C = 12345L
  val M = 2147483648L // 2^31

  /** Uniform [0,1) from an integer id column + seed; two LCG rounds. */
  def frac(id: Column, seed: Long): Column = {
    val h0 = (id % M) + lit(seed % M)
    val r1 = (h0 * A + C) % M
    val r2 = (r1 * A + C) % M
    r2.cast("double") / lit(M.toDouble)
  }

  /** SQL twin of [[frac]] — same arithmetic, runnable by the DuckDB oracle. */
  def fracSql(id: String, seed: Long): String = {
    val h0 = s"(($id) % $M + ${seed % M})"
    val r1 = s"(($h0 * $A + $C) % $M)"
    val r2 = s"(($r1 * $A + $C) % $M)"
    s"(CAST($r2 AS DOUBLE) / $M)"
  }

  /** Stable single-column row id for lineitem (composite PK orderkey+line). */
  def lineitemId(orderkey: Column, linenumber: Column): Column =
    orderkey * 10L + linenumber
  def lineitemIdSql: String = "(l_orderkey * 10 + l_linenumber)"

  /** Truncated-seconds epoch of a timestamp column — identical in Spark
    * (`cast(ts as long)`) and DuckDB (`floor(epoch(ts))`), immune to the
    * parquet ns-vs-us timestamp precision difference between engines. */
  def epochS(ts: Column): Column = ts.cast("long")
  def epochSSql(ts: String): String = s"CAST(floor(epoch($ts)) AS BIGINT)"
}
