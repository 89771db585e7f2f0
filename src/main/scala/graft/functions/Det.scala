package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, partition-invariant pseudo-randomness.
  *
  * The reference seeds one process-global RNG for its whole injection pass
  * (`Backend/Simulator/AnomalyInjector/anomalyinjector.py:20-22`) and draws in
  * row-iteration order — semantics that cannot be reproduced on a distributed
  * engine where partition order is not stable. We instead derive randomness
  * from a seed-keyed mixed LCG of a stable row id, which is (a) partition-,
  * retry- and scale-invariant on a cluster and (b) exactly reproducible in
  * plain INT64 SQL arithmetic, so the DuckDB oracle can run the identical
  * formula.
  *
  * Mixing design: a pure LCG is affine, so `frac(id, s1)` and `frac(id, s2)`
  * would differ by a CONSTANT offset mod 1 — draws under different seeds
  * (e.g. per-column injection selections) would be strongly correlated. The
  * seed is therefore spread through a multiplicative hash and XOR-folded into
  * the state between rounds, which breaks the affinity; measured joint
  * selection of `frac<0.5` under adjacent seeds is ~25% (independent) vs
  * ~45% for the additive variant.
  *
  * All intermediates stay below 2^63 (h < 2^31, h·A < 2.4e18); seeds must
  * stay below ~3.4e9 so seed·K fits (ours are small constants).
  */
object Det {
  val A = 1103515245L // glibc LCG multiplier
  val C = 12345L
  val M = 2147483648L // 2^31
  val K = 2654435761L // Knuth multiplicative hash (odd)

  /** Uniform [0,1) from an integer id column + seed; two XOR-keyed rounds. */
  def frac(id: Column, seed: Long): Column = {
    val sm = (seed * K + C) % M
    val h0 = (id % M).bitwiseXOR(lit(sm))
    val r1 = (h0 * A + C) % M
    val h1 = r1.bitwiseXOR(lit(sm))
    val r2 = (h1 * A + C) % M
    r2.cast("double") / lit(M.toDouble)
  }

  /** SQL twin of [[frac]] — same arithmetic, runnable by the DuckDB oracle. */
  def fracSql(id: String, seed: Long): String = {
    val sm = (seed * K + C) % M
    val h0 = s"xor(($id) % $M, $sm)"
    val r1 = s"(($h0 * $A + $C) % $M)"
    val h1 = s"xor($r1, $sm)"
    val r2 = s"(($h1 * $A + $C) % $M)"
    s"(CAST($r2 AS DOUBLE) / $M)"
  }

  /** Host-side twin of [[frac]] (for plan constants and tests). */
  def fracHost(id: Long, seed: Long): Double = {
    val sm = (seed * K + C) % M
    val h0 = (id % M) ^ sm
    val r1 = (h0 * A + C) % M
    val h1 = r1 ^ sm
    val r2 = (h1 * A + C) % M
    r2.toDouble / M
  }

  /** Stable single-column row id for lineitem from (orderkey, linenumber).
    * NOTE: only as unique as the underlying key — the synthetic testdata
    * repeats ~24% of (orderkey, linenumber) pairs, so colliding rows draw
    * identical randomness and are selected together. That keeps every
    * engine/partitioning consistent (which is the contract); true row-unique
    * ids would need a `row_number` over a total order. */
  def lineitemId(orderkey: Column, linenumber: Column): Column =
    orderkey * 10L + linenumber
  def lineitemIdSql: String = "(l_orderkey * 10 + l_linenumber)"

  /** Truncated-seconds epoch of a timestamp column — identical in Spark
    * (`cast(ts as long)`) and DuckDB (`floor(epoch(ts))`), immune to the
    * parquet ns-vs-us timestamp precision difference between engines. */
  def epochS(ts: Column): Column = ts.cast("long")
  def epochSSql(ts: String): String = s"CAST(floor(epoch($ts)) AS BIGINT)"

  /** Exact BIGINT floor division (`Math.floorDiv` semantics) for both
    * engines: Spark's `div` and DuckDB's `//` BOTH truncate toward zero,
    * so a negative quotient with a remainder needs the −1 correction.
    * Using this instead of `floor(CAST(s AS DOUBLE)/n)` keeps integer
    * pipelines exact with no reliance on double-quotient rounding. */
  def floorDivSparkSql(s: String, n: String): String =
    s"(CASE WHEN ($s) >= 0 OR ($s) % ($n) = 0 THEN ($s) div ($n) " +
      s"ELSE (($s) div ($n)) - 1 END)"
  def floorDivDuckSql(s: String, n: String): String =
    s"((($s) // ($n)) - (CASE WHEN ($s) < 0 AND ($s) % ($n) <> 0 " +
      s"THEN 1 ELSE 0 END))"
}
