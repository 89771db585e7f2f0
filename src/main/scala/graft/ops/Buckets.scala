package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Hot-bucket guard for pair-generation self-joins.
  *
  * Every LSH-style candidate generator (minhash bands, simhash chunks,
  * hyperplane buckets) self-joins on a bucket key, which is quadratic in
  * the largest bucket: ONE degenerate value — empty docs, boilerplate
  * sharing a signature — turns a 100 TB run into a runaway task emitting
  * B² pairs. Salting would spread that work but not shrink it, so the
  * guard SKIPS over-cap buckets instead: such buckets are (a) pathological
  * for near-dup semantics (a million-member "bucket" is exact-dup land —
  * handle it with hash dedup first) and (b) unpayable at B² no matter the
  * partitioning.
  *
  * Cost: one `count(*) OVER (PARTITION BY bucket)` — its shuffle lands the
  * data exactly where the self-join needs it (hash on the bucket key), so
  * the exchange is reused and the guard adds no extra data movement.
  * Counting a hot bucket is linear (one task scans it), which is the price
  * of knowing it must be skipped.
  *
  * Accounting: dropped-row and max-bucket metrics ride the SAME job via
  * `Dataset.observe` (no second scan) and are logged by a per-session
  * [[QueryExecutionListener]]; [[overCap]] gives the skipped buckets as a
  * frame for auditing.
  */
object Buckets {

  /** Default membership cap: at B members a bucket contributes B·(B−1)/2
    * candidate pairs; 5000 ⇒ ≤ ~12.5M pairs per bucket, a bounded task. */
  val DefaultCap = 5000

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val listenerRegistered =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Log observed `graft_bucket_cap_*` metrics once per completed action. */
  private def ensureListener(spark: SparkSession): Unit =
    listenerRegistered.computeIfAbsent(
      String.valueOf(System.identityHashCode(spark)), _ => {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_bucket_cap_")) {
              val dropped = row.getAs[Long]("dropped_rows")
              if (dropped > 0)
                log.warn(s"$name: skipped $dropped membership rows in " +
                  s"over-cap buckets (largest bucket: ${row.getAs[Long]("max_bucket")})")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
      java.lang.Boolean.TRUE
    })

  /** Drop all rows belonging to buckets with more than `cap` members.
    * `label` names the observed metric (must be unique within a query). */
  def capMembers(members: DataFrame, bucketCols: Seq[Column],
                 cap: Int = DefaultCap, label: String = "pairs"): DataFrame = {
    ensureListener(members.sparkSession)
    val w = Window.partitionBy(bucketCols: _*)
    members.withColumn("__bsz", count(lit(1)).over(w))
      .observe(s"graft_bucket_cap_$label",
        sum(when(col("__bsz") > cap, 1L).otherwise(0L)).as("dropped_rows"),
        coalesce(max(col("__bsz")), lit(0L)).as("max_bucket"))
      .filter(col("__bsz") <= cap)
      .drop("__bsz")
  }

  /** The skipped buckets as data: (bucketCols..., bucket_size) for every
    * bucket over `cap` — the audit twin of [[capMembers]]. */
  def overCap(members: DataFrame, bucketCols: Seq[Column],
              cap: Int = DefaultCap): DataFrame =
    members.groupBy(bucketCols: _*)
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > cap)

  /** Drop accounting as a QUERYABLE one-row frame — the data twin of
    * [[capMembers]]' observed metrics, so a 100 TB run can gate/alert on
    * candidate-recall loss (`dropped_rows / member_rows`) in the same
    * engine instead of scraping logs. `dropped_rows` counts membership
    * rows in over-cap buckets, exactly what [[capMembers]] would drop.
    * Cost: one groupBy on the bucket key + a scalar agg over the (much
    * smaller) bucket-size frame. Oracle-gated by `d18_cap_report`. */
  def capReport(members: DataFrame, bucketCols: Seq[Column],
                cap: Int = DefaultCap): DataFrame =
    members.groupBy(bucketCols: _*)
      .agg(count(lit(1)).as("__bsz"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("__bsz") > cap, 1L).otherwise(0L)).as("over_cap_buckets"),
        sum(col("__bsz")).as("member_rows"),
        sum(when(col("__bsz") > cap, col("__bsz")).otherwise(0L))
          .as("dropped_rows"),
        coalesce(max(col("__bsz")), lit(0L)).as("max_bucket"))
}
