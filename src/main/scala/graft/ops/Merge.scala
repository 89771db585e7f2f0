package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style flag write-back (S10/J2; reference: per-PK `UPDATE` loop,
  * `Database/timescaledb_api.py:238-274` — O(n) round-trips).
  *
  * Plain-parquet tables have no transactional MERGE, so the operator is a
  * join-overwrite: one broadcast-able left join against the (small)
  * prediction key set, ONE rewrite of the table. Spark refuses to read and
  * overwrite the same files in one job, so the merged frame is first
  * materialized to executor-local storage (`localCheckpoint` — a shuffle-
  * write-sized cost) which severs the dependency on the source files; the
  * earlier staging-TABLE variant paid a second full table IO pass instead.
  * Crash window: a failure mid-overwrite leaves the target partial (one
  * window, was two) — at warehouse scale the same call lands on a format
  * with transactional MERGE (Delta/Iceberg) and rewrites only matched
  * files; the API is the stable part. */
object Merge {

  /** Set `flagCol = true` for rows of `table` whose `idCol` appears in
    * `predIds` (a 1-column frame of ids); all other rows keep their value
    * (NULL flags coerce to false, so unmatched NULL rows stay unflagged
    * rather than going NULL-true on a later merge).
    * Returns the number of rows flagged true after the merge. */
  def mergeFlags(spark: SparkSession, table: String, predIds: DataFrame,
                 idCol: String = "id", flagCol: String = "is_anomaly"): Long = {
    val preds = predIds.toDF("__pid").distinct()
    val merged = spark.table(table)
      .join(broadcast(preds), col(idCol) === col("__pid"), "left")
      .withColumn(flagCol,
        coalesce(col(flagCol), lit(false)) || col("__pid").isNotNull)
      .drop("__pid")
      .localCheckpoint()

    merged.write.mode("overwrite").format("parquet").saveAsTable(table)
    spark.table(table).filter(col(flagCol)).count()
  }
}
