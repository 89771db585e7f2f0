package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style flag write-back (S10/J2; reference: per-PK `UPDATE` loop,
  * `Database/timescaledb_api.py:238-274` — O(n) round-trips).
  *
  * Plain-parquet tables have no transactional MERGE, so the operator is a
  * join-overwrite: one broadcast-able left join against the (small)
  * prediction key set, one rewrite of the table. At warehouse scale the
  * same call lands on a format with real MERGE (Delta/Iceberg) and rewrites
  * only matched files; the API is the stable part.
  *
  * The write goes through a staging table to avoid reading and overwriting
  * the same files in one job (Spark refuses self-overwrite). */
object Merge {

  /** Set `flagCol = true` for rows of `table` whose `idCol` appears in
    * `predIds` (a 1-column frame of ids); all other rows keep their value.
    * Returns the number of rows flagged true after the merge. */
  def mergeFlags(spark: SparkSession, table: String, predIds: DataFrame,
                 idCol: String = "id", flagCol: String = "is_anomaly"): Long = {
    val preds = predIds.toDF("__pid").distinct()
    val merged = spark.table(table)
      .join(broadcast(preds), col(idCol) === col("__pid"), "left")
      .withColumn(flagCol, col(flagCol) || col("__pid").isNotNull)
      .drop("__pid")

    val staging = table + "__merge_staging"
    merged.write.mode("overwrite").format("parquet").saveAsTable(staging)
    spark.table(staging).write.mode("overwrite").format("parquet")
      .saveAsTable(table)
    spark.sql(s"DROP TABLE $staging")
    spark.table(table).filter(col(flagCol)).count()
  }
}
