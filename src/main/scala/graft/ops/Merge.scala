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

  /** Stage a table for FILE-PRUNED merges: partition by
    * `__mbucket = pmod(hash(id), nBuckets)` so [[mergeFlagsPruned]] can
    * rewrite only the buckets that contain predicted ids. Murmur3 `hash`
    * is deterministic across sessions and partitionings, so the same id
    * always lands in the same bucket directory. */
  def writeMergeTable(df: DataFrame, table: String, idCol: String = "id",
                      nBuckets: Int = 64): Unit =
    df.withColumn("__mbucket", pmod(hash(col(idCol)), lit(nBuckets)))
      .write.mode("overwrite").format("parquet")
      .partitionBy("__mbucket").saveAsTable(table)

  /** [[mergeFlags]] for a [[writeMergeTable]]-staged table, but touching
    * only the partitions whose buckets contain predicted ids: the scan is
    * partition-pruned to those buckets and the write uses DYNAMIC partition
    * overwrite, so a merge of m ids costs O(m/nBuckets) of the table in IO
    * instead of a full rewrite — the plain-parquet equivalent of a
    * MERGE-capable format's matched-file rewrite. At 100 TB with 10k
    * buckets, flagging one detection run's ids rewrites only the handful
    * of buckets they hash into. */
  def mergeFlagsPruned(spark: SparkSession, table: String, predIds: DataFrame,
                       idCol: String = "id", flagCol: String = "is_anomaly",
                       nBuckets: Int = 64): Long = {
    import spark.implicits._
    val preds = predIds.toDF("__pid").distinct()
      .withColumn("__mbucket", pmod(hash(col("__pid")), lit(nBuckets)))
    val buckets = preds.select("__mbucket").distinct().as[Int].collect().sorted
    val touched = spark.table(table)
      .filter(col("__mbucket").isInCollection(buckets.toSeq))
    val merged = touched
      .join(broadcast(preds.select("__pid")), col(idCol) === col("__pid"), "left")
      .withColumn(flagCol,
        coalesce(col(flagCol), lit(false)) || col("__pid").isNotNull)
      .drop("__pid")
      .localCheckpoint()

    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      // insertInto matches positionally: align to the table's column order
      // (data columns first, partition column last)
      val cols = spark.table(table).columns.map(col)
      merged.select(cols.toIndexedSeq: _*)
        .write.mode("overwrite").insertInto(table)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    spark.table(table).filter(col(flagCol)).count()
  }
}
