package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under a scale-factor dir.
  * At cluster scale these would be catalog tables partitioned on their
  * natural key; reads stay pushdown-friendly either way. */
object Tables {
  /** The `events` table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 refuses natively. We read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a microsecond
    * `TimestampType` via integer division (`div`, not `/` — a ns epoch is
    * ~1.7e18, beyond double's 2^53 exact range). Sub-microsecond order is
    * irrelevant here: event gaps are seconds. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // keep the raw ns column: predicates on `ts_ns` reference the
        // physical parquet column and PUSH DOWN to the scan (row-group
        // min/max pruning); predicates on the derived `ts` cannot
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
