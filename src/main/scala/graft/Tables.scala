package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table access for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under a scale-factor dir.
  * At cluster scale these would be catalog tables partitioned on their
  * natural key; reads stay pushdown-friendly either way. */
object Tables {
  /** The `events` table's `ts` column has shipped in two physical layouts
    * across driver testdata generations; both are normalized here so
    * every query sees the same three columns:
    *
    *   - `ts`    session-zone `TimestampType` (µs) — the API column
    *   - `ts_ns` epoch nanoseconds as `LongType` — exact integer
    *             arithmetic for oracles (integer `div`, never `/`: a ns
    *             epoch is ~1.7e18, beyond double's 2^53 exact range)
    *   - `ts_ntz`/raw — an alias of the PHYSICAL column, for predicates
    *             that must reach the parquet scan (row-group min/max
    *             pruning); predicates on the derived columns cannot push
    *
    * Layout A (TIMESTAMP(NANOS) parquet): Spark 4 refuses nanos natively,
    * so we read them as long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * rebuild `ts`; the raw pushdown column IS `ts_ns`. Layout B
    * (TIMESTAMP(MICROS), no UTC flag → `TimestampNTZType`): NTZ cannot
    * cast to BIGINT directly, so `ts` bridges via `cast("timestamp")`
    * (session is pinned UTC — wall-clock equals the instant, matching
    * DuckDB's naive `epoch()`), `ts_ns` = `unix_micros·1000`, and the raw
    * NTZ column survives as `ts_ntz`. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts_ntz", col("ts"))
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ => df
    }
  }
}
