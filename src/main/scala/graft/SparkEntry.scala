package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query packs live under [[graft.queries]]; each pack pairs every Spark
  * query with an exact DuckDB oracle. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Regional revenue: 4-way broadcast join + exact-cents aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Inject.queries ++
      graft.queries.TextDedup.queries ++ graft.queries.Embed.queries ++
      graft.queries.Core2.queries ++ graft.queries.Lifecycle.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Mm.queries ++
      graft.queries.Analytics.queries ++ graft.queries.Stats.queries ++
      graft.queries.Stats2.queries ++ graft.queries.Stats3.queries ++
      graft.queries.Curate.queries ++ graft.queries.Survival.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++ graft.queries.Inject.oracles ++
      graft.queries.TextDedup.oracles ++ graft.queries.Embed.oracles ++
      graft.queries.Core2.oracles ++ graft.queries.Lifecycle.oracles ++
      graft.queries.Pipeline.oracles ++ graft.queries.Mm.oracles ++
      graft.queries.Analytics.oracles ++ graft.queries.Stats.oracles ++
      graft.queries.Stats2.oracles ++ graft.queries.Stats3.oracles ++
      graft.queries.Curate.oracles ++ graft.queries.Survival.oracles
}
