package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed job tables join without a shuffle exchange") {
    val df = (0L until 5000L).map(i => (i, i * 2.0)).toDF("id", "v")
    Ingest.writeJobTableBucketed(df, "bt_a", nBuckets = 8)
    Ingest.writeJobTableBucketed(
      df.select($"id", ($"v" * 10).as("w")), "bt_b", nBuckets = 8)

    val joined = spark.table("bt_a").join(spark.table("bt_b"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    // co-bucketed join: sort-merge with NO Exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle:\n$plan")
    assert(joined.count() == 5000)

    // sanity: the same join on unbucketed tables DOES shuffle
    df.write.mode("overwrite").format("parquet").saveAsTable("bt_plain")
    val plainPlan = spark.table("bt_plain")
      .join(spark.table("bt_plain").select($"id", $"v".as("w2")), "id")
      .queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange") || plainPlan.contains("Broadcast"))

    Seq("bt_a", "bt_b", "bt_plain").foreach(t => spark.sql(s"DROP TABLE $t"))
  }
}
