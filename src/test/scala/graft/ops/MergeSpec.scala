package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeFlags: flags exactly the predicted ids, idempotent") {
    (0L until 100L).map(i => (i, s"r$i", false))
      .toDF("id", "payload", "is_anomaly")
      .write.mode("overwrite").format("parquet").saveAsTable("merge_t")

    val preds = Seq(3L, 7L, 7L, 42L).toDF("id") // dup in preds is fine
    val n = Merge.mergeFlags(spark, "merge_t", preds)
    assert(n == 3)
    val flagged = spark.table("merge_t").filter($"is_anomaly")
      .select($"id").as[Long].collect().toSet
    assert(flagged == Set(3L, 7L, 42L))
    // untouched rows keep payload + flag
    assert(spark.table("merge_t").filter(!$"is_anomaly").count() == 97)

    // second merge adds, never clears
    val n2 = Merge.mergeFlags(spark, "merge_t", Seq(42L, 99L).toDF("id"))
    assert(n2 == 4)
    spark.sql("DROP TABLE merge_t")
  }

  test("mergeFlagsPruned rewrites ONLY the buckets containing predicted ids") {
    val df = (0L until 200L).map(i => (i, s"r$i", false))
      .toDF("id", "payload", "is_anomaly")
    Merge.writeMergeTable(df, "merge_p", nBuckets = 8)

    // per-partition-directory file snapshot (name → length, mtime)
    val loc = new java.io.File(java.net.URI.create(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("merge_p")).location.toString))
    def snapshot(): Map[String, Set[(String, Long, Long)]] =
      loc.listFiles().filter(_.getName.startsWith("__mbucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
    val before = snapshot()

    val predIds = Seq(3L, 42L)
    val touchedBuckets = df.filter($"id".isin(predIds: _*))
      .select(pmod(hash($"id"), lit(8))).as[Int].collect().toSet
      .map((b: Int) => s"__mbucket=$b")

    val n = Merge.mergeFlagsPruned(spark, "merge_p", predIds.toDF("id"),
      nBuckets = 8)
    assert(n == 2)
    val flagged = spark.table("merge_p").filter($"is_anomaly")
      .select($"id").as[Long].collect().toSet
    assert(flagged == Set(3L, 42L))
    assert(spark.table("merge_p").count() == 200)

    val after = snapshot()
    // untouched bucket directories: byte-identical files, untouched mtimes
    (before.keySet -- touchedBuckets).foreach { dir =>
      assert(before(dir) == after(dir), s"$dir was rewritten")
    }
    // touched buckets really were rewritten
    touchedBuckets.foreach { dir =>
      assert(before(dir) != after(dir), s"$dir was NOT rewritten")
    }
    spark.sql("DROP TABLE merge_p")
  }

  test("mergeFlags: NULL flags coerce to false, not NULL (NULL OR false trap)") {
    Seq((1L, Some(true)), (2L, None), (3L, None))
      .toDF("id", "is_anomaly")
      .write.mode("overwrite").format("parquet").saveAsTable("merge_n")
    val n = Merge.mergeFlags(spark, "merge_n", Seq(3L).toDF("id"))
    assert(n == 2) // id 1 (pre-set) + id 3 (merged)
    // id 2 must come out literally false — a NULL would survive an OR false
    // and silently poison later filters
    val id2 = spark.table("merge_n").filter($"id" === 2).select($"is_anomaly")
      .collect()(0)
    assert(!id2.isNullAt(0) && !id2.getBoolean(0))
    spark.sql("DROP TABLE merge_n")
  }
}
