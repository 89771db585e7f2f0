package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(content: String): String = {
    val f = Files.createTempFile("graft_ingest", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("CSV ingest + full normalization (messy reference-style input)") {
    val path = writeCsv(
      """time,temp,pressure,anom,Unnamed: 0
        |1704067200,20.5,1.2,true,9
        |1704067260,21.0,1.3,false,9
        |1704067140,19.9,1.1,0,9
        |1704067320,22.1,,1.0,9
        |""".stripMargin)
    val raw = Ingest.readFile(spark, path)
    val norm = Ingest.normalize(raw, "time", Some("anom"))
    assert(norm.columns.toSeq ==
      Seq("timestamp", "temp", "pressure", "label", "id",
        "injected_anomaly", "is_anomaly"))
    val rows = norm.orderBy($"id").collect()
    assert(rows.length == 4)
    // sorted by coerced numeric-epoch timestamp: 19.9 row first
    assert(rows(0).getAs[Double]("temp") == 19.9)
    assert(rows.map(_.getAs[Int]("label")).toSeq == Seq(0, 1, 0, 1))
    assert(rows(3).isNullAt(rows(3).fieldIndex("pressure"))) // missing kept null
    assert(rows.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("string timestamps coerce; unparseable rows are dropped (P6)") {
    val path = writeCsv(
      """ts,v,label
        |2024-01-01 00:00:01,1.0,0
        |not-a-time,2.0,1
        |2024-01-01 00:00:03,3.0,0
        |""".stripMargin)
    val norm = Ingest.normalize(Ingest.readFile(spark, path), "ts", Some("label"))
    assert(norm.count() == 2)
    assert(norm.agg(min($"timestamp").cast("long")).head.getLong(0) == 1704067201L)
  }

  test("header probe reads column names only") {
    val path = writeCsv("a,b,c\n1,2,3\n")
    assert(Ingest.columns(spark, path) == Seq("a", "b", "c"))
  }

  test("unsupported extension fails fast (S4 dispatch)") {
    intercept[IllegalArgumentException] {
      Ingest.readFile(spark, "/tmp/nope.xlsx")
    }
  }

  test("ORC round-trips through the dispatch (S4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/t.orc"
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
      .write.mode("overwrite").orc(dir)
    val back = Ingest.readFile(spark, dir)
    assert(back.orderBy($"id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }
}
