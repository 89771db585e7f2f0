package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class WEv(ts: Timestamp, user: String, v: Double)
case class DEv(ts: Timestamp, id: Long, v: Double)

/** T4 (absent in the reference, free in Spark): event-time tumbling-window
  * aggregation with a watermark — late data beyond the watermark is
  * dropped, windows finalize and emit in append mode. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(
    Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)

  test("watermarked tumbling count drops too-late events") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[WEv]
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"), $"user")
      .agg(count(lit(1)).as("cnt"))
      .select($"w.start".cast("long").as("w_start"), $"user", $"cnt")
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()

    // window [0,10): 2 events for a
    mem.addData(WEv(ts(1), "a", 1), WEv(ts(5), "a", 1))
    q.processAllAvailable()
    // advance event time far past the watermark → [0,10) finalizes
    mem.addData(WEv(ts(35), "a", 1))
    q.processAllAvailable()
    // this event is 30+ min late, beyond the 10-min watermark → dropped
    mem.addData(WEv(ts(2), "a", 99))
    q.processAllAvailable()
    // close the [30,40) window too
    mem.addData(WEv(ts(60), "b", 1))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wm_out")
      .select($"w_start", $"user", $"cnt").as[(Long, String, Long)]
      .collect().toSet
    val base = 1704067200L
    assert(out.contains((base, "a", 2L)), s"window[0,10) got $out")      // NOT 3
    assert(out.contains((base + 1800, "a", 1L)), s"window[30,40) got $out")
  }

  test("streaming dedup: duplicates dropped within watermark, state expires") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DEv]
    val q = StreamJob.dedupStream(mem.toDF(), "ts", Seq("id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    // first sighting passes; same-batch and next-batch re-deliveries drop
    mem.addData(DEv(ts(1), 1L, 10), DEv(ts(1), 1L, 10), DEv(ts(2), 2L, 20))
    q.processAllAvailable()
    mem.addData(DEv(ts(3), 1L, 10))
    q.processAllAvailable()
    // advance event time far past the horizon → id 1's state expires
    mem.addData(DEv(ts(60), 3L, 30))
    q.processAllAvailable()
    mem.addData(DEv(ts(55), 1L, 99)) // NOT a duplicate anymore: re-emitted
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out").groupBy($"id").count()
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L), s"got $got")
  }
}
