package graft.streaming

import graft.SparkSpec
import graft.ml.WindowZScoreDetector
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class SEv(sid: String, timestamp: Timestamp, v: Double)

class StatefulWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 1000L)

  /** Two interleaved series with occasional spikes. */
  private lazy val rows = {
    val rng = new scala.util.Random(23)
    (0 until 300).flatMap { i =>
      Seq(
        SEv("a", ts(i), 10.0 + rng.nextGaussian() +
          (if (i % 37 == 5) 40.0 else 0.0)),
        SEv("b", ts(i), 100.0 + 5 * rng.nextGaussian() +
          (if (i % 41 == 9) 200.0 else 0.0)))
    }
  }

  test("stateful stream scoring == batch window detector, across batch cuts") {
    val static = rows.toDF()
    val L = 10
    val det = WindowZScoreDetector(Seq("v"), tsCol = "timestamp",
      seriesCol = Some("sid"), L = L, percentile = 0.98)
    val fitted = det.fit(static)
    val threshold = fitted.asInstanceOf[graft.ml.FittedWindowZScore].threshold

    val batchOut = fitted.transform(static)
      .select($"sid", ($"timestamp".cast("double") * 1000000.0).cast("long"),
        $"anomaly_score", $"is_anomaly")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))), r.getBoolean(3)))
      .toMap

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SEv]
    val scored = StatefulWindow.score(mem.toDF(), Seq("v"), "sid",
      "timestamp", L, threshold)
    val q = scored.writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    // three uneven batch cuts, worst case for window continuity
    mem.addData(rows.take(130): _*); q.processAllAvailable()
    mem.addData(rows.slice(130, 131): _*); q.processAllAvailable() // 1-row batch
    mem.addData(rows.drop(131): _*); q.processAllAvailable()
    q.stop()

    val streamOut = spark.table("sw_out")
      .as[StatefulWindow.Scored].collect()
      .map(s => (s.series, s.tsMicros) -> ((s.anomaly_score, s.is_anomaly)))
      .toMap
    assert(streamOut.size == 600)

    var flaggedBatch = 0; var flaggedStream = 0
    batchOut.foreach { case (k, (bScore, bFlag)) =>
      val (sScore, sFlag) = streamOut(k)
      assert(bScore.isDefined == sScore.isDefined, s"warmup mismatch at $k")
      (bScore, sScore) match {
        case (Some(bs), Some(ss)) =>
          assert(math.abs(bs - ss) < 1e-6, s"$k: batch=$bs stream=$ss")
        case _ =>
      }
      assert(bFlag == sFlag, s"flag mismatch at $k")
      if (bFlag) flaggedBatch += 1
      if (sFlag) flaggedStream += 1
    }
    assert(flaggedBatch > 5 && flaggedBatch == flaggedStream,
      s"batch=$flaggedBatch stream=$flaggedStream")
  }
}
