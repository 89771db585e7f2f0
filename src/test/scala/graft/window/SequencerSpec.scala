package graft.window

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SequencerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d")

  test("W1 sequences: N-L+1 windows per series, each of length L, ordered") {
    val df = (0 until 8).map(i => ("a", ts(i), i.toDouble)).toDF("sid", "ts", "x")
    val seqs = Sequencer.sequences(df, Some("sid"), "ts", Seq("x"), L = 3)
      .select($"sequence").as[Seq[Seq[Double]]].collect()
    assert(seqs.length == 6) // 8 - 3 + 1
    assert(seqs.forall(_.length == 3))
    // each window is [i-2, i-1, i]
    assert(seqs.map(_.map(_.head)).toSet ==
      (2 until 8).map(i => Seq(i - 2.0, i - 1.0, i.toDouble)).toSet)
  }

  test("W1 warm-up: series shorter than L yields no sequences (W6)") {
    val df = (0 until 2).map(i => ("a", ts(i), i.toDouble)).toDF("sid", "ts", "x")
    assert(Sequencer.sequences(df, Some("sid"), "ts", Seq("x"), 3).count() == 0)
  }

  test("W1 multi-series independence") {
    val df = ((0 until 5).map(i => ("a", ts(i), i.toDouble)) ++
      (0 until 4).map(i => ("b", ts(i), 100.0 + i))).toDF("sid", "ts", "x")
    val counts = Sequencer.sequences(df, Some("sid"), "ts", Seq("x"), 3)
      .groupBy($"sid").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 3L, "b" -> 2L))
  }

  test("single-series (None) paths are blocked yet equal to the global window") {
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val df = (0 until 237)
        .map(i => (new Timestamp(base + i * 1000L), i.toLong, math.sin(i)))
        .toDF("ts", "id", "x")
      val asOne = df.withColumn("sid", lit("g"))
      val flatS = Sequencer.flattenWindows(asOne, Some("sid"), "ts",
        Seq("x"), 4, Seq($"id")).drop("sid")
      val flatN = Sequencer.flattenWindows(df, None, "ts",
        Seq("x"), 4, Seq($"id"))
      assert(flatN.orderBy($"id").collect().toSeq ==
        flatS.orderBy($"id").collect().toSeq)
      // the data-sized window is partitioned by the derived block key —
      // not the old one-task Window.partitionBy() fallback
      assert(flatN.queryExecution.executedPlan.toString.contains("__blk"))
      val seqS = Sequencer.sequences(asOne, Some("sid"), "ts",
        Seq("x"), 4, Seq($"id")).drop("sid")
      val seqN = Sequencer.sequences(df, None, "ts", Seq("x"), 4, Seq($"id"))
      assert(seqN.orderBy($"id").collect().toSeq ==
        seqS.orderBy($"id").collect().toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "2")
  }

  test("W3 temporal split: first 85% by time are train") {
    val df = (0 until 40).map(i => (ts(i), i)).toDF("ts", "i")
    val split = Sequencer.temporalSplit(df, Seq($"ts"), 0.85)
      .select($"i", $"split").as[(Int, String)].collect().toMap
    (0 until 34).foreach(i => assert(split(i) == "train")) // floor(40*.85)=34
    (34 until 40).foreach(i => assert(split(i) == "test"))
  }

  test("W5 balanced tail: both classes can fill → n/2 each, most recent") {
    val df = ((0 until 100).map(i => (ts(i % 60), i.toLong, 0)) ++
      (100 until 200).map(i => (ts(i % 60), i.toLong, 1)))
      .toDF("ts", "id", "label")
    val got = Sequencer.balancedTail(df, "label", Seq($"ts".desc, $"id".desc), 40L)
    val byClass = got.groupBy($"label").count().as[(Int, Long)].collect().toMap
    assert(byClass == Map(0 -> 20L, 1 -> 20L))
  }

  test("W5 balanced tail: scarce anomaly class redistributes to majority") {
    // 5 anomalies, 100 normals, n=40 → all 5 anomalies + 35 normals
    val df = ((0 until 100).map(i => (ts(i % 60), i.toLong, 0)) ++
      (100 until 105).map(i => (ts(i % 60), i.toLong, 1)))
      .toDF("ts", "id", "label")
    val got = Sequencer.balancedTail(df, "label", Seq($"ts".desc, $"id".desc), 40L)
    val byClass = got.groupBy($"label").count().as[(Int, Long)].collect().toMap
    assert(byClass == Map(0 -> 35L, 1 -> 5L), s"got $byClass")
  }

  test("W5 balanced tail: n larger than data returns everything") {
    val df = ((0 until 6).map(i => (ts(i), i.toLong, 0)) ++
      (6 until 10).map(i => (ts(i), i.toLong, 1))).toDF("ts", "id", "label")
    val got = Sequencer.balancedTail(df, "label", Seq($"ts".desc, $"id".desc), 100L)
    assert(got.count() == 10)
  }
}
