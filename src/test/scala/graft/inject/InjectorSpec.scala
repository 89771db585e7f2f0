package graft.inject

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class InjectorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 10 rows, one per second from 2024-01-01 00:00:00; span covers rows 2..5
  private val base = (0 until 10).map(i =>
    (i.toLong, ts(f"2024-01-01 00:00:0$i"), 10.0 + i, 100.0 * i))
    .toDF("id", "ts", "v", "other")
  private val spanStart = 1704067202L // 00:00:02
  private val span = AnomalySetting("custom", spanStart, durationSec = 4,
    magnitude = 3.0, percentage = 100.0, columns = Seq("v"), seed = 42L)

  test("I5 custom: v*magnitude inside half-open span, untouched outside") {
    val out = Injector.inject(base, "id", "ts", span)
      .select($"id", $"v", $"injected_anomaly", $"label")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getBoolean(2), r.getInt(3)))).toMap
    (0 until 10).foreach { i =>
      val (v, flag, lbl) = out(i.toLong)
      if (i >= 2 && i < 6) { // [start, start+4)
        assert(v == (10.0 + i) * 3.0, s"row $i")
        assert(flag && lbl == 1)
      } else {
        assert(v == 10.0 + i, s"row $i")
        assert(!flag && lbl == 0)
      }
    }
  }

  test("injection preserves row count and non-target columns") {
    val out = Injector.inject(base, "id", "ts", span)
    assert(out.count() == 10)
    val others = out.select($"id", $"other").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0 until 10).foreach(i => assert(others(i.toLong) == 100.0 * i))
  }

  test("I3 step: v + mean(selected)*magnitude") {
    val s = span.copy(anomalyType = "step", magnitude = 2.0)
    val out = Injector.inject(base, "id", "ts", s)
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mean = (12.0 + 13.0 + 14.0 + 15.0) / 4 // selected rows 2..5
    (2 until 6).foreach(i => assert(out(i.toLong) == (10.0 + i) + mean * 2.0))
    assert(out(0L) == 10.0 && out(9L) == 19.0)
  }

  test("I4 offline: selected values forced to zero") {
    val s = span.copy(anomalyType = "offline")
    val out = Injector.inject(base, "id", "ts", s)
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (2 until 6).foreach(i => assert(out(i.toLong) == 0.0))
    assert(out(1L) == 11.0)
  }

  test("I1 spike: v*U(1,mag) lies in (v, v*mag) and is reproducible") {
    val s = span.copy(anomalyType = "spike", magnitude = 3.0)
    val run1 = Injector.inject(base, "id", "ts", s)
      .select($"id", $"v").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val run2 = Injector.inject(base.repartition(3), "id", "ts", s)
      .select($"id", $"v").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(run1.toMap == run2.toMap, "partition-invariant")
    run1.toMap.foreach { case (i, v) =>
      if (i >= 2 && i < 6) {
        val orig = 10.0 + i
        assert(v >= orig && v <= orig * 3.0, s"row $i: $v")
      }
    }
  }

  test("I2 lowered: max(v - range*U(0.3,0.4), 0)") {
    val s = span.copy(anomalyType = "lowered")
    val out = Injector.inject(base, "id", "ts", s)
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val range = 15.0 - 12.0 // selected rows 2..5
    (2 until 6).foreach { i =>
      val orig = 10.0 + i
      assert(out(i.toLong) >= orig - range * 0.4 - 1e-9 &&
        out(i.toLong) <= orig - range * 0.3 + 1e-9, s"row $i")
    }
  }

  test("percentage selects ~pct% of in-span rows, deterministically") {
    val big = (0 until 2000).map(i =>
      (i.toLong, ts("2024-01-01 00:00:03"), 1.0)).toDF("id", "ts", "v")
    val s = AnomalySetting("custom", spanStart, 4, magnitude = 0.0,
      percentage = 25.0, columns = Seq("v"), seed = 42L)
    val n = Injector.inject(big, "id", "ts", s).filter($"injected_anomaly").count()
    assert(n > 2000 * 0.20 && n < 2000 * 0.30, s"selected $n")
    val n2 = Injector.inject(big.repartition(5), "id", "ts", s)
      .filter($"injected_anomaly").count()
    assert(n == n2)
  }

  test("injectAll composes settings in order") {
    val s1 = span // custom *3 on rows 2..5
    val s2 = AnomalySetting("custom", spanStart + 4, 2, magnitude = 10.0,
      percentage = 100.0, columns = Seq("v"), seed = 42L) // rows 6..7
    val out = Injector.injectAll(base, "id", "ts", Seq(s1, s2))
      .select($"id", $"v", $"label").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(out(3L)._1 == 13.0 * 3.0 && out(3L)._2 == 1)
    assert(out(6L)._1 == 16.0 * 10.0 && out(6L)._2 == 1)
    assert(out(8L)._1 == 18.0 && out(8L)._2 == 0)
  }
}
