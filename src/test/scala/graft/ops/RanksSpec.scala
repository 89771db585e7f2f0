package graft.ops

import graft.SparkSpec
import graft.ingest.Ingest
import graft.inject.{AnomalySetting, Injector}
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber matches a global window row_number") {
    val df = (1 to 1000).map(i => ((i * 37) % 1000, i.toLong)).toDF("k", "v")
    val got = Ranks.globalRowNumber(df, Seq($"k", $"v"), "rn", numPartitions = 7)
      .orderBy($"rn").select($"k", $"v", $"rn").collect()
    val want = df.orderBy($"k", $"v").collect().zipWithIndex
      .map { case (r, i) => (r.getInt(0), r.getLong(1), i + 1L) }
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      want.toSeq)
  }

  test("globalRowNumberWithTotal carries the exact row count") {
    val df = (1 to 123).map(i => i.toLong).toDF("v")
    val out = Ranks.globalRowNumberWithTotal(df, Seq($"v"), "rn", "n",
      numPartitions = 5)
    assert(out.select("n").distinct().as[Long].collect().toSeq == Seq(123L))
    assert(out.agg(max($"rn")).as[Long].head() == 123L)
  }

  test("ranks are invariant to input partitioning and rank partition count") {
    val df = (1 to 500).map(i => ((i * 13) % 97, i.toLong)).toDF("k", "v")
    val a = Ranks.globalRowNumber(df.repartition(3), Seq($"k", $"v"), "rn",
      numPartitions = 4).orderBy($"v").select($"rn").as[Long].collect().toSeq
    val b = Ranks.globalRowNumber(df.repartition(11), Seq($"k", $"v"), "rn",
      numPartitions = 9).orderBy($"v").select($"rn").as[Long].collect().toSeq
    assert(a == b)
  }

  test("globalCumSum matches a global window prefix sum, partition-invariantly") {
    val df = (1 to 500).map(i => ((i * 37) % 211, i.toLong, (i % 13).toLong))
      .toDF("k", "v", "w")
    val want = df.orderBy($"k", $"v").collect()
      .map(r => (r.getLong(1), r.getLong(2))).scanLeft((0L, 0L)) {
        case ((_, acc), (v, wv)) => (v, acc + wv)
      }.drop(1).toMap
    def got(parts: Int, n: Int) =
      Ranks.globalCumSum(df.repartition(parts), Seq($"k", $"v"), $"w", "cs",
          numPartitions = n)
        .select($"v", $"cs").as[(Long, Long)].collect().toMap
    val a = got(3, 4)
    assert(a == want)
    assert(got(11, 9) == a)
  }

  test("string leading key ranks distributed, exactly, partition-invariantly") {
    // realistic doc-id-ish strings incl. shared prefixes, empty, non-ASCII
    val docs = (1 to 400).map { i =>
      val s = i % 40 match {
        case 0 => ""
        case 1 => s"Ω-doc-$i"
        case n if n < 8 => s"common/prefix/longer/than/seven/bytes/$i"
        case _ => s"doc-${(i * 131) % 97}%04d-$i"
      }
      (s, i.toLong)
    }.toDF("k", "v")
    val got = Ranks.globalRowNumber(docs, Seq($"k", $"v"), "rn",
        numPartitions = 8)
      .orderBy($"rn").select($"k", $"v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = docs.orderBy($"k", $"v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    // invariance across input partitioning / bucket counts
    val a = Ranks.globalRowNumber(docs.repartition(3), Seq($"k", $"v"), "rn",
      numPartitions = 4).orderBy($"v").select($"rn").as[Long].collect().toSeq
    val b = Ranks.globalRowNumber(docs.repartition(11), Seq($"k", $"v"), "rn",
      numPartitions = 9).orderBy($"v").select($"rn").as[Long].collect().toSeq
    assert(a == b)
  }

  test("unsupported leading key type fails fast (no silent one-bucket rank)") {
    val df = Seq((Array(1.0, 2.0), 1L), (Array(2.0, 1.0), 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Ranks.globalRowNumber(df, Seq($"k", $"v"), "rn")
    }
    assert(e.getMessage.contains("leading order key"))
  }

  test("no single-partition Window in the physical plan") {
    val df = (1 to 100).map(_.toLong).toDF("v")
    val plan = Ranks.globalRowNumber(df, Seq($"v"), "rn")
      .queryExecution.executedPlan.toString
    // every full-data Window must be partitioned; the only unpartitioned
    // window allowed is the one over the tiny per-partition offsets frame
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
  }

  test("normalize ids + injection are partition-invariant (stable-id contract)") {
    // raw frame with duplicate timestamps (tiebreak via measure columns)
    val raw = (1 to 400).map { i =>
      (1704067200L + (i % 50) * 60L, (i % 7).toDouble, i.toDouble, "0")
    }.toDF("time", "m1", "m2", "lbl")

    def pipeline(parts: Int, shuffleParts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", shuffleParts)
      try {
        val norm = Ingest.normalize(raw.repartition(parts), "time", Some("lbl"))
        val inj = Injector.inject(norm, "id", "timestamp",
          AnomalySetting("spike", 1704067200L, 3000L, magnitude = 3.0,
            percentage = 40.0, columns = Seq("m1"), seed = 7L))
        inj.select($"id", $"timestamp".cast("long").as("es"), $"m1", $"m2",
            $"injected_anomaly")
          .orderBy($"id").collect().toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", "2")
    }

    val a = pipeline(parts = 3, shuffleParts = "2")
    val b = pipeline(parts = 13, shuffleParts = "5")
    assert(a == b)
    // sanity: something actually got injected
    assert(a.exists(_.getAs[Boolean]("injected_anomaly")))
  }
}
