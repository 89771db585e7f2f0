package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  //           key  ts   id
  private val left = Seq(
    ("a", 5L, 1L), ("a", 10L, 2L), ("a", 20L, 3L),
    ("b", 10L, 4L), ("b", 30L, 5L)).toDF("k", "ts", "id")
  //           key  ts   payload
  private val right = Seq(
    ("a", 10L, "a@10"), ("a", 15L, "a@15"),
    ("b", 25L, "b@25"), ("c", 1L, "c@1")).toDF("k", "ts", "v")

  test("backward as-of: greatest right ts <= left ts, per key, inclusive") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(
      1L -> None,          // before any right row
      2L -> Some("a@10"),  // inclusive: equal ts matches
      3L -> Some("a@15"),  // most recent prior, not just any prior
      4L -> None,          // key b has no right row yet
      5L -> Some("b@25"))) // per-key isolation (c@1 never leaks)
  }

  test("as-of output keeps every left row and column") {
    val out = AsOf.joinBackward(left, right, Seq("k"), "ts", Seq("v"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("k", "ts", "id", "asof_v"))
  }

  test("forward as-of: smallest right ts >= left ts, per key, inclusive") {
    val out = AsOf.joinForward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(
      1L -> Some("a@10"), // next following, not just any following
      2L -> Some("a@10"), // inclusive: equal ts matches
      3L -> None,         // after the last right row
      4L -> Some("b@25"),
      5L -> None))        // per-key isolation (c@1 never leaks)
  }

  test("null timestamps: left rows match nothing BOTH ways; right rows excluded") {
    val l = Seq(("a", Some(10L), 1L), ("a", None, 2L))
      .toDF("k", "ts", "id")
    val r = Seq(("a", Some(5L), "a@5"), ("a", Some(15L), "a@15"),
      ("a", None, "a@null")).toDF("k", "ts", "v")
    val back = AsOf.joinBackward(l, r, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[String])].collect().toMap
    val fwd = AsOf.joinForward(l, r, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[String])].collect().toMap
    assert(back == Map(1L -> Some("a@5"), 2L -> None))
    // pre-fix, desc (nulls LAST) silently matched id=2 to a@5's carry chain
    assert(fwd == Map(1L -> Some("a@15"), 2L -> None))
  }

  test("forward as-of agrees with a brute-force range join") {
    // randomized-ish (deterministic LCG) dense case across 3 keys
    val ls = (0 until 60).map { i =>
      (s"k${i % 3}", ((i * 37) % 50).toLong, i.toLong) }
    val rs = (0 until 20).map { i =>
      (s"k${i % 3}", ((i * 13) % 50).toLong, s"p$i") }
    // contract: right unique per (key, ts) — keep the max payload id
    val rdd = rs.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
    val l = ls.toDF("k", "ts", "id")
    val r = rdd.toDF("k", "ts", "v")
    val got = AsOf.joinForward(l, r, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[String])]
      .collect().toMap
    val want = ls.map { case (k, ts, id) =>
      val cand = rdd.filter(r => r._1 == k && r._2 >= ts)
      id -> (if (cand.isEmpty) None
             else Some(cand.minBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got == want)
  }
}
