package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketsSpec extends SparkSpec {
  import spark.implicits._

  // adversarial fixture: one degenerate bucket every member shares (the
  // all-identical-band case) plus healthy small buckets
  private def fixture = {
    val hot = (1 to 200).map(i => (i.toLong, "deadbeef"))
    val ok = (201 to 220).map(i => (i.toLong, s"b${i % 5}"))
    (hot ++ ok).toDF("doc_id", "bv")
  }

  test("capMembers drops over-cap buckets and keeps the rest intact") {
    val capped = Buckets.capMembers(fixture, Seq($"bv"), cap = 10, label = "t1")
    val kept = capped.select("bv").distinct().as[String].collect().toSet
    assert(!kept.contains("deadbeef"))
    assert(kept == (0 until 5).map(i => s"b$i").toSet)
    assert(capped.count() == 20)
  }

  test("self-join over capped members is bounded; uncapped would explode") {
    val capped = Buckets.capMembers(fixture, Seq($"bv"), cap = 10, label = "t2")
    val pairs = capped.as("x").join(capped.as("y"),
      col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
    // healthy buckets have 4 members each → 4C2 × 5 = 30 pairs; the hot
    // bucket alone would have contributed 200C2 = 19900
    assert(pairs.count() == 30)
  }

  test("overCap reports exactly the skipped buckets with sizes") {
    val audit = Buckets.overCap(fixture, Seq($"bv"), cap = 10)
      .as[(String, Long)].collect().toSeq
    assert(audit == Seq(("deadbeef", 200L)))
  }

  test("observed cap metrics fire when the capped frame is localCheckpointed") {
    // guarded queries now materialize the CAPPED frame (one window pass,
    // shared by all consumers) — the audit metric must still surface from
    // the checkpoint action itself
    @volatile var seen: Option[Long] = None
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        qe.observedMetrics.get("graft_bucket_cap_ckpt")
          .foreach(r => seen = Some(r.getAs[Long]("dropped_rows")))
      override def onFailure(f: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      Buckets.capMembers(fixture, Seq($"bv"), cap = 10, label = "ckpt")
        .localCheckpoint()
      val deadline = System.nanoTime() + 5000000000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.contains(200L), s"metric not observed: $seen")
    } finally spark.listenerManager.unregister(l)
  }

  test("cap not hit → frame passes through unchanged") {
    val capped = Buckets.capMembers(fixture, Seq($"bv"), cap = 5000, label = "t3")
    assert(capped.count() == fixture.count())
  }

  test("capReport accounting matches what capMembers actually drops") {
    val rep = Buckets.capReport(fixture, Seq($"bv"), cap = 10).head()
    assert(rep.getAs[Long]("n_buckets") == 6L)       // deadbeef + b0..b4
    assert(rep.getAs[Long]("over_cap_buckets") == 1L)
    assert(rep.getAs[Long]("member_rows") == 220L)
    assert(rep.getAs[Long]("max_bucket") == 200L)
    val dropped = rep.getAs[Long]("dropped_rows")
    val kept = Buckets.capMembers(fixture, Seq($"bv"), cap = 10, label = "t4")
      .count()
    assert(dropped == fixture.count() - kept) // 200 = 220 - 20
  }

  test("capReport on an empty frame is a zero row, not an error") {
    val rep = Buckets.capReport(fixture.limit(0), Seq($"bv"), cap = 10).head()
    assert(rep.getAs[Long]("n_buckets") == 0L)
    assert(rep.getAs[Long]("dropped_rows") == 0L)
    assert(rep.getAs[Long]("max_bucket") == 0L)
  }

  test("g6 coJaccard: a synthetic power-customer is skipped at the cap, " +
      "healthy pairs AND degrees stay consistent") {
    // customer 999 buys from 50 suppliers (50·49/2 = 1225 pairs if
    // unguarded); customers 1..3 each buy from suppliers {1, 2}
    val power = (1 to 50).map(sk => (999L, sk.toLong))
    val ok = (1 to 3).flatMap(c => Seq((c.toLong, 1L), (c.toLong, 2L)))
    val edges = (power ++ ok).toDF("c", "sk")
    val out = graft.queries.Stats.coJaccard(edges, cap = 10, topK = 100)
      .collect()
    // only (1,2) survives, and the degrees EXCLUDE the dropped customer
    // (common ≤ min(d1, d2) must hold): common = d1 = d2 = 3 ⇒ jac = 1.0
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((1L, 2L, 3L, 3L, 3L)))
    assert(r.getDouble(5) == 1.0)
    // a non-binding cap admits the power customer's full fan-out
    val full = graft.queries.Stats.coJaccard(edges, cap = 100, topK = 10000)
    assert(full.count() == 1225L)
  }
}
