package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract gates for the continuation batch that the DuckDB oracle also
  * covers — these prove the PROPERTIES, not just one result: e10's greedy
  * picks maximize the MMR objective at every step, d16 verdicts agree with
  * host-recomputed Jaccard, and w24 is the true frame median. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("e10 greedy MMR: each step's pick maximizes " +
      "0.7*rel - 0.3*maxSimToSelected over the remaining pool (host replay)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val d = math.sqrt(a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * a(i))) *
        math.sqrt(b.indices.foldLeft(0.0)((acc, i) => acc + b(i) * b(i)))
      if (d == 0.0) 0.0 else dot / d
    }
    val got = graft.SparkEntry.queries("e10_mmr_rerank")(spark, dir)
      .select($"q_id", $"step", $"c_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(_._3).toSeq
      }
    assert(got.keySet == Set(0L, 1L, 2L))
    got.foreach { case (q, picks) =>
      assert(picks.size == 5)
      // host replay: pool = top-12 by cos, then greedy argmax per step
      val pool = emb.keys.filter(_ != q).toSeq
        .map(c => c -> cos(emb(q), emb(c)))
        .sortBy { case (c, s) => (-s, c) }.take(12)
      var selected = Seq.empty[Long]
      picks.foreach { pick =>
        val remaining = pool.filterNot { case (c, _) => selected.contains(c) }
        val best = remaining.map { case (c, rel) =>
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.map(sc => cos(emb(c), emb(sc))).max
          (c, 0.7 * rel - 0.3 * maxSim)
        }.minBy { case (c, score) => (-score, c) }
        assert(best._1 == pick,
          s"q=$q selected=$selected: expected ${best._1}, engine picked $pick")
        selected :+= pick
      }
    }
    // the diversity term must matter: some query's MMR order must differ
    // from its plain cosine top-5
    val reordered = got.exists { case (q, picks) =>
      val top5 = emb.keys.filter(_ != q).toSeq
        .map(c => c -> cos(emb(q), emb(c)))
        .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1)
      picks != top5
    }
    assert(reordered, "MMR == plain top-5 everywhere — diversity is vacuous")
  }

  test("d16 incremental dedup: verdict invariants hold (incoming-only " +
      "rows, n_dup <= n_cand, corpus-side best match, null-consistency)") {
    val rows = graft.SparkEntry.queries("d16_incremental_dedup")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 0, s"non-incoming doc ${r.getLong(0)}")
      assert(r.getLong(2) <= r.getLong(1), "n_dup must be <= n_cand")
      if (r.getLong(2) == 0) assert(r.isNullAt(3) && r.isNullAt(4))
      else assert(r.getLong(3) % 10 != 0, "best match must be a corpus doc")
    }
    assert(rows.exists(_.getLong(2) > 0),
      "fixture produced no verified dups — gate is vacuous")
  }

  test("w24 rolling median equals the host-side sorted-frame lower median") {
    val got = graft.SparkEntry.queries("w24_rolling_median")(spark, dir)
      .select($"user_id", $"event_id", $"med10_cents")
      .as[(Long, Long, Long)].collect()
      .map { case (u, e, m) => (u, e) -> m }.toMap
    // host replay orders by the window's (es, event_id) key, not event_id
    val perUser = graft.Tables.t(spark, dir, "events")
      .select($"user_id", $"event_id",
        graft.functions.Det.epochS($"ts").as("es"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(perUser.nonEmpty)
    perUser.foreach { case (u, rows) =>
      val ordered = rows.sortBy { case (_, e, es, _) => (es, e) }
      ordered.indices.foreach { i =>
        val frame =
          ordered.slice(math.max(0, i - 9), i + 1).map(_._4).sorted
        val want = frame((frame.size + 1) / 2 - 1)
        assert(got((u, ordered(i)._2)) == want)
      }
    }
  }
}
