package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan

/** Plan pins for the TextDedup candidate kernels (optimization r13).
  *
  * d22/d25 verify LSH candidates EXACTLY, so their candidate generator
  * must not pay the two signature re-joins `lshPairs` uses to compute
  * `est_jaccard` (inner joins Catalyst cannot prune — it cannot know the
  * signature frame has exactly one row per doc). These queries end at a
  * `localCheckpoint`, so `explain()` on the registered query shows only a
  * checkpoint-RDD scan — the pin must look at the kernel's own plan. */
class DedupKernelPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def joinCount(p: SparkPlan): Int = {
    val s = p.toString
    Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .map(k => s.sliding(k.length).count(_ == k)).sum
  }

  test("jacVerifiedPairs (d22/d25) plans exactly 3 joins: the band " +
      "self-join + two gram-attach joins — no est_jaccard re-joins") {
    val plan = TextDedup.jacVerifiedPairs(spark, dir)
      .queryExecution.executedPlan
    assert(joinCount(plan) === 3, s"plan was:\n$plan")
  }
}
