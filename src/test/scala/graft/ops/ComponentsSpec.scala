package graft.ops

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation labels chains, cliques and pairs correctly") {
    // a 5-node chain (worst case: diameter rounds), a triangle, a lone pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val comp = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("an empty edge list yields an empty labeling (the observe-based " +
      "convergence count must coalesce its null sum, not NPE)") {
    // optimization r13: the per-round changed-label count rides the
    // checkpoint job via Dataset.observe; over ZERO rows the sum metric
    // is NULL and only the coalesce keeps the loop terminating cleanly.
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(edges, "a", "b").count() === 0L)
  }

  test("hitting the iteration cap unconverged throws instead of handing " +
      "back non-minimal labels") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(edges, "a", "b", maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    // the same chain converges (and is correct) with rounds to spare
    val ok = Components.connectedComponents(edges, "a", "b", maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
