package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance over an edge list — the TrustRank-style
  * "distance from trusted seeds" signal web-curation pipelines use next to
  * [[PageRank]] centrality.
  *
  * Pure integer arithmetic (hop counts), so results are exactly
  * reproducible across partitionings and engines; the oracle unrolls the
  * same fixed relaxation count in SQL.
  *
  * Scale shape: each round is one co-partitioned join against the
  * once-partitioned-and-checkpointed edge frame + one min-aggregation
  * shuffle — the [[PageRank]] iteration shape with min(d+1) in place of
  * the damped sum. Full-relaxation form (distances re-derived from the
  * whole frontier set each round) rather than delta-frontier: simpler,
  * same worst-case shuffle volume at small fixed depth, and exactly the
  * shape the unrolled SQL twin computes.
  */
object Bfs {

  /** @param edges two columns `src`, `dst`
    * @param seeds one column `node` (distance 0)
    * @param maxHops fixed relaxation rounds (nodes further than this are
    *                absent from the result)
    * @return (node, dist: Int) for every node within maxHops of a seed */
  def seedDistance(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint()
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0).as("dist")).localCheckpoint()
    for (_ <- 1 to maxHops) {
      val relaxed = e.join(dist, e("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** Weighted twin of [[seedDistance]]: fixed-round Bellman–Ford. Each
    * round relaxes every edge once (cost = min over src of cost[src] +
    * w), so after `rounds` rounds every node whose cheapest seed path
    * uses ≤ `rounds` edges carries its exact minimum cost — integer
    * weights keep it bit-reproducible and SQL-unrollable. Same per-round
    * shape as the hop version: one co-partitioned join against the
    * checkpointed edge frame + one min-agg shuffle.
    *
    * @param edges three columns `src`, `dst`, `w` (LongType, ≥ 0)
    * @return (node, cost: Long) for nodes reachable within `rounds` edges */
  def seedCost(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst"), col("w"))
      .repartition(col("src")).localCheckpoint()
    var cost = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("cost")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = e.join(cost, e("src") === cost("node"))
        .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
      cost = cost.unionAll(relaxed)
        .groupBy("node").agg(min("cost").as("cost"))
        .localCheckpoint()
    }
    cost
  }
}
