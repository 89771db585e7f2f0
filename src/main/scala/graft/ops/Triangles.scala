package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting over an undirected edge list — the
  * graph-clustering primitive (local clustering coefficient, community
  * signal, spam-farm detection) alongside [[PageRank]] and [[Bfs]].
  *
  * Algorithm: the node-iterator / "compact-forward" scheme (Latapy 2008;
  * the MapReduce formulation is Suri & Vassilvitskii, WWW 2011). Every
  * undirected edge is oriented from its lower endpoint to its higher
  * endpoint under the total order (degree, id). Each triangle {a,b,c}
  * with a < b < c in that order then carries oriented edges a→b, a→c,
  * b→c and is found EXACTLY once: as the wedge (a→b, a→c) closed by the
  * oriented edge b→c.
  *
  * Scale shape: orientation bounds every node's out-degree by O(√m)
  * regardless of how skewed the raw degree distribution is — the wedge
  * self-join that explodes on hub nodes in the naive formulation stays
  * balanced. Three shuffles total: the degree count, the wedge self-join
  * on the wedge apex, and the closure equi-join on (v, w); all are plain
  * equi-joins Catalyst can plan with AQE skew handling.
  *
  * Pure integer arithmetic → bit-reproducible across partitionings; the
  * oracle twin computes the same triangles by a canonical a<b<c 3-way
  * self-join.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * @param edges canonical undirected edges: two columns `a`, `b` with
    *              `a < b`, distinct (one row per undirected edge)
    * @return (node, tri: Long) for every node in at least one triangle */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Orient each edge from the (deg, id)-smaller endpoint to the larger.
    val aFirst = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .withColumn("fwd",
        col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")))
    val oriented = aFirst.select(
      when(col("fwd"), col("a")).otherwise(col("b")).as("src"),
      when(col("fwd"), col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint() // feeds both wedge sides AND the closure probe
    // Wedges (src→v, src→w), v ≠ w, closed when v→w is an oriented edge.
    // Each triangle's apex wedge appears as both (v,w) and (w,v); only the
    // orientation-consistent one closes, so the count is exact without
    // carrying degrees into the wedge frame.
    val wedges = oriented.select(col("src"), col("dst").as("v"))
      .join(oriented.select(col("src"), col("dst").as("w")), Seq("src"))
      .filter(col("v") =!= col("w"))
    val tri = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    tri.select(col("src").as("node"))
      .unionAll(tri.select(col("v").as("node")))
      .unionAll(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))
  }
}
