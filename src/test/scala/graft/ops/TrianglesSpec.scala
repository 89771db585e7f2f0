package graft.ops

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  /** K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in exactly 3. */
  test("complete graph K4: every node participates in 3 triangles") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    val got = Triangles.perNode(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  /** Two triangles sharing node 3, plus a pendant edge: the hub counts
    * both, leaves count one, the pendant node is absent. */
  test("bowtie: shared apex counts both triangles, pendant node absent") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    val got = Triangles.perNode(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("triangle-free graph (star + path) returns no rows") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)).toDF("a", "b")
    assert(Triangles.perNode(edges).count() === 0L)
  }

  /** Skewed wheel: hub 0 joined to every rim node — exactly the hub shape
    * the (degree, id) orientation exists for; rim edges i—(i+1) close one
    * triangle each. */
  test("wheel graph: hub participates in every rim triangle") {
    val n = 12L
    val spokes = (1L to n).map(i => (0L, i))
    val rim = (1L until n).map(i => (i, i + 1))
    val edges = (spokes ++ rim).toDF("a", "b")
    val got = Triangles.perNode(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === n - 1)           // one per rim edge
    assert(got(1L) === 1L && got(n) === 1L) // rim endpoints
    assert((2L until n).forall(got(_) === 2L)) // interior rim nodes
  }

  test("partition-count invariance (bit-identical longs)") {
    val edges = (for {
      i <- 1L to 30L; j <- (i + 1) to 30L if (i * 31 + j) % 5 == 0
    } yield (i, j)).toDF("a", "b")
    def run(parts: Int): Map[Long, Long] = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Triangles.perNode(edges.repartition(parts)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    val a = run(2)
    assert(a.nonEmpty && a === run(7))
  }
}
