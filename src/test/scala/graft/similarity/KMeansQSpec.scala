package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansQSpec extends SparkSpec {
  import spark.implicits._

  // two obvious 2-D clusters around (0, 0) and (10, 10), plus one point
  // near each centroid's midpoint edge to exercise the tie/argmin path
  private val pts = Seq(
    (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),
    (2L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)),
    (4L, Array(9.0, 10.0)), (5L, Array(10.0, 9.0)),
    (6L, Array(1.0, 1.0)), (7L, Array(9.0, 9.0)))

  private def vecs = pts.toDF("id", "v")
    .select($"id", KMeansQ.quantize($"v", 1000000.0).as("q"))

  private def init = Array(Array(0L, 0L), Array(10000000L, 10000000L))

  test("lloyd recovers the two planted clusters and the exact centroids") {
    val (assigned, cents) = KMeansQ.lloyd(vecs, "id", "q", k = 2,
      iters = 2, init = init)
    val byId = assigned.as[(Long, Int)].collect().toMap
    assert(Seq(0L, 2L, 3L, 6L).forall(byId(_) == 0))
    assert(Seq(1L, 4L, 5L, 7L).forall(byId(_) == 1))
    // cluster 0 mean = (0.5, 0.5) micro-units exactly; cluster 1 = (9.5, 9.5)
    assert(cents(0).toSeq == Seq(500000L, 500000L))
    assert(cents(1).toSeq == Seq(9500000L, 9500000L))
  }

  test("assignment tie-breaks to the lower cluster id") {
    val tied = Seq((0L, Array(5.0, 5.0))).toDF("id", "v")
      .select($"id", KMeansQ.quantize($"v", 1000000.0).as("q"))
    val out = KMeansQ.assign(tied, "q", init)
      .select($"cluster").as[Int].head()
    assert(out == 0)
  }

  test("result is invariant to input partitioning") {
    val (a1, c1) = KMeansQ.lloyd(vecs.repartition(7), "id", "q", 2, 2, init)
    val (a2, c2) = KMeansQ.lloyd(vecs.coalesce(1), "id", "q", 2, 2, init)
    assert(a1.orderBy($"id").collect().toSeq ==
      a2.orderBy($"id").collect().toSeq)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("empty cluster keeps its previous centroid") {
    val far = Array(Array(0L, 0L), Array(900000000L, 900000000L))
    val (_, cents) = KMeansQ.lloyd(vecs, "id", "q", 2, 1, far)
    // nobody is near (900, 900): cluster 1 must survive unchanged
    assert(cents(1).toSeq == Seq(900000000L, 900000000L))
    assert(cents(0).toSeq == Seq(5000000L, 5000000L)) // mean of all 8
  }

  test("negative coordinates floor-divide like the SQL twin") {
    val neg = Seq((0L, Array(-1.0)), (1L, Array(-2.0))).toDF("id", "v")
      .select($"id", KMeansQ.quantize($"v", 1000000.0).as("q"))
    val (_, cents) = KMeansQ.lloyd(neg, "id", "q", 1, 1,
      Array(Array(0L)))
    // (-1e6 + -2e6) / 2 floor-divides to -1500000 in BOTH engines
    assert(cents(0).toSeq == Seq(-1500000L))
  }
}
