package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim space, m=2 subspaces × 2 dims, 2 codes per subspace
  private val rows = Array(
    Array(0L, 0L, 10L, 10L), // code 0: sub0=(0,0), sub1=(10,10)
    Array(4L, 4L, 2L, 2L))   // code 1: sub0=(4,4), sub1=(2,2)
  private val idx = Pq.fixedIndex(rows, m = 2)

  private def df(vs: (Long, Seq[Double])*) =
    vs.toSeq.toDF("id", "q")

  test("fixedIndex slices codebook rows per subspace") {
    assert(idx.m == 2 && idx.subDim == 2)
    assert(idx.codebooks(0).map(_.toSeq).toSeq ==
      Seq(Seq(0L, 0L), Seq(4L, 4L)))
    assert(idx.codebooks(1).map(_.toSeq).toSeq ==
      Seq(Seq(10L, 10L), Seq(2L, 2L)))
  }

  test("encode picks the nearest code per subspace independently") {
    // sub0 (1,1) → code 0 (d=2 vs 18); sub1 (3,3) → code 1 (d=98 vs 2)
    val out = idx.encode(df(0L -> Seq(1.0, 1.0, 3.0, 3.0)), "q")
      .select($"codes").as[Seq[Int]].head()
    assert(out == Seq(0, 1))
  }

  test("encode tie-breaks to the lower code id") {
    // sub0 (2,2) is equidistant (d=8) from (0,0) and (4,4) → code 0
    val out = idx.encode(df(0L -> Seq(2.0, 2.0, 0.0, 0.0)), "q")
      .select($"codes").as[Seq[Int]].head()
    assert(out.head == 0)
  }

  test("lut rows are the exact integer squared distances") {
    val lut = idx.lut(df(7L -> Seq(1.0, 1.0, 3.0, 3.0)).toDF("q_id", "q"),
        "q_id", "q")
      .select($"b", $"c", $"ld").as[(Int, Int, Double)]
      .collect().map { case (b, c, d) => (b, c) -> d }.toMap
    assert(lut == Map((0, 0) -> 2.0, (0, 1) -> 18.0,
      (1, 0) -> 98.0, (1, 1) -> 2.0))
  }

  test("ADC distance equals the sum of per-subspace LUT entries") {
    // candidate encodes to (0, 1); ADC for the same query = 2 + 2 = 4,
    // which equals the exact distance to the RECONSTRUCTION (0,0,2,2)
    val enc = idx.encode(df(1L -> Seq(0.0, 0.0, 2.0, 2.0)), "q")
      .select(posexplode($"codes").as(Seq("b", "c")))
    val lut = idx.lut(df(7L -> Seq(1.0, 1.0, 3.0, 3.0)).toDF("q_id", "q"),
      "q_id", "q")
    val adist = enc.join(lut, Seq("b", "c"))
      .agg(sum($"ld")).as[Double].head()
    assert(adist == 4.0)
  }
}
