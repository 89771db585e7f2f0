package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    assert(df.select(Vectors.dot($"a", $"b")).as[Double].head() == 32.0)
    val cos = df.select(Vectors.cosine($"a", $"b")).as[Double].head()
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(cos - expected) < 1e-12)
  }

  test("cosine of identical vectors is 1, orthogonal is 0, zero-vector is 0") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(Vectors.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(got(2) == 0.0) // zero-norm guard
  }

  test("lshBucket: deterministic, in range, and similar vectors collide") {
    // odd dim: ±1-hyperplane projections of an all-ones vector are odd, so
    // never 0 — a 0.01 perturbation cannot flip any sign bit
    val base = Array.fill(17)(1.0f)
    val near = base.clone(); near(0) = 1.01f
    val far = Array.fill(17)(-1.0f)
    val df = Seq(("base", base.toSeq), ("near", near.toSeq), ("far", far.toSeq))
      .toDF("name", "v")
    val got = df.select($"name", Vectors.lshBucket($"v", 17, 8, 7L).as("b"))
      .as[(String, Long)].collect().toMap
    assert(got.values.forall(b => b >= 0 && b < 256))
    assert(got("base") == got("near"))
    // every projection strictly flips sign → every bit flips
    assert(got("far") == ((~got("base")) & 255L))
  }

  test("hyperplaneSign is ±1 and roughly balanced") {
    val signs = for (j <- 0 until 8; d <- 0 until 64)
      yield Vectors.hyperplaneSign(j, d, 7L)
    assert(signs.forall(s => s == 1 || s == -1))
    val pos = signs.count(_ == 1)
    assert(pos > signs.size * 0.3 && pos < signs.size * 0.7)
  }
}
