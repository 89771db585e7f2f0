package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class DotExprSpec extends SparkSpec {
  import spark.implicits._

  /** The interpreted composition DotExpr replaced — the parity reference. */
  private def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private lazy val floats = {
    val rng = new scala.util.Random(42)
    (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(rng.nextFloat() * 2 - 1),
        Seq.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("bit-identical to the zip_with/aggregate composition (float arrays)") {
    val got = floats.select(
      DotExpr.dot($"a", $"b").as("nat"), dotHof($"a", $"b").as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h), s"$n != $h")
    }
  }

  test("bit-identical on double arrays (residual/normalized paths)") {
    val df = floats.select($"id",
      transform($"a", x => x.cast("double") * 1.5).as("a"),
      transform($"b", x => x.cast("double")).as("b"))
    val got = df.select(
      DotExpr.dot($"a", $"b").as("nat"), dotHof($"a", $"b").as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("VecCombExpr: bit-identical to the zip_with ± composition, " +
      "incl. length-mismatch extend-and-null") {
    def subHof(a: Column, b: Column): Column =
      zip_with(a, b, (x, y) => x.cast("double") - y.cast("double"))
    def addHof(a: Column, b: Column): Column =
      zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))
    val got = floats.select(
      VecCombExpr.sub($"a", $"b").as("ns"), subHof($"a", $"b").as("hs"),
      VecCombExpr.add($"a", $"b").as("na"), addHof($"a", $"b").as("ha"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
      assert(r.getSeq[Double](2) == r.getSeq[Double](3))
    }
    // mismatched lengths + null elements: zip_with extends with nulls
    val edge = Seq((Seq(Some(1.0f), None), Seq(Some(2.0), Some(3.0), Some(4.0))))
      .toDF("a", "b")
    val e = edge.select(VecCombExpr.sub($"a", $"b").as("n"),
      subHof($"a", $"b").as("h")).head()
    assert(e.getSeq[Any](0) == e.getSeq[Any](1))
    assert(e.getSeq[Any](0) == Seq(-1.0, null, null))
  }

  test("null array, null element, and length mismatch all yield NULL " +
      "(matching the composition)") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (2L, None, Some(Seq(Some(1.0f), Some(1.0f)))),
      (3L, Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f)))),
      (4L, Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(1.0f)))))
      .toDF("id", "a", "b")
    val got = df.select($"id", DotExpr.dot($"a", $"b").as("nat"),
      dotHof($"a", $"b").as("hof")).orderBy($"id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"row ${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(got(0).getDouble(1) == 11.0)
    assert((1 to 3).forall(i => got(i).isNullAt(1)))
  }

  test("integral element types are rejected at analysis, not " +
      "bit-reinterpreted") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(DotExpr.dot($"a", $"b")).collect()
    }
  }

  test("codegen and interpreted paths agree; projection stays in one " +
      "WholeStageCodegen span") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dot").toString
    floats.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    def results() = df.select(DotExpr.dot($"a", $"b"))
      .collect().map(_.getDouble(0)).toSeq

    val plan = df.select(DotExpr.dot($"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)

    val viaCodegen = results()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(results() == viaCodegen)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
