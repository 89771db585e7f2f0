package graft.xai

import graft.SparkSpec
import graft.ml.SupervisedDetector
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class XaiSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 1000L)

  /** v1 drives the label entirely; v2 is noise. Ground truth: v1 matters. */
  private lazy val data = {
    val rng = new scala.util.Random(5)
    (0 until 1500).map { i =>
      val anom = i % 21 == 3
      val v1 = if (anom) 300.0 + rng.nextGaussian() else 50.0 + rng.nextGaussian()
      (i.toLong, ts(i), v1, rng.nextGaussian() * 10, if (anom) 1 else 0)
    }.toDF("id", "timestamp", "v1", "v2", "label")
  }

  test("permuteColumn is a value-preserving reshuffle") {
    val out = Xai.permuteColumn(data, "id", "v1", 7L)
    assert(out.count() == 1500)
    val a = data.select(sum($"v1"), countDistinct($"v1")).head
    val b = out.select(sum($"v1"), countDistinct($"v1")).head
    assert(math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-6)
    assert(a.getLong(1) == b.getLong(1))
    // but the assignment moved for most rows
    val moved = out.as("o").join(data.as("d"), col("o.id") === col("d.id"))
      .filter(col("o.v1") =!= col("d.v1")).count()
    assert(moved > 1000, s"moved $moved")
  }

  test("X2: permutation importance ranks the causal feature first") {
    val fitted = SupervisedDetector(Seq("v1", "v2"), "decision_tree").fit(data)
    val imp = Xai.permutationImportance(data, fitted, Seq("v1", "v2"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(imp.head._1 == "v1", imp.mkString(", "))
    assert(imp.head._2 > 0.02) // scrambling v1 hurts accuracy
    assert(math.abs(imp.last._2) < 0.01) // scrambling noise does nothing
  }

  test("X4: counterfactuals point at the causal feature; X5 NDCG = 1") {
    val fitted = SupervisedDetector(Seq("v1", "v2"), "decision_tree").fit(data)
    val scored = fitted.transform(data).cache()
    val anomalies = scored.filter($"is_anomaly").limit(10)
    val normals = scored.filter(!$"is_anomaly").limit(400)
    val cfs = Xai.nunCounterfactuals(anomalies, normals, Seq("v1", "v2"), k = 3)
    assert(cfs.count() == 30) // 10 instances × 3 neighbors
    val imp = Xai.counterfactualImportance(cfs, Seq("v1", "v2"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(imp.head._1 == "v1", imp.mkString(", "))
    assert(imp.head._2 > 0.9) // nearly every CF changes v1

    val ndcg = Xai.ndcgVsInjected(
      Xai.counterfactualImportance(cfs, Seq("v1", "v2")), Set("v1"), 3)
    assert(ndcg == 1.0) // ground-truth feature ranked first
    scored.unpersist()
  }
}
