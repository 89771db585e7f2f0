package graft.ml

import graft.SparkSpec
import graft.xai.Lime
import org.apache.spark.sql.functions._

class PcaLimeSpec extends SparkSpec {
  import spark.implicits._

  /** Correlated 2-D cloud (x, ~2x) + off-manifold anomalies (x, -2x):
    * PCA(k=1) reconstruction error separates them perfectly; univariate
    * thresholds cannot. */
  private lazy val cloud = {
    val rng = new scala.util.Random(13)
    (0 until 1200).map { i =>
      val anom = i % 40 == 11
      val x = rng.nextGaussian() * 10
      val y = if (anom) -2.0 * x + rng.nextGaussian() * 0.1
              else 2.0 * x + rng.nextGaussian() * 0.1
      (i.toLong, x, y, if (anom) 1 else 0)
    }.toDF("id", "x", "y", "label")
  }

  test("M3: PCA one-class flags off-manifold points at ~nu rate") {
    val det = PcaDetector(Seq("x", "y"), k = 1, nu = 0.05)
    val out = det.fit(cloud.filter($"label" === 0)).transform(cloud)
    val m = Metrics2.recallPrecision(out)
    assert(m._1 > 0.9, s"recall ${m._1}") // off-manifold error is huge
    // flag rate near nu + true anomaly mass
    val rate = out.filter($"is_anomaly").count().toDouble / 1200
    assert(rate < 0.15, s"rate $rate")
  }

  test("X3: LIME local surrogate attributes the decisive feature") {
    val rng = new scala.util.Random(17)
    // label depends only on v1 (threshold); v2 is noise
    val data = (0 until 1000).map { i =>
      val v1 = rng.nextDouble() * 100
      val v2 = rng.nextGaussian() * 50
      (i.toLong, v1, v2, if (v1 > 70) 1 else 0)
    }.toDF("id", "v1", "v2", "label")
    val fitted = SupervisedDetector(Seq("v1", "v2"), "logreg").fit(data)

    val instances = data.filter($"label" === 1).limit(3)
    val exps = Lime.explain(instances, data, fitted, Seq("v1", "v2"),
      nSamples = 300)
    assert(exps.size == 3)
    // every local explanation puts more weight on v1, with positive sign
    exps.foreach { e =>
      assert(math.abs(e.weights("v1")) > math.abs(e.weights("v2")),
        e.weights.toString)
      assert(e.weights("v1") > 0, e.weights.toString)
    }
    val imp = Lime.importance(spark, exps, Seq("v1", "v2")).collect()
    assert(imp.head.getString(0) == "v1")
  }
}
