package graft.xai

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.FittedDetector

/** X3 capability (reference: `LimeTabularExplainer`,
  * `Backend/XAI_methods/methods/LimeExplainer.py:9-214`): per-instance local
  * linear surrogate.
  *
  * For each explained instance: sample `nSamples` perturbations around it
  * (gaussian per-feature noise scaled to the training std), score them with
  * the fitted model (one distributed pass over the perturbation frame),
  * weight by a proximity kernel, and fit an MLlib weighted
  * [[LinearRegression]] — its coefficients are the local attribution.
  * The instance loop stays tiny (n_explain_max ≈ 10 in the reference); the
  * heavy parts (scoring, regression) are distributed. */
object Lime {

  case class Explanation(instanceId: Long, weights: Map[String, Double])

  def explain(instances: DataFrame, background: DataFrame,
              fitted: FittedDetector, features: Seq[String],
              idCol: String = "id", nSamples: Int = 500,
              kernelWidth: Double = 0.75, seed: Long = 42L): Seq[Explanation] = {
    val spark = instances.sparkSession
    import spark.implicits._

    // per-feature std from the background (scale for noise + kernel)
    val stdRow = background.agg(
      stddev_samp(col(features.head)),
      features.tail.map(f => stddev_samp(col(f))): _*).head
    val stds = features.indices.map(i =>
      math.max(stdRow.getDouble(i), 1e-9))

    val rows = instances.select(col(idCol).cast("long") +: features.map(col): _*)
      .collect()

    rows.toSeq.map { r =>
      val id = r.getLong(0)
      val x0 = features.indices.map(i => r.getDouble(i + 1))
      val rng = new scala.util.Random(seed + id)
      val perturbed = (0 until nSamples).map { _ =>
        val xs = features.indices.map(i => x0(i) + rng.nextGaussian() * stds(i))
        Row.fromSeq(xs)
      }
      val schema = org.apache.spark.sql.types.StructType(features.map(f =>
        org.apache.spark.sql.types.StructField(f, org.apache.spark.sql.types.DoubleType)))
      val pdf = spark.createDataFrame(
        spark.sparkContext.parallelize(perturbed, 4), schema)

      val scored = fitted.transform(pdf)
        .select(features.map(col) :+ col("anomaly_score"): _*)

      // proximity kernel on z-space distance
      val dist2 = features.zipWithIndex.map { case (f, i) =>
        val z = (col(f) - lit(x0(i))) / lit(stds(i)); z * z
      }.reduce(_ + _)
      val kw = kernelWidth * math.sqrt(features.length)
      val weighted = scored.withColumn("__w", exp(-dist2 / lit(kw * kw)))

      val assembled = new VectorAssembler().setInputCols(features.toArray)
        .setOutputCol("__f").transform(weighted)
      val lr = new LinearRegression().setFeaturesCol("__f")
        .setLabelCol("anomaly_score").setWeightCol("__w")
        .setRegParam(1e-3)
      val m = lr.fit(assembled)
      Explanation(id, features.zipWithIndex.map { case (f, i) =>
        f -> m.coefficients(i)
      }.toMap)
    }
  }

  /** A10/A11-style aggregation: mean |weight| per feature across instances. */
  def importance(spark: SparkSession, explanations: Seq[Explanation],
                 features: Seq[String]): DataFrame = {
    import spark.implicits._
    explanations.flatMap(e => e.weights.map { case (f, w) => (f, math.abs(w)) })
      .toDF("feature", "absw")
      .groupBy($"feature").agg(avg($"absw").as("importance"))
      .orderBy($"importance".desc, $"feature")
  }
}
