package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{PCA, PCAModel, StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.{DenseMatrix, Vector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M3 capability (reference: dense autoencoder → OneClassSVM,
  * `Backend/ML_models/svm.py:15-290`): dimensionality-reduce → one-class
  * boundary → quantile threshold, delivered Spark-native as
  * scale → PCA(k) → reconstruction error → (1-nu)-quantile threshold (A6).
  *
  * The principal matrix is a tiny broadcast (d×k doubles); the error pass
  * is a per-row UDF over the scaled vector — linear, stateless,
  * cluster-parallel. Contract parity with the reference: `anomaly_score` =
  * reconstruction error (higher = anomalous), `is_anomaly` = score >
  * threshold calibrated to flag ~nu of the training data. */
case class PcaDetector(
    features: Seq[String],
    k: Int = 2,
    nu: Double = 0.05) extends AnomalyDetector {

  /** Shared scale→PCA pipeline fit — also the inner model of
    * [[WindowPcaDetector]], which thresholds differently (calibration-tail
    * percentile instead of the training-wide nu-quantile). */
  private[ml] def fitPipeline(train: DataFrame): (org.apache.spark.ml.PipelineModel, DenseMatrix) = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__fvec")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("__fvec").setOutputCol("__scaled").setWithMean(true)
    val pca = new PCA().setK(math.min(k, features.length))
      .setInputCol("__scaled").setOutputCol("__pc")
    val model = new Pipeline().setStages(Array(assembler, scaler, pca)).fit(train)
    (model, model.stages.last.asInstanceOf[PCAModel].pc)
  }

  def fit(train: DataFrame): FittedDetector = {
    val (model, pc) = fitPipeline(train)
    val scored = scoreFrame(model.transform(train), pc)
    val thr = scored.agg(expr(s"percentile(__err, ${1.0 - nu})")).head.getDouble(0)
    FittedPca(model, pc, thr)
  }

  private[ml] def scoreFrame(transformed: DataFrame, pc: DenseMatrix): DataFrame = {
    val errUdf = udf { x: Vector =>
      // err = ||x - P Pᵀ x||²  (P = d×k principal matrix)
      val d = pc.numRows; val kk = pc.numCols
      val z = Array.ofDim[Double](kk)
      var j = 0
      while (j < kk) {
        var s = 0.0; var i = 0
        while (i < d) { s += pc(i, j) * x(i); i += 1 }
        z(j) = s; j += 1
      }
      var err = 0.0; var i = 0
      while (i < d) {
        var xi = 0.0; var jj = 0
        while (jj < kk) { xi += pc(i, jj) * z(jj); jj += 1 }
        val r = x(i) - xi; err += r * r; i += 1
      }
      err
    }
    transformed.withColumn("__err", errUdf(col("__scaled")))
  }
}

case class FittedPca(model: org.apache.spark.ml.PipelineModel,
                     pc: DenseMatrix, threshold: Double) extends FittedDetector {
  def transform(df: DataFrame): DataFrame = {
    val cfg = PcaDetector(Nil) // scoreFrame only uses pc
    cfg.scoreFrame(model.transform(df), pc)
      .withColumn("anomaly_score", col("__err"))
      .withColumn("is_anomaly", col("__err") > threshold)
      .drop("__fvec", "__scaled", "__pc", "__err")
  }
}
