package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Windowed unsupervised detector — the M1 capability (reference: LSTM
  * autoencoder reconstruction error over stride-1 windows,
  * `Backend/ML_models/lstm.py:14-388`) delivered with Spark-native windowed
  * statistics instead of a neural net:
  *
  *   score(row) = Σ_f z_f²  where z_f = (x_f − rollmean_f) / rollstd_f over
  *   the trailing L rows; threshold = p95 (A6) of scores on the calibration
  *   tail of the training split (reference uses the last 20%,
  *   `lstm.py:128-147`); first L−1 rows have no full window ⇒ never flagged
  *   (W6 warm-up parity by construction).
  *
  * Everything is window aggregates + expressions: one sort-shuffle on the
  * (optional) series key, whole-stage codegen throughout, no model state to
  * broadcast. At 100 TB provide `seriesCol` (or a coarse time-bucket key) so
  * the window never funnels into a single task.
  */
case class WindowZScoreDetector(
    features: Seq[String],
    tsCol: String = "timestamp",
    seriesCol: Option[String] = None,
    L: Int = 10,
    calibrationFraction: Double = 0.2,
    percentile: Double = 0.95) extends AnomalyDetector {

  private def w = seriesCol.map(c => Window.partitionBy(col(c)))
    .getOrElse(Window.partitionBy())
    .orderBy(col(tsCol))
    .rowsBetween(-(L - 1), Window.currentRow)

  /** Rolling-z score column; null while the window is incomplete (warm-up). */
  private[ml] def scoreCol: Column = {
    val full = count(lit(1)).over(w) === L
    val z2 = features.map { f =>
      val m = avg(col(f)).over(w)
      val sd = stddev_samp(col(f)).over(w)
      val z = (col(f) - m) / when(sd > 1e-12, sd).otherwise(lit(1.0))
      z * z
    }.reduce(_ + _)
    when(full, z2).otherwise(lit(null))
  }

  def fit(train: DataFrame): FittedDetector = {
    val scored = train.withColumn("__s", scoreCol).filter(col("__s").isNotNull)
    // calibration = most-recent fraction of the training split (W4 parity)
    val withRank = scored.withColumn("__pr",
      percent_rank().over(seriesCol.map(c => Window.partitionBy(col(c)))
        .getOrElse(Window.partitionBy()).orderBy(col(tsCol))))
    val cal = withRank.filter(col("__pr") >= 1.0 - calibrationFraction)
    val thr = cal.agg(expr(s"percentile(__s, $percentile)")).head.getDouble(0)
    FittedWindowZScore(this, thr)
  }
}

case class FittedWindowZScore(cfg: WindowZScoreDetector, threshold: Double)
    extends FittedDetector {
  def transform(df: DataFrame): DataFrame =
    df.withColumn("anomaly_score", cfg.scoreCol)
      .withColumn("is_anomaly",
        coalesce(col("anomaly_score") > threshold, lit(false)))

  /** Score a flattened-window frame ([[graft.window.Sequencer.flattenWindows]]
    * columns `<f>_tm<j>`) — the same Σ_f z² as [[transform]], but computed
    * from the window's own lag cells instead of a window function. Pure
    * per-row expressions (no shuffle), so per-timestep XAI can perturb a
    * single (feature, lag) cell and re-score; on a complete window the score
    * is identical to the windowed form up to float association order. */
  def transformFlat(flat: DataFrame): DataFrame = {
    val z2 = cfg.features.map { f =>
      val cells = (0 until cfg.L).map(j => col(s"${f}_tm$j"))
      val m = cells.reduce(_ + _) / lit(cfg.L.toDouble)
      val variance = cells.map(v => (v - m) * (v - m)).reduce(_ + _) /
        lit((cfg.L - 1).toDouble)
      val sd = sqrt(variance)
      val z = (col(s"${f}_tm0") - m) / when(sd > 1e-12, sd).otherwise(lit(1.0))
      z * z
    }.reduce(_ + _)
    flat.withColumn("anomaly_score", z2)
      .withColumn("is_anomaly",
        coalesce(col("anomaly_score") > threshold, lit(false)))
  }
}
