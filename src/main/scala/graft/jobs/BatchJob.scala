package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.eval.Metrics
import graft.inject.{AnomalySetting, Injector}
import graft.ingest.Ingest
import graft.ml.AnomalyDetector
import graft.window.Sequencer

/** Per-job run summary (S15; reference writes `/data/<job>/logfile`,
  * `Backend/execute_calls.py:870-903`). */
case class RunSummary(
    job: String,
    status: String,
    rows: Long,
    injectedRows: Long,
    flaggedRows: Long,
    metricsTest: Map[String, Double],
    metricsAll: Map[String, Double],
    timingsSec: Map[String, Double])

/** The `run-batch` lifecycle (SURVEY §3.1) as one declarative driver-side
  * flow: normalize → inject → persist job table → temporal split → fit →
  * detect → flag write-back → metrics → summary. Each stage is a DataFrame
  * transformation; the only driver materializations are scalar aggregates
  * (counts, metrics) and bounded model state. */
object BatchJob {

  def run(spark: SparkSession,
          jobName: String,
          raw: DataFrame,
          timeColumn: String,
          labelColumn: Option[String],
          injections: Seq[AnomalySetting],
          detector: AnomalyDetector,
          trainRatio: Double = 0.85,
          persistTable: Boolean = true): RunSummary = {
    def now() = System.nanoTime()
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val t0 = now()

    // ingest + inject (the reference's "simulation" stage)
    val tSim = now()
    val normalized = Ingest.normalize(raw, timeColumn, labelColumn)
    val injected =
      if (injections.isEmpty) normalized
      else Injector.injectAll(normalized, "id", "timestamp", injections)
    val table = s"job_batch_$jobName"
    if (persistTable) Ingest.writeJobTable(injected, table)
    val data = (if (persistTable) spark.table(table) else injected).cache()
    val rows = data.count()
    timings += "simulation" -> (now() - tSim) / 1e9

    // W3 temporal split + training
    val tTrain = now()
    val split = Sequencer.temporalSplit(data, Seq(col("timestamp"), col("id")), trainRatio)
    val train = split.filter(col("split") === "train")
    val fitted = detector.fit(train)
    timings += "training" -> (now() - tTrain) / 1e9

    // detection on the full table (reference detects test + all;
    // test-split metrics below reuse the same pass)
    val tDet = now()
    val detected = fitted.transform(split).cache()
    val flagged = detected.filter(col("is_anomaly")).count()
    timings += "detection" -> (now() - tDet) / 1e9

    // J2 write-back: single overwrite with the new flag column
    if (persistTable) {
      val out = detected.drop("split", "anomaly_score")
      out.write.mode("overwrite").format("parquet")
        .saveAsTable(table + "_scored")
    }

    // A3/A4 metrics on test split and on everything (needs a label)
    def metricsOf(df: DataFrame): Map[String, Double] =
      if (!df.columns.contains("label")) Map.empty
      else {
        val row = Metrics.confusion(df, col("is_anomaly"), col("label") === 1).head
        row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
          f -> row.get(i).toString.toDouble
        }.toMap
      }
    val mTest = metricsOf(detected.filter(col("split") === "test"))
    val mAll = metricsOf(detected)
    val injectedRows = data.filter(col("injected_anomaly")).count()
    timings += "total" -> (now() - t0) / 1e9

    data.unpersist(); detected.unpersist()
    RunSummary(jobName, "completed", rows, injectedRows, flagged,
      mTest, mAll, timings.toMap)
  }
}
