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
    timingsSec: Map[String, Double],
    xaiImportance: Map[String, Map[String, Double]] = Map.empty,
    xaiNdcg: Map[String, Double] = Map.empty,
    cvMetrics: Map[String, Double] = Map.empty)

/** XAI stage configuration (X1 parity: the reference's `xai_params`,
  * `Frontend/callbacks.py:1665-1708`). */
case class XaiConfig(
    features: Seq[String],
    methods: Seq[String] = Seq("permutation_importance"),
    ndcgK: Int = 3,
    nInstances: Int = 10)

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
          persistTable: Boolean = true,
          xai: Option[XaiConfig] = None): RunSummary = {
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

    // X1/X5: in-job explanation stage + NDCG vs injected ground truth
    val (xaiImp, xaiNdcg) = xai match {
      case Some(cfg) if detected.columns.contains("label") =>
        val tXai = now()
        val truth = injections.flatMap(_.columns).toSet
        val results = cfg.methods.map {
          case m @ "permutation_importance" =>
            val imp = graft.xai.Xai.permutationImportance(
              detected, fitted, cfg.features)
            m -> imp
          case m @ "nun_counterfactuals" =>
            val anoms = detected.filter(col("is_anomaly")).limit(cfg.nInstances)
            val normals = detected.filter(!col("is_anomaly")).limit(500)
            val cfs = graft.xai.Xai.nunCounterfactuals(
              anoms, normals, cfg.features)
            m -> graft.xai.Xai.counterfactualImportance(cfs, cfg.features)
          case m @ "per_timestep_importance" =>
            // X2 over sequences: per-(feature, lag) occlusion attribution on
            // flattened windows of the labeled anomalies, reduced to base
            // features (xai_runner.py:197-308)
            val fz = fitted match {
              case f: graft.ml.FittedWindowZScore => f
              case _ => throw new IllegalArgumentException(
                "per_timestep_importance requires a windowed detector (M1)")
            }
            val flat = Sequencer.flattenWindows(
              detected.drop("anomaly_score", "is_anomaly", "split"),
              fz.cfg.seriesCol, "timestamp", cfg.features, fz.cfg.L,
              orderTiebreak = Seq(col("id")))
            val perTs = graft.xai.Xai.perTimestepAttribution(
              flat.filter(col("label") === 1), fz.transformFlat,
              cfg.features, fz.cfg.L)
            m -> graft.xai.Xai.aggregateTimesteps(perTs)
          case m @ "random_counterfactuals" =>
            // X4 'random' DiCE mode; needs a per-row scorer, so windowed
            // detectors should use per_timestep_importance instead
            val clean = detected.drop("anomaly_score", "is_anomaly")
            val anoms = detected.filter(col("is_anomaly")).limit(cfg.nInstances)
              .drop("anomaly_score", "is_anomaly")
            val cfs = graft.xai.Xai.randomCounterfactuals(
              anoms, clean, fitted.transform, cfg.features)
            m -> graft.xai.Xai.counterfactualImportance(cfs, cfg.features)
          case m @ "genetic_counterfactuals" =>
            // X4 'genetic' DiCE mode: evolved validity/proximity/sparsity
            val clean = detected.drop("anomaly_score", "is_anomaly")
            val anoms = detected.filter(col("is_anomaly")).limit(cfg.nInstances)
              .drop("anomaly_score", "is_anomaly")
            val cfs = graft.xai.Xai.geneticCounterfactuals(
              anoms, clean, fitted.transform, cfg.features)
            m -> graft.xai.Xai.counterfactualImportance(cfs, cfg.features)
          case other => throw new IllegalArgumentException(s"xai method $other")
        }
        val imp = results.map { case (m, df) =>
          m -> df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        }.toMap
        val ndcg =
          if (truth.isEmpty) Map.empty[String, Double]
          else results.map { case (m, df) =>
            m -> graft.xai.Xai.ndcgVsInjected(df, truth, cfg.ndcgK)
          }.toMap
        timings += "xai" -> (now() - tXai) / 1e9
        (imp, ndcg)
      case _ => (Map.empty[String, Map[String, Double]], Map.empty[String, Double])
    }
    timings += "total" -> (now() - t0) / 1e9

    val cvMetrics = fitted match {
      case fs: graft.ml.FittedSupervised => fs.cvMetrics
      case _                             => Map.empty[String, Double]
    }

    data.unpersist(); detected.unpersist()
    RunSummary(jobName, "completed", rows, injectedRows, flagged,
      mTest, mAll, timings.toMap, xaiImp, xaiNdcg, cvMetrics)
  }

  /** S15: persist the summary as a one-record JSON file (the reference's
    * `/data/<job>/logfile`). */
  def writeSummary(spark: SparkSession, summary: RunSummary, path: String): Unit = {
    import spark.implicits._
    Seq(summary).toDS().coalesce(1).write.mode("overwrite").json(path)
  }

  /** X6: render the run's metrics + per-method feature importances as one
    * self-contained HTML file (inline CSS bars, no script, no deps) — the
    * engine-side equivalent of the reference's importance plots
    * (`Frontend/callbacks.py` XAI figures), produced as a data artifact a
    * dashboard can serve directly. */
  def writeReport(summary: RunSummary, file: String): Unit = {
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def fmt(d: Double) = f"$d%.4f"
    val metricsRows = (summary.metricsTest.toSeq.sortBy(_._1).map {
      case (k, v) => s"<tr><td>test.${esc(k)}</td><td>${fmt(v)}</td></tr>"
    } ++ summary.metricsAll.toSeq.sortBy(_._1).map {
      case (k, v) => s"<tr><td>all.${esc(k)}</td><td>${fmt(v)}</td></tr>"
    }).mkString("\n")
    val methods = summary.xaiImportance.toSeq.sortBy(_._1).map {
      case (method, imp) =>
        val mx = math.max(imp.values.map(math.abs).maxOption.getOrElse(1.0), 1e-12)
        val rows = imp.toSeq.sortBy(-_._2).map { case (f, v) =>
          val pct = (math.abs(v) / mx * 100).round
          s"""<tr><td>${esc(f)}</td><td>${fmt(v)}</td>
             |<td><div style="background:#47c;height:10px;width:$pct%"></div></td></tr>"""
            .stripMargin.replace("\n", "")
        }.mkString("\n")
        val ndcg = summary.xaiNdcg.get(method)
          .map(n => s"<p>NDCG vs injected ground truth: <b>${fmt(n)}</b></p>")
          .getOrElse("")
        s"""<h2>${esc(method)}</h2>$ndcg
           |<table border="1" cellspacing="0" cellpadding="4">
           |<tr><th>feature</th><th>importance</th><th></th></tr>
           |$rows</table>""".stripMargin
    }.mkString("\n")
    val html =
      s"""<!DOCTYPE html><html><head><meta charset="utf-8">
         |<title>graft run ${esc(summary.job)}</title></head>
         |<body style="font-family:sans-serif;max-width:48em">
         |<h1>Run ${esc(summary.job)} — ${esc(summary.status)}</h1>
         |<p>rows: ${summary.rows}, injected: ${summary.injectedRows},
         |flagged: ${summary.flaggedRows}</p>
         |<h2>Metrics</h2>
         |<table border="1" cellspacing="0" cellpadding="4">$metricsRows</table>
         |$methods
         |</body></html>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(file), html)
  }
}
