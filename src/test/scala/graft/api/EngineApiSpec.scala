package graft.api

import graft.SparkSpec
import java.nio.file.Files

class EngineApiSpec extends SparkSpec {

  private lazy val csvPath: String = {
    val rng = new scala.util.Random(3)
    val sb = new StringBuilder("t,x,y,lbl\n")
    (0 until 600).foreach { i =>
      val anom = i % 29 == 7
      val x = if (anom) 400.0 + rng.nextGaussian() else 50.0 + rng.nextGaussian()
      sb.append(s"${1704067200 + i * 60},$x,${rng.nextGaussian()},${if (anom) 1 else 0}\n")
    }
    val f = Files.createTempFile("graft_api", ".csv")
    Files.writeString(f, sb.toString); f.toString
  }

  test("13-verb surface: run-batch → discovery → get-data → cancel") {
    val api = new EngineApi(spark, Files.createTempDirectory("graft_ds").toString)
    assert(api.getModels.contains("decision_tree"))
    assert(api.getInjectionMethods == Seq("spike", "lowered", "step", "offline", "custom"))
    assert(api.getDatasetColumns(csvPath) == Seq("t", "x", "y", "lbl"))

    val imported = api.importDataset(csvPath)
    assert(api.getDatasets.nonEmpty)

    val summary = api.runBatch("apitest", imported, "t", Some("lbl"),
      "decision_tree", Seq("x", "y"))
    assert(summary.status == "completed" && summary.rows == 600)
    assert(summary.metricsAll("accuracy") > 0.9)

    assert(api.getAllJobs.contains("job_batch_apitest"))
    assert(!api.getRunning.contains("job_batch_apitest")) // scored table exists
    assert(api.getColumns("apitest") ==
      Seq("timestamp", "x", "y", "label", "id"))
    assert(api.getData("apitest").count() == 600)

    api.cancelJob("apitest")
    assert(!api.getAllJobs.contains("job_batch_apitest"))
  }
}
