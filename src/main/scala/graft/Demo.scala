package graft

import org.apache.spark.sql.SparkSession
import graft.api.EngineApi
import graft.inject.AnomalySetting
import java.nio.file.Files

/** End-to-end demo of the job API: generate a CSV, import it, run a batch
  * job with spike injection + decision tree, read data back, print the
  * summary. `runMain graft.Demo` — exits nonzero on any contract breach. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic unlabeled series: one sensor, 1 Hz, one day-ish
    val rng = new scala.util.Random(11)
    val sb = new StringBuilder("time,reading,aux\n")
    (0 until 5000).foreach { i =>
      sb.append(s"${1704067200 + i},${50 + 10 * math.sin(i / 40.0) + rng.nextGaussian()},${rng.nextGaussian()}\n")
    }
    val csv = Files.createTempFile("graft_demo", ".csv")
    Files.writeString(csv, sb.toString)

    val api = new EngineApi(spark, Files.createTempDirectory("graft_demo_ds").toString)
    val imported = api.importDataset(csv.toString)
    println(s"datasets: ${api.getDatasets}")
    println(s"models: ${api.getModels}")

    // inject a spike burst 1000s in, 120s long, then detect it supervised
    val inj = AnomalySetting("spike", 1704067200L + 1000, durationSec = 120,
      magnitude = 5.0, percentage = 90.0, columns = Seq("reading"))
    val summary = api.runBatch("demo", imported, "time", None,
      "decision_tree", Seq("reading", "aux"), Seq(inj))
    println(s"summary: $summary")

    val sample = api.getData("demo").limit(3)
    sample.show(truncate = false)
    assert(summary.rows == 5000, "row count")
    assert(summary.injectedRows > 80, s"injected ${summary.injectedRows}")
    assert(summary.metricsAll("recall_tpr") > 0.5,
      s"recall ${summary.metricsAll}")
    assert(api.getAllJobs.contains("job_batch_demo"), "catalog")
    api.cancelJob("demo")
    println("DEMO_OK")
    spark.stop()
  }
}
