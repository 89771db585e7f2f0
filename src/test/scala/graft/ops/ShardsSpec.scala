package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.File

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("one parquet file per bin, pack order preserved inside each shard") {
    val docs = (1 to 200).map(i => (i.toLong, 10L + (i % 17))).toDF("doc_id", "n_tok")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val nShards = Shards.packAndWrite(docs, Seq($"doc_id"), $"n_tok",
      budget = 300L, outDir = out)

    val binDirs = new File(out).listFiles().filter(_.getName.startsWith("bin="))
    assert(binDirs.length.toLong == nShards && nShards > 1)
    binDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: expected 1 file, got ${files.length}")
    }

    // reading one shard back yields rows in pack (cum_tok) order
    val shard0 = spark.read.parquet(s"$out/bin=0")
    val cums = shard0.select($"cum_tok").collect().map(_.getLong(0))
    assert(cums.sameElements(cums.sorted), "intra-shard order")

    // every doc lands in exactly one shard and bins match the t6 recipe
    val all = spark.read.parquet(out)
    assert(all.count() == 200)
    val expected = Ranks.globalCumSum(docs, Seq($"doc_id"), $"n_tok", "cum_tok")
      .withColumn("bin", expr("(cum_tok - n_tok) div 300"))
      .select($"doc_id", $"bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = all.select($"doc_id", $"bin".cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
