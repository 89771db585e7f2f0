package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ROADMAP §6: verify AQE's runtime skew-join mitigation actually engages on
  * this build — the first line of defense at 100 TB before the explicit
  * [[Skew.saltedJoin]] (which exists for the extreme single-key case AQE's
  * partition-splitting cannot reach, e.g. one key larger than every other
  * partition combined on a non-broadcastable side). */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so a ~MB hot key counts as skewed in a unit test
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // enough partitions that the median is a NON-hot partition (with 2,
      // Spark's upper-median IS the hot one and nothing ever looks skewed)
      "spark.sql.shuffle.partitions" -> "10")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key + 10k spread over 999 keys; md5-hex padding is
      // incompressible enough that the hot partition's COMPRESSED shuffle
      // bytes (what AQE's skew detector sees) exceed the threshold
      val big = spark.range(0, 60000).select(
        when($"id" < 50000, lit(7L)).otherwise($"id" % 999 + 10L).as("k"),
        concat(md5($"id".cast("string")),
          md5(($"id" + 1).cast("string"))).as("pad"))
      val small = spark.range(0, 2000).select($"id".as("k"),
        ($"id" * 2).as("v"))
      val joined = big.join(small, "k")
      // collect() executes joined's OWN QueryExecution (count() would build
      // a fresh one and leave this plan un-finalized, isFinalPlan=false)
      val n = joined.collect().length
      assert(n == 60000, s"join result rows $n")

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
