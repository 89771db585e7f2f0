package graft.expressions

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native expression == functions composition, incl. edge cases") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ab",              // shorter than k → single truncated shingle
      "abcde",           // exactly k
      "aaaaaaaaaa",      // repeated shingles
      "héllo wörld ünïcode text",  // multibyte chars
      "中文文本测试一二三四五")      // CJK
    val df = texts.toDF("text")
    val k = 5
    val sh = TextOps.charShingles($"text", k)
    val viaFns = df
      .withColumn("__dg", TextOps.minhashDigests(sh))
      .select(array((0 until 8).map(j =>
        TextOps.minhashSigFromDigests($"__dg", j)): _*))
      .as[Seq[String]].collect()
    val viaExpr = df.select(MinHashSigExpr.sigs($"text", k))
      .as[Seq[String]].collect()
    assert(viaFns.toSeq == viaExpr.toSeq)
  }

  test("null input yields null signature") {
    val df = Seq(Some("abc"), None).toDF("text")
    val got = df.select(MinHashSigExpr.sigs($"text", 5)).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  test("codegen and interpreted paths agree; projection stays in one " +
      "WholeStageCodegen span") {
    // file-backed source: ConvertToLocalRelation would eagerly (and
    // interpretedly) evaluate any projection over a LocalRelation
    val dir = java.nio.file.Files.createTempDirectory("graft_cg").toString
    Seq("the quick brown fox", "simhash codegen parity check",
      "héllo wörld", "").toDF("text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    def results() = df.select(
        MinHashSigExpr.sigs($"text", 5).as("sig"),
        Simhash64Expr.simhash64(split($"text", " ")).as("sh"))
      .collect().map(r => (r.getSeq[String](0), r.getLong(1))).toSeq

    val plan = df.select(MinHashSigExpr.sigs($"text", 5),
        Simhash64Expr.simhash64(split($"text", " ")))
      .queryExecution.executedPlan.toString
    // `*(1)` is the whole-stage-codegen marker in simple plan strings: the
    // projection holding both expressions compiled into span 1
    assert(plan.contains("*(1) Project"), plan)

    val viaCodegen = results()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(results() == viaCodegen)
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
