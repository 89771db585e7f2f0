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
}
