package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed gates for t28's CLOSED-FORM greedy BPE merge (merge at
  * i iff match ∧ even-length run of matches before i). The DuckDB oracle
  * proves cross-engine agreement but both engines evaluate the SAME
  * formula — a conceptual error in the parity rule would pass the oracle
  * and fail real BPE semantics. These cases pin the formula itself
  * against left-to-right greedy merging done by hand, including the
  * overlapping-run cases ("aaa", "aaaa", "aaaaa") that the rule exists
  * for. */
class BpeMergeSpec extends SparkSpec {

  private def mergeAll(cases: Seq[(String, String)]): Map[String, Seq[String]] = {
    import spark.implicits._
    cases.toDF("word", "pair")
      .withColumn("mm", expr(graft.queries.Curate.bpeMmSpark))
      .withColumn("md", expr(graft.queries.Curate.bpeMdSpark))
      .withColumn("syms", expr(graft.queries.Curate.bpeSymsSpark))
      .select($"word", $"syms")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
  }

  test("greedy left-to-right merge matches hand-computed BPE, " +
      "including overlapping runs") {
    val got = mergeAll(Seq(
      "aaa" -> "aa", "aaaa" -> "aa", "aaaaa" -> "aa", "aa" -> "aa",
      "a" -> "aa", "abab" -> "ab",
      "table" -> "bl", "xaay" -> "aa", "aabaa" -> "aa"))
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("aaaaa") == Seq("aa", "aa", "a"))
    assert(got("aa") == Seq("aa"))
    assert(got("a") == Seq("a"))
    assert(got("abab") == Seq("ab", "ab"))
    assert(got("table") == Seq("t", "a", "bl", "e"))
    assert(got("xaay") == Seq("x", "aa", "y"))
    assert(got("aabaa") == Seq("aa", "b", "aa"))
  }

  test("pair-specific: banana under 'an' vs 'na' merges different spans") {
    val gotAn = mergeAll(Seq("banana" -> "an"))
    assert(gotAn("banana") == Seq("b", "an", "an", "a"))
    val gotNa = mergeAll(Seq("banana" -> "na"))
    assert(gotNa("banana") == Seq("b", "a", "na", "na"))
  }
}
