package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empty strings from repeated spaces") {
    val got = Seq("a  b   c", " x ", "").toDF("t")
      .select(TextOps.tokens($"t")).as[Seq[String]].collect()
    assert(got(0) == Seq("a", "b", "c"))
    assert(got(1) == Seq("x"))
    assert(got(2) == Seq.empty)
  }

  test("charShingles: all k-substrings; short strings yield one") {
    val got = Seq("abcdef", "ab").toDF("t")
      .select(TextOps.charShingles($"t", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("abc", "bcd", "cde", "def"))
    assert(got(1) == Seq("ab")) // substr(1,3) of "ab"
  }

  test("wordNgrams: sliding n-grams joined by space") {
    val got = Seq("the quick brown fox").toDF("t")
      .select(TextOps.wordNgrams(TextOps.tokens($"t"), 2)).as[Seq[String]].head()
    assert(got == Seq("the quick", "quick brown", "brown fox"))
  }

  test("langId picks the language with most stopword hits") {
    val got = Seq(
      "the cat is in the house and it is warm",
      "der hund ist nicht mit der katze und das ist gut",
      "le chat est la et il ne dort pas du tout",
      "xyzzy plugh quux").toDF("t")
      .select(TextOps.langId(TextOps.tokens($"t"))).as[String].collect()
    assert(got(0) == "en")
    assert(got(1) == "de")
    assert(got(2) == "fr")
    assert(got(3) == "und")
  }

  test("fingerprint is order-invariant over the token bag") {
    val got = Seq("b a c", "c b a", "a b c d").toDF("t")
      .select(TextOps.fingerprint(TextOps.tokens($"t"))).as[String].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("minhashSig equals min over per-shingle slices") {
    val df = Seq("hello world foo").toDF("t")
    val sh = TextOps.charShingles($"t", 4)
    val viaSig = df.select(TextOps.minhashSig(sh, 0)).as[String].head()
    val viaExplode = df.select(explode(sh).as("s"))
      .select(TextOps.minhashSlice($"s", 0).as("m"))
      .agg(min($"m")).as[String].head()
    assert(viaSig == viaExplode)
  }

  test("digest-based minhash/simhash equal the direct forms") {
    val df = Seq("hello world foo bar", "spark native engine").toDF("t")
    val sh = TextOps.charShingles($"t", 4)
    val direct = df.select((0 until 8).map(j => TextOps.minhashSig(sh, j)): _*)
      .collect().map(_.toSeq)
    val viaDg = df.withColumn("__dg", TextOps.minhashDigests(sh))
      .select((0 until 8).map(j => TextOps.minhashSigFromDigests($"__dg", j)): _*)
      .collect().map(_.toSeq)
    assert(direct.toSeq == viaDg.toSeq)
    val s1 = df.select(TextOps.simhash16(TextOps.tokens($"t"))).as[Long].collect()
    val s2 = df.withColumn("__dg", TextOps.md5Digests(TextOps.tokens($"t")))
      .select(TextOps.simhash16FromDigests($"__dg")).as[Long].collect()
    assert(s1.toSeq == s2.toSeq)
  }

  test("simhash16 is a 16-bit value, stable, and order-invariant") {
    val got = Seq("a b c d e", "e d c b a", "totally different words here")
      .toDF("t").select(TextOps.simhash16(TextOps.tokens($"t"))).as[Long].collect()
    assert(got.forall(s => s >= 0 && s < 65536))
    assert(got(0) == got(1)) // bag semantics → same bits
    assert(got(0) != got(2))
  }

  test("qualityScore stays in [0,1] and rewards stopword-rich prose") {
    val df = Seq(
      "the cat is in the house and it is warm today for everyone here",
      "zzz qqq").toDF("t")
    val got = df.select(TextOps.qualityScore($"t", TextOps.tokens($"t")))
      .as[Double].collect()
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1))
  }
}
