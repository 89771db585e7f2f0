package graft.expressions

import graft.SparkSpec
import graft.functions.Det
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL surface: graft functions callable from spark.sql") {
    GraftFunctions.register(spark)
    Seq(("the quick brown fox", 1L)).toDF("text", "id")
      .createOrReplaceTempView("gf_t")

    val sig = spark.sql(
      "SELECT graft_minhash_sig(text, 5) AS s FROM gf_t")
      .as[Seq[String]].head()
    assert(sig.length == 8 && sig.forall(_.matches("[0-9a-f]{8}")))

    val dur = spark.sql(
      "SELECT graft_duration_seconds('2days 5hours') AS d, " +
        "graft_duration_seconds('bogus') AS b").head
    assert(dur.getLong(0) == 190800L && dur.isNullAt(1))

    val fr = spark.sql("SELECT graft_frac(id, 42) AS f FROM gf_t")
      .as[Double].head()
    assert(fr == Det.fracHost(1L, 42L))
  }

  test("text-analysis SQL surface matches the Column API") {
    GraftFunctions.register(spark)
    Seq("the quick brown fox is fast", "der hund und die katze")
      .toDF("text").createOrReplaceTempView("gf_txt")
    val viaSql = spark.sql(
      """SELECT graft_langid(graft_tokens(text)) AS lang,
        |  graft_quality(text, graft_tokens(text)) AS q,
        |  graft_fingerprint(graft_tokens(text)) AS fp,
        |  graft_simhash64(graft_tokens(text)) AS sh
        |FROM gf_txt""".stripMargin).collect()
    val viaCols = spark.table("gf_txt").select(
      graft.text.TextOps.langId(graft.text.TextOps.tokens($"text")).as("lang"),
      graft.text.TextOps.qualityScore($"text",
        graft.text.TextOps.tokens($"text")).as("q"),
      graft.text.TextOps.fingerprint(graft.text.TextOps.tokens($"text")).as("fp"),
      Simhash64Expr.simhash64(graft.text.TextOps.tokens($"text")).as("sh"))
      .collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCols.map(_.toSeq).toSeq)
    assert(viaSql.map(_.getString(0)).toSeq == Seq("en", "de"))
  }

  test("curation-funnel SQL surface matches the Column API, all stages") {
    GraftFunctions.register(spark)
    def words(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    val texts = Seq("tiny doc", words("a", 60), words("####", 60),
      words("word", 60), words("word", 58) + " the and")
    texts.toDF("text").createOrReplaceTempView("gf_funnel")
    val viaSql = spark.sql(
      "SELECT graft_funnel_stage(text) AS st FROM gf_funnel")
      .as[Int].collect().toSeq
    val viaCol = spark.table("gf_funnel")
      .select(graft.text.TextOps.funnelStage($"text").as("st"))
      .as[Int].collect().toSeq
    assert(viaSql == Seq(1, 2, 3, 4, 0))
    assert(viaSql == viaCol)
  }

  test("native-kernel SQL surface: graft_dot and graft_zorder match the " +
      "Column API / host twins") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |  graft_dot(array(1.0d), array(cast(null as double))) AS dn,
        |  graft_dot(array(1.0d, 2.0d), array(1.0d)) AS dm""".stripMargin).head
    assert(d.getDouble(0) == 32.0 && d.isNullAt(1) && d.isNullAt(2))

    val z = spark.sql(
      "SELECT graft_zorder(8, 5L, 9L) AS z, graft_zorder(4, 3L, 3L, 3L) AS z3")
      .head
    assert(z.getLong(0) == graft.ops.ZOrder.interleaveHost(Seq(5L, 9L), 8))
    assert(z.getLong(1) == graft.ops.ZOrder.interleaveHost(Seq(3L, 3L, 3L), 4))
  }

  test("non-literal k/seed is rejected with a clear error") {
    GraftFunctions.register(spark)
    Seq(("x", 2)).toDF("text", "n").createOrReplaceTempView("gf_t2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(text, n) FROM gf_t2").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
