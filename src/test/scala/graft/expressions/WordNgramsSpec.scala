package graft.expressions

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val rng = new scala.util.Random(7)
    val vocab = Vector("agg", "join", "scan", "window", "vector", "row", "x")
    (0 until 300).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(20))(vocab(rng.nextInt(vocab.size))))
    }.toDF("id", "toks")
  }

  test("native ngrams == the transform/slice/array_join composition " +
      "(incl. size<n partial gram and empty input)") {
    for (n <- Seq(1, 2, 3, 8)) {
      val got = docs.select($"id",
        TextOps.wordNgrams($"toks", n).as("nat"),
        TextOps.wordNgramsHof($"toks", n).as("hof"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"id=${r.getLong(0)} n=$n")
      }
    }
  }

  test("null tokens are skipped by the join, like array_join") {
    val df = Seq((1L, Seq(Some("a"), None, Some("b"), Some("c"))))
      .toDF("id", "toks")
    val got = df.select(TextOps.wordNgrams($"toks", 2).as("nat"),
      TextOps.wordNgramsHof($"toks", 2).as("hof")).head()
    assert(got.getSeq[String](0) == got.getSeq[String](1))
  }

  test("codegen and interpreted modes agree") {
    val interp = docs.select(TextOps.wordNgrams($"toks", 3)).collect()
      .map(_.getSeq[String](0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val noCg = docs.select(TextOps.wordNgrams($"toks", 3)).collect()
        .map(_.getSeq[String](0))
      assert(interp.toSeq == noCg.toSeq)
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
