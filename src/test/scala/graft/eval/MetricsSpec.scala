package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("confusion matches a hand-computed matrix (A3/A4)") {
    // 10 rows: tp=2, tn=4, fp=1, fn=3
    val df = Seq(
      (true, true), (true, true),                       // tp
      (false, false), (false, false), (false, false), (false, false), // tn
      (true, false),                                    // fp
      (false, true), (false, true), (false, true)       // fn
    ).toDF("pred", "actual")
    val m = Metrics.confusion(df, $"pred", $"actual").head
    assert(m.getAs[Long]("tp") == 2 && m.getAs[Long]("tn") == 4)
    assert(m.getAs[Long]("fp") == 1 && m.getAs[Long]("fn") == 3)
    assert(m.getAs[Long]("total_predictions") == 10)
    assert(m.getAs[Double]("accuracy") == 0.6)       // (2+4)/10
    assert(m.getAs[Double]("precision") == 0.6667)   // 2/3 → 4dp
    assert(m.getAs[Double]("recall_tpr") == 0.4)     // 2/5
    assert(m.getAs[Double]("f1_score") == 0.5)       // 2*2/3*2/5 / (2/3+2/5)
    assert(m.getAs[Double]("specificity_tnr") == 0.8) // 4/5
  }

  test("confusion handles degenerate all-negative input (0-div guards)") {
    val df = Seq((false, false), (false, false)).toDF("pred", "actual")
    val m = Metrics.confusion(df, $"pred", $"actual").head
    assert(m.getAs[Double]("precision") == 0.0)
    assert(m.getAs[Double]("recall_tpr") == 0.0)
    assert(m.getAs[Double]("f1_score") == 0.0)
    assert(m.getAs[Double]("accuracy") == 1.0)
  }

  test("ndcgAtK matches hand-computed DCG (A8)") {
    // one group; scores rank items a>b>c>d; rel: a=1, b=0, c=1, d=0
    // DCG@3  = 1/log2(2) + 0 + 1/log2(4) = 1 + 0.5 = 1.5
    // IDCG@3 = 1/log2(2) + 1/log2(3)     = 1 + 0.6309297535714575
    val df = Seq(
      ("g", 4.0, 1.0, 1L), ("g", 3.0, 0.0, 2L),
      ("g", 2.0, 1.0, 3L), ("g", 1.0, 0.0, 4L)).toDF("grp", "score", "rel", "id")
    val got = Metrics.ndcgAtK(df, Seq("grp"), $"score", $"rel", $"id", 3)
      .head.getAs[Double]("ndcg_3")
    val expected = 1.5 / (1.0 + 1.0 / (math.log(3) / math.log(2)))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("ndcgAtK: zero relevance gives 0, perfect ranking gives 1") {
    val zero = Seq(("g", 2.0, 0.0, 1L), ("g", 1.0, 0.0, 2L))
      .toDF("grp", "score", "rel", "id")
    assert(Metrics.ndcgAtK(zero, Seq("grp"), $"score", $"rel", $"id", 3)
      .head.getAs[Double]("ndcg_3") == 0.0)
    val perfect = Seq(("g", 2.0, 1.0, 1L), ("g", 1.0, 0.0, 2L))
      .toDF("grp", "score", "rel", "id")
    assert(Metrics.ndcgAtK(perfect, Seq("grp"), $"score", $"rel", $"id", 3)
      .head.getAs[Double]("ndcg_3") == 1.0)
  }
}
