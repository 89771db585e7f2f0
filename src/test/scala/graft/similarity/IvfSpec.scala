package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered synthetic embeddings: 8 gaussian clusters in 16-d. */
  private lazy val emb = {
    val rng = new scala.util.Random(31)
    val centers = Array.fill(8, 16)(rng.nextGaussian() * 5)
    (0 until 800).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.5).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("IVF ANN: high recall vs brute force at nProbe=2 of k=8") {
    val index = Ivf.fit(emb, "embedding", k = 8)
    val indexed = index.assign(emb, "embedding").cache()
    assert(indexed.select("cell").distinct().count() == 8)

    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val got = index.search(queries, indexed.select($"vec_id".as("c_id"),
        $"embedding".as("cv"), $"cell"),
        "qv", "cv", "q_id", "c_id", topK = 5, nProbe = 2)
      .select($"q_id", $"c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // brute-force ground truth
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"c_id")
    val truth = emb.select($"vec_id".as("c_id"), $"embedding".as("cv"))
      .crossJoin(broadcast(queries))
      .filter($"q_id" =!= $"c_id")
      .withColumn("cos", Vectors.cosine($"qv", $"cv"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"q_id", $"c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall > 0.9, s"mean recall@5 = $meanRecall")
    indexed.unpersist()
  }

  test("residual-quantized IVF: 16-byte index rows, refined recall > 0.8") {
    val index = IvfRq.fit(emb, "vec_id", "embedding", k = 8, k2 = 64)
    val encoded = index.encode(emb.select($"vec_id".as("c_id"),
      $"embedding".as("cv")), "c_id", "cv").cache()
    // compression contract: only (id, cell, code, recNorm) — no vectors
    assert(encoded.columns.toSet == Set("c_id", "cell", "code", "recNorm"))
    assert(encoded.count() == 800)

    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val got = index.search(queries, encoded,
        emb.select($"vec_id".as("c_id"), $"embedding".as("cv")),
        "q_id", "qv", "c_id", "cv", topK = 5, nProbe = 2, refine = 8)
      .select($"q_id", $"c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"c_id")
    val truth = emb.select($"vec_id".as("c_id"), $"embedding".as("cv"))
      .crossJoin(broadcast(queries))
      .filter($"q_id" =!= $"c_id")
      .withColumn("cos", Vectors.cosine($"qv", $"cv"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"q_id", $"c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall > 0.8, s"RQ mean recall@5 = $meanRecall")
    encoded.unpersist()
  }
}
