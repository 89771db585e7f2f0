package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Residual-quantized IVF (the compressed-inverted-list leg of the ANN
  * story; ROADMAP §4 "residual quantization"): after coarse assignment,
  * each vector's RESIDUAL (v − centroid[cell]) is quantized to the nearest
  * of `k2` residual codewords (one-level RVQ — the single-codebook form of
  * IVF-PQ, Jégou et al. 2011, "Product Quantization for Nearest Neighbor
  * Search"). An indexed row is then just `(id, cell, code, recNorm)` —
  * ~16 bytes instead of `dim` floats. At 100 TB that is the difference
  * between inverted lists that fit in executor memory and ones that don't.
  *
  * Search never touches raw index vectors until the refine step:
  *  1. probe `nProbe` cells per query (broadcast centroid table);
  *  2. candidates = equi-join on cell against the ENCODED (16-byte) rows;
  *  3. approximate score from broadcast-only arithmetic:
  *     cos(q, centroid + codeword) = (q·centroid + q·codeword) /
  *     (|q| · recNorm) — q·centroid and q·codeword come from two tiny
  *     per-query broadcast joins (k and k2 rows);
  *  4. keep the top `refine × topK` per query by approximate score, fetch
  *     ONLY those vectors (a semi-join-sized lookup), rank by exact cosine.
  */
case class IvfRqIndex(
    centroids: Array[Array[Double]],
    codewords: Array[Array[Double]]) {

  private def toDf(spark: org.apache.spark.sql.SparkSession,
                   arr: Array[Array[Double]], idName: String, vecName: String) = {
    import spark.implicits._
    arr.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF(idName, vecName)
  }

  /** Encode: each row compresses to (idCol, cell, code, recNorm). */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val cents = toDf(spark, centroids, "cell", "__cent")
    val codes = toDf(spark, codewords, "code", "__cw")
    // nearest centroid
    val wCell = Window.partitionBy(col(idCol))
      .orderBy(Vectors.dot(col(vecCol), col(vecCol)) -
        lit(2.0) * Vectors.dot(col(vecCol), col("__cent")) +
        Vectors.dot(col("__cent"), col("__cent")), col("cell"))
    val assigned = df.crossJoin(broadcast(cents))
      .withColumn("__r", row_number().over(wCell)).filter(col("__r") === 1)
      .drop("__r")
      .withColumn("__res",
        graft.expressions.VecCombExpr.sub(col(vecCol), col("__cent")))
    // nearest residual codeword + norm of the reconstruction
    val wCode = Window.partitionBy(col(idCol))
      .orderBy(Vectors.dot(col("__res"), col("__res")) -
        lit(2.0) * Vectors.dot(col("__res"), col("__cw")) +
        Vectors.dot(col("__cw"), col("__cw")), col("code"))
    assigned.crossJoin(broadcast(codes))
      .withColumn("__r", row_number().over(wCode)).filter(col("__r") === 1)
      .withColumn("__rec",
        graft.expressions.VecCombExpr.add(col("__cent"), col("__cw")))
      .select(col(idCol), col("cell"), col("code"),
        Vectors.norm(col("__rec")).as("recNorm"))
  }

  /** Top-k cosine ANN: approximate rank on encoded rows, exact refine. */
  def search(queries: DataFrame, encoded: DataFrame, fullVectors: DataFrame,
             queryId: String, queryVec: String, indexId: String,
             indexVec: String, topK: Int, nProbe: Int,
             refine: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val cents = toDf(spark, centroids, "cell", "__cent")
    val codes = toDf(spark, codewords, "code", "__cw")

    // per-query dot with every centroid (k rows each) — also yields probes
    val qc = queries.crossJoin(broadcast(cents))
      .select(col(queryId), col(queryVec), col("cell"),
        Vectors.dot(col(queryVec), col("__cent")).as("__qdc"),
        (Vectors.dot(col(queryVec), col(queryVec)) -
          lit(2.0) * Vectors.dot(col(queryVec), col("__cent")) +
          Vectors.dot(col("__cent"), col("__cent"))).as("__d2"))
    val probes = qc
      .withColumn("__r", row_number().over(Window.partitionBy(col(queryId))
        .orderBy(col("__d2"), col("cell"))))
      .filter(col("__r") <= nProbe)
      .select(col(queryId), col(queryVec), col("cell"), col("__qdc"))
    // per-query dot with every codeword (k2 rows each)
    val qw = queries.crossJoin(broadcast(codes))
      .select(col(queryId).as("__qid2"), col("code").as("__code2"),
        Vectors.dot(col(queryVec), col("__cw")).as("__qdw"))
    val qn = queries.select(col(queryId).as("__qid3"),
      Vectors.norm(col(queryVec)).as("__qn"))

    // candidates: encoded rows in probed cells; approx score from the
    // reconstruction identity — no index vectors touched
    val cand = probes
      .join(encoded, "cell")
      .filter(col(queryId) =!= col(indexId))
      .join(broadcast(qw),
        col(queryId) === col("__qid2") && col("code") === col("__code2"))
      .join(broadcast(qn), col(queryId) === col("__qid3"))
      .withColumn("__approx",
        (col("__qdc") + col("__qdw")) /
          when(col("__qn") * col("recNorm") > 0.0,
            col("__qn") * col("recNorm")).otherwise(lit(1.0)))
      .withColumn("__ar", row_number().over(Window.partitionBy(col(queryId))
        .orderBy(col("__approx").desc, col(indexId))))
      .filter(col("__ar") <= topK * refine)
      .select(col(queryId), col(queryVec), col(indexId))

    // exact refine: fetch only the short-listed vectors
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(indexId))
    cand.join(fullVectors.select(col(indexId), col(indexVec)), indexId)
      .withColumn("cos", Vectors.cosine(col(queryVec), col(indexVec)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col(queryId), col("rnk"), col(indexId), col("cos"))
  }
}

object IvfRq {

  /** Oracle-able fit (the [[graft.similarity.FixedIvf]] recipe extended to
    * the residual stage): centroids are k chosen DATA vectors, codewords
    * are the residuals of k2 OTHER chosen rows against their nearest
    * centroid. All 2k rows are collected once (tiny); the host arithmetic
    * below replicates the engine fold order exactly (left-to-right double
    * accumulation from 0.0, ties to the lowest cell), so a DuckDB oracle
    * can rebuild both codebooks as pure SQL. [[fit]] stays the production
    * path; this gates [[IvfRqIndex.encode]]/[[IvfRqIndex.search]] — which
    * run identically under either codebook source. */
  def fixed(emb: DataFrame, idCol: String, vecCol: String,
            centroidIds: Seq[Long], codewordIds: Seq[Long]): IvfRqIndex = {
    import org.apache.spark.sql.functions.col
    val byId = emb.filter(col(idCol).isInCollection(centroidIds ++ codewordIds))
      .select(col(idCol), col(vecCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    val cents = centroidIds.sorted.map(byId).toArray
    def dotH(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cws = codewordIds.sorted.map { id =>
      val v = byId(id)
      val cell = cents.zipWithIndex.minBy { case (c, i) =>
        (dotH(v, v) - 2.0 * dotH(v, c) + dotH(c, c), i)
      }._2
      v.zip(cents(cell)).map { case (x, c) => x - c }
    }.toArray
    IvfRqIndex(cents, cws)
  }

  /** Two-stage fit: k-means coarse quantizer, then k-means on the
    * residuals. Both codebooks are tiny driver state (k·dim + k2·dim
    * doubles) broadcast into every later plan. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, k2: Int,
          seed: Long = 42L): IvfRqIndex = {
    val km = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("cell")
    val model = km.fit(df.withColumn("__v", array_to_vector(col(vecCol))))
    val cents = model.clusterCenters.map(_.toArray)

    val spark = df.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }
      .toDF("cell", "__cent")
    val wCell = Window.partitionBy(col(idCol))
      .orderBy(Vectors.dot(col(vecCol), col(vecCol)) -
        lit(2.0) * Vectors.dot(col(vecCol), col("__cent")) +
        Vectors.dot(col("__cent"), col("__cent")), col("cell"))
    val residuals = df.crossJoin(broadcast(cdf))
      .withColumn("__r", row_number().over(wCell)).filter(col("__r") === 1)
      .withColumn("__res",
        graft.expressions.VecCombExpr.sub(col(vecCol), col("__cent")))
      .select(col("__res"))
    val km2 = new KMeans().setK(k2).setSeed(seed + 1)
      .setFeaturesCol("__v").setPredictionCol("code")
    val model2 = km2.fit(residuals.withColumn("__v", array_to_vector(col("__res"))))
    IvfRqIndex(cents, model2.clusterCenters.map(_.toArray))
  }
}
