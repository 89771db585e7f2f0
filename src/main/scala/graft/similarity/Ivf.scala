package graft.similarity

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF-style ANN: an MLlib k-means coarse quantizer replaces the random
  * hyperplanes of [[Vectors.lshBucket]] — data-adaptive cells give better
  * recall per probed candidate on clustered embeddings.
  *
  * Scale shape (the standard IVF layout): the index pass writes each vector
  * once with its cell id (partition/bucket by `cell` at the warehouse
  * level); queries probe their `nProbe` nearest centroids, turning search
  * into an equi-join on cell — candidates ≈ nProbe/k of the corpus, never a
  * cross product. Centroids are a tiny broadcast.
  */
case class IvfIndex(model: KMeansModel, k: Int) {

  /** Assign each vector its inverted-list cell. */
  def assign(df: DataFrame, vecCol: String): DataFrame =
    model.setFeaturesCol("__v").setPredictionCol("cell")
      .transform(df.withColumn("__v", array_to_vector(col(vecCol))))
      .drop("__v")

  /** Cells a query probes: its `nProbe` nearest centroids. `idCol` is the
    * caller's stable query key (a natural key, NOT a generated id — the
    * window below partitions on it and results must not depend on physical
    * partitioning). */
  def probeCells(df: DataFrame, vecCol: String, idCol: String,
                 nProbe: Int): DataFrame = {
    val spark = df.sparkSession
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }
    val cdf = spark.createDataFrame(centroids).toDF("cell", "centroid")
    val dist = Vectors.dot(col(vecCol), col(vecCol)) -
      lit(2.0) * Vectors.dot(col(vecCol), col("centroid")) +
      Vectors.dot(col("centroid"), col("centroid"))
    val w = Window.partitionBy(col(idCol)).orderBy(dist.asc, col("cell"))
    df.crossJoin(broadcast(cdf))
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= nProbe)
      .drop("__rnk", "centroid")
  }

  /** Top-k cosine ANN: probe cells, join inverted lists, rank in-cell. */
  def search(queries: DataFrame, indexed: DataFrame, queryVec: String,
             indexVec: String, queryId: String, indexId: String,
             topK: Int, nProbe: Int): DataFrame = {
    val probes = probeCells(queries, queryVec, queryId, nProbe)
      .select(col(queryId), col(queryVec), col("cell"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(indexId))
    probes.join(indexed.select(col(indexId), col(indexVec), col("cell")), "cell")
      .filter(col(queryId) =!= col(indexId))
      .withColumn("cos", Vectors.cosine(col(queryVec), col(indexVec)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col(queryId), col("rnk"), col(indexId), col("cos"))
  }
}

object Ivf {
  /** Train the coarse quantizer (centroids are model state — tiny). */
  def fit(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L): IvfIndex = {
    val km = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("cell")
    IvfIndex(km.fit(df.withColumn("__v", array_to_vector(col(vecCol)))), k)
  }
}

/** Oracle-able IVF: the coarse quantizer is k DATA vectors chosen by id
  * (medoid-style centroids) instead of trained k-means means, so every
  * stage — cell assignment, probe, in-cell search — is plain column
  * arithmetic with an exact SQL twin (no model state). Identical inverted-
  * list layout and costs to [[IvfIndex]]; [[Ivf.fit]] remains the
  * production quality path, this variant is the correctness gate for it. */
object FixedIvf {

  /** The k centroid rows as a tiny frame: (cell 0..k-1 dense by id order,
    * centroid vector). The k-row global window is trivially small. */
  def centroids(emb: DataFrame, idCol: String, vecCol: String,
                ids: Seq[Long]): DataFrame =
    emb.filter(col(idCol).isInCollection(ids))
      .select(col(idCol).as("__csrc"), col(vecCol).as("centroid"))
      .withColumn("cell",
        row_number().over(Window.orderBy(col("__csrc"))) - 1)
      .drop("__csrc")

  private def dist2(vec: Column): Column =
    Vectors.dot(vec, vec) -
      lit(2.0) * Vectors.dot(vec, col("centroid")) +
      Vectors.dot(col("centroid"), col("centroid"))

  /** Nearest-centroid cell per row (rank-1 of the k-way distance). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             cents: DataFrame): DataFrame =
    probe(df, idCol, vecCol, cents, nProbe = 1)

  /** The `nProbe` nearest cells per row. */
  def probe(df: DataFrame, idCol: String, vecCol: String, cents: DataFrame,
            nProbe: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(dist2(col(vecCol)).asc, col("cell"))
    df.crossJoin(broadcast(cents))
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= nProbe)
      .drop("__rnk", "centroid")
  }

  /** Top-k cosine ANN over the fixed quantizer — same join shape as
    * [[IvfIndex.search]]. */
  def search(queries: DataFrame, indexed: DataFrame, queryVec: String,
             indexVec: String, queryId: String, indexId: String,
             cents: DataFrame, topK: Int, nProbe: Int): DataFrame = {
    val probes = probe(queries, queryId, queryVec, cents, nProbe)
      .select(col(queryId), col(queryVec), col("cell"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos").desc, col(indexId))
    probes.join(indexed.select(col(indexId), col(indexVec), col("cell")), "cell")
      .filter(col(queryId) =!= col(indexId))
      .withColumn("cos", Vectors.cosine(col(queryVec), col(indexVec)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col(queryId), col("rnk"), col(indexId), col("cos"))
  }
}
