package graft.xai

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.eval.Metrics
import graft.functions.Det
import graft.ml.FittedDetector

/** XAI capability layer (SURVEY §2.11). The reference's SHAP/LIME/DiCE
  * libraries have no JVM ports; we deliver the *capabilities* —
  * global feature attribution, per-instance counterfactuals, NDCG scoring
  * against injected ground truth — with Spark-native algorithms:
  *
  *  - X2 → [[permutationImportance]]: per-feature column scramble → metric
  *    drop. Each permutation is two window sorts + one scoring pass, fully
  *    distributed; F features ⇒ F passes over the data (embarrassingly
  *    parallel across features on a real cluster).
  *  - X4 → [[nunCounterfactuals]]: DiCE-kdtree equivalent — for each
  *    anomalous instance, the k nearest normal rows (scaled L2 distance),
  *    importance = how often each feature differs materially. A broadcast
  *    join + window top-k, no driver loops.
  *  - X5 → [[ndcgVsInjected]]: rank features by importance, relevance = 1
  *    for actually-injected columns (A8/J3).
  */
object Xai {

  /** Deterministically permute `feature` across rows: rows are ranked twice
    * (by stable id, by keyed-LCG of id) and the value moves from one rank to
    * the other — a partition-invariant derangement-ish shuffle. Both ranks
    * use [[graft.ops.Ranks]]' range-partitioned two-pass rank, so no row
    * funnels through a single-task global window. */
  def permuteColumn(df: DataFrame, idCol: String, feature: String,
                    seed: Long): DataFrame = {
    val donor = graft.ops.Ranks.globalRowNumber(
        df.select(col(feature).as("__perm_v"), col(idCol)),
        Seq(col(idCol)), "__rn")
      .select("__perm_v", "__rn")
    graft.ops.Ranks.globalRowNumber(df,
        Seq(Det.frac(col(idCol), seed), col(idCol)), "__rn")
      .join(donor, "__rn")
      .drop(feature, "__rn")
      .withColumnRenamed("__perm_v", feature)
  }

  /** X2: global importance of each feature = accuracy drop when that feature
    * is scrambled (labelCol = ground truth 0/1). Output: (feature,
    * importance) sorted desc. */
  def permutationImportance(df: DataFrame, fitted: FittedDetector,
                            features: Seq[String], idCol: String = "id",
                            labelCol: String = "label",
                            seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def accuracy(scored: DataFrame): Double =
      Metrics.confusion(scored, col("is_anomaly"), col(labelCol) === 1)
        .head.getAs[Double]("accuracy")
    val base = accuracy(fitted.transform(df))
    val rows = features.zipWithIndex.map { case (f, i) =>
      val permuted = permuteColumn(df, idCol, f, seed + i)
      (f, base - accuracy(fitted.transform(permuted)))
    }
    rows.toDF("feature", "importance").orderBy($"importance".desc, $"feature")
  }

  /** X4: for each row of `instances` (predicted anomalous), the k nearest
    * rows of `normals` by L2 over min-max-scaled features; returns one row
    * per (instance, neighbor) with the per-feature deltas, plus
    * `changed_<f>` flags (|scaled delta| > tau). */
  def nunCounterfactuals(instances: DataFrame, normals: DataFrame,
                         features: Seq[String], idCol: String = "id",
                         k: Int = 3, tau: Double = 0.1): DataFrame = {
    // global min/max for scale-invariant distance (one tiny agg, broadcast)
    val aggCols = features.flatMap(f => Seq(min(col(f)), max(col(f))))
    val statsRow = normals.unionByName(instances.select(normals.columns.map(col): _*))
      .agg(aggCols.head, aggCols.tail: _*).head
    val scaleOf = features.zipWithIndex.map { case (f, i) =>
      val lo = statsRow.getDouble(2 * i); val hi = statsRow.getDouble(2 * i + 1)
      f -> (if (hi > lo) hi - lo else 1.0)
    }.toMap
    def scaled(side: String, f: String): Column =
      col(s"$side.$f") / lit(scaleOf(f))
    val dist2 = features.map(f =>
      (scaled("a", f) - scaled("n", f)) * (scaled("a", f) - scaled("n", f)))
      .reduce(_ + _)
    val joined = instances.as("a")
      .join(broadcast(normals.as("n")), expr("1=1"))
      .withColumn("__d2", dist2)
    val w = Window.partitionBy(col(s"a.$idCol"))
      .orderBy(col("__d2"), col(s"n.$idCol"))
    val base = joined.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
    val deltaCols = features.flatMap { f =>
      Seq((col(s"n.$f") - col(s"a.$f")).as(s"delta_$f"),
        (abs(scaled("n", f) - scaled("a", f)) > tau).as(s"changed_$f"))
    }
    base.select(Seq(col(s"a.$idCol").as("instance_id"),
      col(s"n.$idCol").as("cf_id"), col("__rnk").as("rank"),
      sqrt(col("__d2")).as("distance")) ++ deltaCols: _*)
  }

  /** DiCE-style importance from counterfactuals: per feature, the fraction
    * of counterfactual rows that changed it (A10). */
  def counterfactualImportance(cfs: DataFrame, features: Seq[String]): DataFrame = {
    val spark = cfs.sparkSession
    import spark.implicits._
    val aggs = features.map(f =>
      avg(col(s"changed_$f").cast("double")).as(f))
    val row = cfs.agg(aggs.head, aggs.tail: _*).head
    features.zipWithIndex.map { case (f, i) => (f, row.getDouble(i)) }
      .toDF("feature", "importance").orderBy($"importance".desc, $"feature")
  }

  /** X5: NDCG@k of an importance table against the set of actually-injected
    * columns (relevance 1). */
  def ndcgVsInjected(importance: DataFrame, injectedColumns: Set[String],
                     k: Int): Double = {
    val withRel = importance
      .withColumn("rel",
        col("feature").isInCollection(injectedColumns.toSeq).cast("double"))
      .withColumn("grp", lit(1))
    Metrics.ndcgAtK(withRel, Seq("grp"), col("importance"), col("rel"),
      col("feature"), k).head.getAs[Double](s"ndcg_$k")
  }
}
