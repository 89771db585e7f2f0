package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Native Isolation Forest (M2; reference wraps sklearn,
  * `Backend/ML_models/isolation_forest.py:9-173`; algorithm: Liu, Ting, Zhou,
  * "Isolation Forest", ICDM 2008 — public method).
  *
  * Scale shape: each tree trains on ≤256 sampled rows, so the whole forest
  * fits in kilobytes — train driver-side on a bounded `sample`, broadcast the
  * forest, score distributed via a UDF over the feature array. No state ever
  * exceeds the sample; scoring is a linear scan (this is exactly how you'd
  * run it on 100 TB: the model is tiny, the data pass is embarrassingly
  * parallel).
  *
  * Contract parity: score = 2^(-E[h(x)]/c(n)) (higher = more anomalous);
  * threshold = (1-contamination) quantile of training scores (A6);
  * `is_anomaly` = score > threshold.
  */
object IsolationForest {
  sealed trait Node extends Serializable
  case class Leaf(size: Int) extends Node
  case class Split(attr: Int, value: Double, lo: Node, hi: Node) extends Node

  /** Average unsuccessful-search path length in a BST of n nodes. */
  def c(n: Double): Double =
    if (n <= 1.0) 0.0 else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  def grow(rows: Array[Array[Double]], depth: Int, maxDepth: Int,
           rng: Random): Node = {
    if (rows.length <= 1 || depth >= maxDepth) Leaf(rows.length)
    else {
      val nAttr = rows(0).length
      // pick among attributes that still vary
      val candidates = (0 until nAttr).filter { a =>
        val v = rows.map(_(a)); v.max > v.min
      }
      if (candidates.isEmpty) Leaf(rows.length)
      else {
        val attr = candidates(rng.nextInt(candidates.length))
        val vals = rows.map(_(attr))
        val (lo, hi) = (vals.min, vals.max)
        val split = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = rows.partition(_(attr) < split)
        if (l.isEmpty || r.isEmpty) Leaf(rows.length)
        else Split(attr, split, grow(l, depth + 1, maxDepth, rng),
          grow(r, depth + 1, maxDepth, rng))
      }
    }
  }

  def pathLength(x: Array[Double], node: Node, depth: Int): Double = node match {
    case Leaf(size)  => depth + c(size.toDouble)
    case Split(a, v, lo, hi) =>
      if (x(a) < v) pathLength(x, lo, depth + 1) else pathLength(x, hi, depth + 1)
  }
}

case class IsolationForestDetector(
    features: Seq[String],
    nTrees: Int = 100,
    sampleSize: Int = 256,
    contamination: Double = 0.1,
    seed: Long = 42L) extends AnomalyDetector {
  import IsolationForest._

  def fit(train: DataFrame): FittedDetector = {
    val n = train.count()
    // bounded driver-side sample: at most nTrees*sampleSize rows regardless
    // of input scale (the 100 TB invariant)
    val want = (nTrees.toLong * sampleSize).min(n)
    val frac = math.min(1.0, want.toDouble * 1.2 / math.max(n, 1L))
    val sampled = train
      .select(features.map(f => coalesce(col(f).cast("double"), lit(0.0))): _*)
      .sample(withReplacement = false, frac, seed)
      .limit(want.toInt)
      .collect().map(r => Array.tabulate(features.length)(r.getDouble))
    require(sampled.nonEmpty, "empty training sample")

    val rng = new Random(seed)
    val maxDepth = math.ceil(math.log(sampleSize.toDouble) / math.log(2.0)).toInt
    val trees = Array.fill(nTrees) {
      val sub = Array.fill(math.min(sampleSize, sampled.length))(
        sampled(rng.nextInt(sampled.length)))
      grow(sub, 0, maxDepth, rng)
    }
    val cn = c(math.min(sampleSize, sampled.length).toDouble)

    // threshold = (1-contamination) quantile of scores on the sample
    val sampleScores = sampled.map(x =>
      math.pow(2.0, -trees.map(t => pathLength(x, t, 0)).sum / trees.length / cn))
    val sorted = sampleScores.sorted
    val idx = math.min(sorted.length - 1,
      math.max(0, math.ceil((1.0 - contamination) * sorted.length).toInt - 1))
    val threshold = sorted(idx)
    FittedIsolationForest(features, trees, cn, threshold)
  }
}

case class FittedIsolationForest(features: Seq[String],
                                 trees: Array[IsolationForest.Node],
                                 cn: Double, threshold: Double) extends FittedDetector {
  import IsolationForest._

  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val bTrees = spark.sparkContext.broadcast(trees)
    val scoreUdf = udf { xs: Seq[Double] =>
      val x = xs.toArray
      val ts = bTrees.value
      math.pow(2.0, -ts.map(t => pathLength(x, t, 0)).sum / ts.length / cn)
    }
    df.withColumn("anomaly_score", scoreUdf(array(
        features.map(f => coalesce(col(f).cast("double"), lit(0.0))): _*)))
      .withColumn("is_anomaly", col("anomaly_score") > threshold)
  }
}
