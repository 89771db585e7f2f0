package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classification metrics (SURVEY A3/A4; reference
  * `Backend/execute_calls.py:354-381`, `:811-839`) computed in ONE distributed
  * pass — a single hash aggregate with partial/final combine, vs the
  * reference's four full boolean-mask scans. Derived metrics are scalar
  * arithmetic on the 1-row result, rounded to 4 dp like the reference. */
object Metrics {

  /** Confusion counts + derived metrics as a 1-row DataFrame.
    * `pred`/`actual` are boolean columns. */
  def confusion(df: DataFrame, pred: Column, actual: Column): DataFrame = {
    val c = df.agg(
      sum(when(pred && actual, 1L).otherwise(0L)).as("tp"),
      sum(when(!pred && !actual, 1L).otherwise(0L)).as("tn"),
      sum(when(pred && !actual, 1L).otherwise(0L)).as("fp"),
      sum(when(!pred && actual, 1L).otherwise(0L)).as("fn"))
    val tp = col("tp"); val tn = col("tn"); val fp = col("fp"); val fn = col("fn")
    val total = tp + tn + fp + fn
    def safeDiv(n: Column, d: Column): Column = when(d === 0, 0.0).otherwise(n / d)
    val precision = safeDiv(tp, tp + fp)
    val recall = safeDiv(tp, tp + fn)
    c.select(
      tp, tn, fp, fn,
      total.as("total_predictions"),
      round(safeDiv(tp + tn, total), 4).as("accuracy"),
      round(precision, 4).as("precision"),
      round(recall, 4).as("recall_tpr"),
      round(safeDiv(lit(2) * precision * recall, precision + recall), 4).as("f1_score"),
      round(safeDiv(tn, tn + fp), 4).as("specificity_tnr"))
  }

  /** NDCG@k (SURVEY A8; reference math `Backend/utils.py:284-342`): rank items
    * by `score` desc within each group, DCG = Σ_{rank≤k} rel/log2(rank+1),
    * IDCG the same over the ideal (rel-desc) ordering, NDCG = DCG/IDCG
    * (0 when IDCG=0). `tiebreak` makes ranking deterministic.
    * Window-function implementation — no custom aggregate needed, stays in
    * whole-stage codegen, shuffles once on the group key. */
  def ndcgAtK(df: DataFrame, groupCols: Seq[String], score: Column, rel: Column,
              tiebreak: Column, k: Int): DataFrame = {
    val g = groupCols.map(col)
    df.select(g ++ Seq(score.as("__s"), rel.as("__r"), tiebreak.as("__t")): _*)
      .withColumn("__rn", row_number().over(Window.partitionBy(g: _*).orderBy(col("__s").desc, col("__t").asc)))
      .withColumn("__irn", row_number().over(Window.partitionBy(g: _*).orderBy(col("__r").desc, col("__t").asc)))
      .groupBy(g: _*)
      .agg(
        sum(when(col("__rn") <= k, col("__r") / log2(col("__rn") + 1)).otherwise(0.0)).as("__dcg"),
        sum(when(col("__irn") <= k, col("__r") / log2(col("__irn") + 1)).otherwise(0.0)).as("__idcg"))
      .select(g :+ when(col("__idcg") === 0.0, 0.0).otherwise(col("__dcg") / col("__idcg")).as(s"ndcg_$k"): _*)
  }
}
