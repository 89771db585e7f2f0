package graft.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ordered / time-series operators (SURVEY §2.5).
  *
  * The reference materializes stride-1 sliding windows as 3-D NumPy arrays
  * (`Backend/utils.py:147-282`) — an O(N·L) copy on one host. Here windows are
  * declared over `Window.partitionBy(series).orderBy(ts)` frames so Spark
  * keeps them as streaming window aggregates: one shuffle on the series key,
  * then a single sorted pass per partition. For ungrouped (single-series)
  * data callers should still provide a coarse partition key (e.g. a time
  * bucket) at 100 TB — a global `Window.orderBy` funnels into one task.
  */
object Sequencer {

  /** W1: per-series sliding sequences of length L as nested arrays,
    * emitted only when the full window exists (W6 warm-up: first L-1 rows of
    * each series produce no sequence). Pass `orderTiebreak` columns when the
    * time column has duplicates — window contents are otherwise
    * nondeterministic across partitionings. */
  def sequences(df: DataFrame, seriesCol: Option[String], tsCol: String,
                features: Seq[String], L: Int,
                orderTiebreak: Seq[Column] = Nil): DataFrame = {
    val w = seriesCol
      .map(s => Window.partitionBy(col(s)))
      .getOrElse(Window.partitionBy())
      .orderBy(col(tsCol) +: orderTiebreak: _*)
      .rowsBetween(-(L - 1), Window.currentRow)
    df.withColumn("__seq", collect_list(array(features.map(col): _*)).over(w))
      .filter(size(col("__seq")) === L)
      .withColumnRenamed("__seq", "sequence")
  }

  /** W1-flat: the reference's flattened-window representation — one row per
    * complete window end with scalar columns `<f>_tm<j>` = feature f at lag
    * j (j = 0 most recent), the naming DiCE/LIME use for sequence features
    * (`Backend/XAI_methods/methods/DiceExplainer.py:83-88`, `f_t-j` with the
    * offset counted from the window start; we count lags from the end, same
    * cells). All L·F lag expressions share ONE window frame, so Spark
    * computes them in a single sorted pass per series partition — no array
    * materialization, unlike [[sequences]]. */
  def flattenWindows(df: DataFrame, seriesCol: Option[String], tsCol: String,
                     features: Seq[String], L: Int,
                     orderTiebreak: Seq[Column] = Nil): DataFrame = {
    val w = seriesCol
      .map(s => Window.partitionBy(col(s)))
      .getOrElse(Window.partitionBy())
      .orderBy(col(tsCol) +: orderTiebreak: _*)
    val lagCols = for (f <- features; j <- 0 until L)
      yield lag(col(f), j).over(w).as(s"${f}_tm$j")
    df.select(df.columns.map(col) ++ lagCols :+
        row_number().over(w).as("__wpos"): _*)
      .filter(col("__wpos") >= L) // W6 warm-up: incomplete windows emit nothing
      .drop("__wpos")
  }

  /** W1-lite: sliding aggregate (avg) over the last L rows per series —
    * the scale-friendly form used for windowed detectors (no array blowup). */
  def slidingAvg(df: DataFrame, seriesCol: String, orderCols: Seq[Column],
                 value: Column, L: Int): Column =
    avg(value).over(Window.partitionBy(col(seriesCol)).orderBy(orderCols: _*)
      .rowsBetween(-(L - 1), Window.currentRow))

  /** W3: temporal 85/15 split (`Backend/execute_calls.py:333-346`): first
    * ⌊r·N⌋ rows by time order are "train", rest "test". Adds `split`.
    * Rank and total both come from [[graft.ops.Ranks]]' range-partitioned
    * two-pass rank — no single-task global window, no driver-side count. */
  def temporalSplit(df: DataFrame, orderCols: Seq[Column], trainRatio: Double = 0.85): DataFrame =
    graft.ops.Ranks.globalRowNumberWithTotal(df, orderCols, "__rn", "__n")
      .withColumn("split",
        when(col("__rn") <= floor(col("__n") * trainRatio), "train").otherwise("test"))
      .drop("__rn", "__n")

  /** W5: balanced tail sampling (`Backend/execute_calls.py:145-331`): take the
    * most-recent ⌊n/2⌋ rows of each class; if a class cannot fill its quota
    * the other class absorbs the remainder up to its capacity. Returns the
    * selected rows. `labelCol` is 0/1. */
  def balancedTail(df: DataFrame, labelCol: String, orderDesc: Seq[Column], n: Long): DataFrame = {
    val counts = df.groupBy(col(labelCol).as("__lbl")).agg(count(lit(1)).as("__cnt"))
    val quotas = counts
      .withColumn("__c1", sum(when(col("__lbl") === 1, col("__cnt")).otherwise(0L)).over(Window.partitionBy()))
      .withColumn("__c0", sum(when(col("__lbl") === 0, col("__cnt")).otherwise(0L)).over(Window.partitionBy()))
      .withColumn("__tn", least(col("__c0"), lit(n) - least(col("__c1"), lit(n / 2))))
      .withColumn("__ta", least(col("__c1"), lit(n) - col("__tn")))
      .select(col("__lbl"), when(col("__lbl") === 1, col("__ta")).otherwise(col("__tn")).as("__quota"))
    val w = Window.partitionBy(col(labelCol)).orderBy(orderDesc: _*)
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(quotas), col(labelCol) === col("__lbl"))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__lbl", "__quota")
  }
}
