package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.eval.Metrics
import graft.functions.{Coerce, Det, Durations}
import graft.window.Sequencer

/** Core relational operators from SURVEY §2 (scans S9, filters P2/P3/P8,
  * joins J1–J3 + classic equi-joins, aggregations A1/A3/A5–A8, windows
  * W1/W3/W5/W9, set ops U1, scalar fns F1–F7), each paired with an exact
  * DuckDB oracle.
  *
  * Cross-engine exactness rules used throughout (worth reading once):
  *  - money sums go through integer cents (`round(x*100)::BIGINT`) so the
  *    aggregation is order-invariant and exact in both engines;
  *  - integer-valued doubles (l_quantity) sum exactly as doubles, no trick
  *    needed;
  *  - timestamps are compared/emitted as truncated epoch seconds
  *    ([[Det.epochS]]) — immune to the parquet ns/us precision split;
  *  - every output is deterministically ordered and every computed column is
  *    aliased identically in Spark and SQL.
  */
object Core {

  private val epochSql = Det.epochSSql("ts")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S9: time-range scan (predicate reaches the parquet scan) --------
    "s9_time_range_scan" -> ((s, dir) => {
      import s.implicits._
      // filter on the RAW physical column so the range predicate reaches
      // the parquet scan (PushedFilters + row-group pruning at scale):
      // `ts_ntz` under the µs layout, `ts_ns` under the legacy ns layout
      // (graft.Tables.t) — predicates on the derived `ts` cannot push
      val ev = t(s, dir, "events")
      val pushable =
        if (ev.columns.contains("ts_ntz"))
          $"ts_ntz" >= expr("TIMESTAMP_NTZ '2024-01-05 00:00:00'") &&
            $"ts_ntz" < expr("TIMESTAMP_NTZ '2024-01-06 00:00:00'")
        else $"ts_ns" >= 1704412800L * 1000000000L &&
          $"ts_ns" < 1704499200L * 1000000000L
      ev.filter(pushable)
        .select($"event_id", Det.epochS($"ts").as("epoch_s"), $"event_type",
          $"value")
        .orderBy($"epoch_s", $"event_id")
    }),

    // ---- P2: schema-driven numeric feature projection --------------------
    "p2_feature_projection" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val numeric = li.schema.fields
        .filter(_.dataType.typeName == "double").map(_.name).toSeq
      li.select(($"l_orderkey" +: $"l_linenumber" +: numeric.map(col)): _*)
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // ---- P3: anomaly (equality + range predicate) filter -----------------
    "p3_anomaly_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter($"event_type" === "error" && $"value" > 100.0)
        .select($"event_id", $"value")
        .orderBy($"event_id")
    }),

    // ---- P8: seeded-random instance selection ----------------------------
    "p8_random_selection" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .orderBy(Det.frac($"event_id", 7L), $"event_id")
        .limit(50)
        .select($"event_id")
        .orderBy($"event_id")
    }),

    // ---- J1: positional prediction alignment with warm-up padding --------
    // rank via range-partitioned two-pass rank (no single-task window)
    "j1_pred_alignment" -> ((s, dir) => {
      import s.implicits._
      val base = graft.ops.Ranks.globalRowNumber(
        t(s, dir, "events").select($"event_id", $"ts", $"value"),
        Seq($"ts", $"event_id"), "rn")
      val preds = base.filter($"rn" >= 10)
        .select($"rn".as("prn"), ($"value" > 150.0).as("pred"))
      base.join(preds, $"rn" === $"prn", "left")
        .select($"event_id", coalesce($"pred", lit(false)).as("is_anomaly"))
        .orderBy($"event_id")
    }),

    // ---- J2: MERGE-style anomaly write-back (broadcast semi pattern) -----
    "j2_anomaly_writeback" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val preds = ev.filter($"value" > 180.0).select($"event_id".as("pid"))
      ev.join(broadcast(preds), $"event_id" === $"pid", "left")
        .select($"event_id", $"pid".isNotNull.as("is_anomaly"))
        .orderBy($"event_id")
    }),

    // ---- J3: interval/range join vs injection windows --------------------
    "j3_range_join" -> ((s, dir) => {
      import s.implicits._
      val wins = s.createDataFrame(Seq(
        (1L, 1704240000L, 1704326400L),
        (2L, 1704844800L, 1704931200L),
        (3L, 1705708800L, 1705881600L))).toDF("win_id", "w_start", "w_end")
      t(s, dir, "events")
        .filter($"event_type" === "error")
        .select($"event_id", Det.epochS($"ts").as("es"))
        .join(broadcast(wins), $"es" >= $"w_start" && $"es" < $"w_end")
        .select($"event_id", $"win_id")
        .orderBy($"event_id", $"win_id")
    }),

    // ---- TPC-H-style pricing summary (partial-agg friendly) --------------
    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          (sum(round($"l_extendedprice" * 100).cast("long")) / 100.0)
            .as("sum_base_price"),
          (sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
            .cast("long")) / 100.0).as("sum_disc_price"),
          round(sum($"l_quantity") / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // ---- shipping-priority top-k join (broadcast dim, exact-cents rank) --
    "q3_top_orders" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val o = t(s, dir, "orders")
      t(s, dir, "lineitem")
        .join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg((sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long")) / 100.0).as("revenue"))
        .select($"l_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"), $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // ---- regional revenue: 4-way join through broadcast dims -------------
    "q5_region_revenue" -> ((s, dir) => {
      import s.implicits._
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      t(s, dir, "lineitem")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg((sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long")) / 100.0).as("revenue"))
        .orderBy($"r_name", $"n_name")
    }),

    // ---- A1: per-group min/max/mean/range stats --------------------------
    "a1_span_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(
          min($"value").as("v_min"),
          max($"value").as("v_max"),
          (max($"value") - min($"value")).as("v_range"),
          (sum(round($"value" * 100).cast("long")) / 100.0 / count(lit(1)))
            .as("v_mean_raw"))
        .select($"event_type", $"v_min", $"v_max", $"v_range",
          round($"v_mean_raw", 4).as("v_mean"))
        .orderBy($"event_type")
    }),

    // ---- A3/A4: confusion matrix + derived metrics, one pass -------------
    "a3_confusion_metrics" -> ((s, dir) => {
      import s.implicits._
      Metrics.confusion(t(s, dir, "events"),
        pred = $"value" > 120.0, actual = $"event_type" === "error")
    }),

    // ---- A5: mean inter-arrival seconds per series -----------------------
    "a5_interarrival" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"event_type", Det.epochS($"ts").as("es"), $"event_id", $"ts")
        .withColumn("gap", $"es" - lag($"es", 1).over(w))
        .groupBy($"event_type")
        .agg(round(sum($"gap").cast("double") / count($"gap"), 4)
          .as("mean_gap_s"))
        .orderBy($"event_type")
    }),

    // ---- A6: exact interpolated percentile thresholds --------------------
    "a6_percentile_threshold" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(
          round(percentile_approx($"value", lit(0.95), lit(1000000)), 4)
            .as("p95_approx"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .drop("p95_approx")
        .orderBy($"event_type")
    }),

    // ---- A7: label/value distribution ------------------------------------
    "a7_label_distribution" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"event_type")
    }),

    // ---- A8: NDCG@10 per group (window-fn implementation) ----------------
    "a8_ndcg" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      Metrics.ndcgAtK(ev, Seq("event_type"), score = $"value",
          rel = ($"event_id" % 3 === 0).cast("double"),
          tiebreak = $"event_id", k = 10)
        .select($"event_type", round($"ndcg_10", 4).as("ndcg_10"))
        .orderBy($"event_type")
    }),

    // ---- W1-lite: sliding window aggregate per series --------------------
    // l_quantity tiebreak: (orderkey, linenumber) pairs repeat in the
    // synthetic data, so without it the window order is not total and BOTH
    // engines flap run-to-run; win_avg_qty in the output order for the same
    // reason (tied key rows carry different averages).
    "w1_sliding_avg" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      li.select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          round(Sequencer.slidingAvg(li, "l_suppkey",
            Seq($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity"),
            $"l_quantity", 5), 4).as("win_avg_qty"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"win_avg_qty")
    }),

    // ---- W3: temporal 85/15 split ----------------------------------------
    "w3_temporal_split" -> ((s, dir) => {
      import s.implicits._
      Sequencer.temporalSplit(t(s, dir, "events"), Seq($"ts", $"event_id"))
        .groupBy($"split")
        .agg(count(lit(1)).as("cnt"),
          (sum(round($"value" * 100).cast("long")) / 100.0).as("sum_value"))
        .orderBy($"split")
    }),

    // ---- W5: balanced most-recent-per-class sampling ---------------------
    "w5_balanced_tail" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("label", ($"event_type" === "error").cast("int"))
      Sequencer.balancedTail(ev, "label", Seq($"ts".desc, $"event_id".desc), 500L)
        .select($"event_id", $"label")
        .orderBy($"event_id")
    }),

    // ---- W9: top-k per group by rank -------------------------------------
    "w9_topk_per_group" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")
      t(s, dir, "events")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"event_type", $"rnk", $"event_id", $"value")
        .orderBy($"event_type", $"rnk")
    }),

    // ---- U1: union-all of two selections ---------------------------------
    "u1_union" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val a = ev.filter($"event_type" === "error")
        .select($"event_id", lit("anom").as("bucket"))
      val b = ev.filter($"event_type" === "click" && $"value" > 150.0)
        .select($"event_id", lit("norm").as("bucket"))
      a.unionByName(b).orderBy($"event_id", $"bucket")
    }),

    // ---- F1–F4: epoch/timestamp round-trips ------------------------------
    "f1_timestamp_roundtrip" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id", Det.epochS($"ts").as("epoch_s"))
        .withColumn("day", date_format(timestamp_seconds($"epoch_s"), "yyyy-MM-dd"))
        .withColumn("hour", hour(timestamp_seconds($"epoch_s")))
        .orderBy($"event_id")
    }),

    // ---- F5: label coercion total function -------------------------------
    "f5_label_normalize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("rawlbl",
          when($"event_type" === "error", "true")
            .when($"event_type" === "click", "False")
            .when($"event_type" === "view", "1")
            .when($"event_type" === "signup", "0.0")
            .otherwise("weird"))
        .select($"event_id", Coerce.labelNormalize($"rawlbl").as("label"))
        .orderBy($"event_id")
    }),

    // ---- F6: duration-DSL parser (driver-side, literal table) ------------
    "f6_duration_parse" -> ((s, dir) => {
      import s.implicits._
      val cases = Seq("1H", "30min", "2D", "1h30m", "2days 5hours", "10s",
        "1w", "90", "", "0", "1.5h", "bogus")
      s.createDataFrame(cases.map(c => (c, Durations.parseOrZero(c))))
        .toDF("expr", "seconds")
        .orderBy($"expr")
    }),

    // ---- F7: sigmoid pseudo-probability ----------------------------------
    "f7_sigmoid_proba" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id",
          round(Coerce.sigmoidProba($"value", 100.0), 4).as("proba"))
        .orderBy($"event_id")
    }))

  def oracles: Map[String, String] = Map(
    "s9_time_range_scan" ->
      s"""SELECT event_id, $epochSql AS epoch_s, event_type, value
         |FROM events
         |WHERE $epochSql >= 1704412800 AND $epochSql < 1704499200
         |ORDER BY epoch_s, event_id""".stripMargin,

    "p2_feature_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_discount, l_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p3_anomaly_filter" ->
      """SELECT event_id, value FROM events
        |WHERE event_type = 'error' AND value > 100.0
        |ORDER BY event_id""".stripMargin,

    "p8_random_selection" ->
      s"""SELECT event_id FROM (
         |  SELECT event_id FROM events
         |  ORDER BY ${Det.fracSql("event_id", 7L)}, event_id LIMIT 50)
         |ORDER BY event_id""".stripMargin,

    "j1_pred_alignment" ->
      """WITH base AS (
        |  SELECT event_id, value,
        |         row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |preds AS (
        |  SELECT rn AS prn, (value > 150.0) AS pred FROM base WHERE rn >= 10)
        |SELECT event_id, coalesce(pred, false) AS is_anomaly
        |FROM base LEFT JOIN preds ON rn = prn
        |ORDER BY event_id""".stripMargin,

    "j2_anomaly_writeback" ->
      """SELECT e.event_id, (p.pid IS NOT NULL) AS is_anomaly
        |FROM events e LEFT JOIN
        |  (SELECT event_id AS pid FROM events WHERE value > 180.0) p
        |  ON e.event_id = p.pid
        |ORDER BY e.event_id""".stripMargin,

    "j3_range_join" ->
      s"""SELECT e.event_id, CAST(w.win_id AS BIGINT) AS win_id
         |FROM (SELECT event_id, $epochSql AS es FROM events
         |      WHERE event_type = 'error') e
         |JOIN (VALUES (1, 1704240000, 1704326400),
         |             (2, 1704844800, 1704931200),
         |             (3, 1705708800, 1705881600)) w(win_id, w_start, w_end)
         |  ON e.es >= w.w_start AND e.es < w.w_end
         |ORDER BY e.event_id, w.win_id""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
        |    AS sum_base_price,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    / 100.0 AS sum_disc_price,
        |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    / 100.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "a1_span_stats" ->
      """SELECT event_type, min(value) AS v_min, max(value) AS v_max,
        |  max(value) - min(value) AS v_range,
        |  round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / count(*), 4)
        |    AS v_mean
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a3_confusion_metrics" ->
      """WITH c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN value > 120.0 AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN NOT value > 120.0 AND NOT event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN value > 120.0 AND NOT event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT value > 120.0 AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM events)
        |SELECT tp, tn, fp, fn, CAST(tp + tn + fp + fn AS BIGINT) AS total_predictions,
        |  round(CASE WHEN tp+tn+fp+fn = 0 THEN 0.0 ELSE (tp+tn) / CAST(tp+tn+fp+fn AS DOUBLE) END, 4) AS accuracy,
        |  round(CASE WHEN tp+fp = 0 THEN 0.0 ELSE tp / CAST(tp+fp AS DOUBLE) END, 4) AS precision,
        |  round(CASE WHEN tp+fn = 0 THEN 0.0 ELSE tp / CAST(tp+fn AS DOUBLE) END, 4) AS recall_tpr,
        |  round(CASE WHEN (CASE WHEN tp+fp = 0 THEN 0.0 ELSE tp / CAST(tp+fp AS DOUBLE) END)
        |           + (CASE WHEN tp+fn = 0 THEN 0.0 ELSE tp / CAST(tp+fn AS DOUBLE) END) = 0 THEN 0.0
        |        ELSE 2 * (CASE WHEN tp+fp = 0 THEN 0.0 ELSE tp / CAST(tp+fp AS DOUBLE) END)
        |               * (CASE WHEN tp+fn = 0 THEN 0.0 ELSE tp / CAST(tp+fn AS DOUBLE) END)
        |             / ((CASE WHEN tp+fp = 0 THEN 0.0 ELSE tp / CAST(tp+fp AS DOUBLE) END)
        |              + (CASE WHEN tp+fn = 0 THEN 0.0 ELSE tp / CAST(tp+fn AS DOUBLE) END)) END, 4) AS f1_score,
        |  round(CASE WHEN tn+fp = 0 THEN 0.0 ELSE tn / CAST(tn+fp AS DOUBLE) END, 4) AS specificity_tnr
        |FROM c""".stripMargin,

    "a5_interarrival" ->
      s"""WITH g AS (
         |  SELECT event_type,
         |    $epochSql - lag($epochSql) OVER
         |      (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS gap
         |  FROM events)
         |SELECT event_type,
         |  round(CAST(sum(gap) AS DOUBLE) / count(gap), 4) AS mean_gap_s
         |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a6_percentile_threshold" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a7_label_distribution" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a8_ndcg" ->
      """WITH r AS (
        |  SELECT event_type,
        |    CAST(event_id % 3 = 0 AS DOUBLE) AS rel,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rn,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(event_id % 3 = 0 AS DOUBLE) DESC, event_id) AS irn
        |  FROM events),
        |d AS (
        |  SELECT event_type,
        |    sum(CASE WHEN rn <= 10 THEN rel / log2(rn + 1) ELSE 0.0 END) AS dcg,
        |    sum(CASE WHEN irn <= 10 THEN rel / log2(irn + 1) ELSE 0.0 END) AS idcg
        |  FROM r GROUP BY event_type)
        |SELECT event_type,
        |  round(CASE WHEN idcg = 0.0 THEN 0.0 ELSE dcg / idcg END, 4) AS ndcg_10
        |FROM d ORDER BY event_type""".stripMargin,

    "w1_sliding_avg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(avg(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS win_avg_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, win_avg_qty""".stripMargin,

    "w3_temporal_split" ->
      """WITH s AS (
        |  SELECT value,
        |    CASE WHEN row_number() OVER (ORDER BY epoch_us(ts), event_id)
        |         <= floor(count(*) OVER () * 0.85)
        |      THEN 'train' ELSE 'test' END AS split
        |  FROM events)
        |SELECT split, count(*) AS cnt,
        |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "w5_balanced_tail" ->
      """WITH lab AS (
        |  SELECT event_id, ts,
        |    CAST(event_type = 'error' AS INT) AS label FROM events),
        |cnt AS (
        |  SELECT
        |    sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
        |  FROM lab),
        |q AS (
        |  SELECT least(c0, 500 - least(c1, 250)) AS tn,
        |    least(c1, 500 - least(c0, 500 - least(c1, 250))) AS ta
        |  FROM cnt),
        |rn AS (
        |  SELECT event_id, label, row_number() OVER (PARTITION BY label
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS r
        |  FROM lab)
        |SELECT event_id, label FROM rn, q
        |WHERE (label = 1 AND r <= ta) OR (label = 0 AND r <= tn)
        |ORDER BY event_id""".stripMargin,

    "w9_topk_per_group" ->
      """SELECT event_type, CAST(rnk AS INTEGER) AS rnk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rnk
        |  FROM events)
        |WHERE rnk <= 5 ORDER BY event_type, rnk""".stripMargin,

    "u1_union" ->
      """SELECT * FROM (
        |  SELECT event_id, 'anom' AS bucket FROM events
        |  WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT event_id, 'norm' AS bucket FROM events
        |  WHERE event_type = 'click' AND value > 150.0)
        |ORDER BY event_id, bucket""".stripMargin,

    "f1_timestamp_roundtrip" ->
      s"""SELECT event_id, $epochSql AS epoch_s,
         |  strftime(make_timestamp($epochSql * 1000000), '%Y-%m-%d') AS day,
         |  CAST(hour(make_timestamp($epochSql * 1000000)) AS INT) AS hour
         |FROM events ORDER BY event_id""".stripMargin,

    "f5_label_normalize" ->
      s"""WITH raw AS (
         |  SELECT event_id,
         |    CASE WHEN event_type = 'error' THEN 'true'
         |         WHEN event_type = 'click' THEN 'False'
         |         WHEN event_type = 'view' THEN '1'
         |         WHEN event_type = 'signup' THEN '0.0'
         |         ELSE 'weird' END AS rawlbl
         |  FROM events)
         |SELECT event_id, ${Coerce.labelNormalizeSql("rawlbl")} AS label
         |FROM raw ORDER BY event_id""".stripMargin,

    "f6_duration_parse" -> {
      // HAND-WRITTEN expected seconds (not generated by Durations — the
      // oracle must be independent of the parser it checks)
      val expected = Seq(
        "1H" -> 3600L, "30min" -> 1800L, "2D" -> 172800L,
        "1h30m" -> 5400L, "2days 5hours" -> 190800L, "10s" -> 10L,
        "1w" -> 604800L, "90" -> 90L, "" -> 0L, "0" -> 0L,
        "1.5h" -> 5400L, "bogus" -> 0L)
      val rows = expected.map { case (c, s) => s"('$c', $s)" }.mkString(", ")
      s"SELECT expr, CAST(seconds AS BIGINT) AS seconds " +
        s"FROM (VALUES $rows) t(expr, seconds) ORDER BY expr"
    },

    "f7_sigmoid_proba" ->
      s"""SELECT event_id,
         |  round(${Coerce.sigmoidProbaSql("value", 100.0)}, 4) AS proba
         |FROM events ORDER BY event_id""".stripMargin)
}
