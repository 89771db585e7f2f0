package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Warehouse-analytics operators rounding out the engine: graph centrality
  * (the domain-ranking primitive web-curation pipelines consume), one-pass
  * column profiling, pivot, exact group quantiles, and a correlation
  * matrix — each with an exact DuckDB oracle.
  */
object Analytics {

  /** PageRank fixed-point scale / damping / iterations — embedded verbatim
    * in both engines (see ops/PageRank.scala for the integer-exact
    * contract). */
  private val PrScale = 1000000000000L
  private val PrDamp = 85L
  private val PrIters = 3
  private val PrTopK = 20

  private val ProfileCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val PivotYears = 1995 to 2001
  private val QuantilePs = Seq("25" -> 0.25, "50" -> 0.5, "75" -> 0.75,
    "99" -> 0.99)
  private val CorrPairs = Seq(
    ("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"), ("l_extendedprice", "l_tax"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- G1: PageRank over the customer↔supplier trade graph -------------
    // Edge list from one equi-join, made symmetric (an undirected random
    // walk); ranks are integer fixed-point so the iterative join-agg is
    // bit-reproducible — the oracle unrolls the same 3 iterations in SQL.
    // 100 TB shape: per iteration one co-partitioned join + one agg shuffle
    // on an exchange-reused edge frame (ops/PageRank.scala).
    "g1_pagerank" -> ((s, dir) => {
      import s.implicits._
      val pairs = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        .join(t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
          $"o_orderkey" === $"l_orderkey")
        .select(concat(lit("c"), $"o_custkey").as("c"),
          concat(lit("s"), $"l_suppkey").as("s"))
        .distinct()
      val edges = pairs.select($"c".as("src"), $"s".as("dst"))
        .unionAll(pairs.select($"s".as("src"), $"c".as("dst")))
      graft.ops.PageRank.ranks(edges, PrIters, PrScale, PrDamp)
        .orderBy($"pr".desc, $"node")
        .limit(PrTopK)
    }),

    // ---- A15: one-pass column profiling ----------------------------------
    // All null/distinct/min/max/sum stats for every profiled column in ONE
    // aggregation over the table (multiple exact count-distincts → one
    // Expand pass; the approximate path at 10^12 distincts is the a13 HLL
    // sketch). Long format comes from unioning selects over the 1-row wide
    // frame — driver-free and constant-cost.
    "a15_profile" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val aggs = ProfileCols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_n"),
          count_distinct(col(c)).as(s"${c}_d"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"),
          (sum(round(col(c) * 100).cast("long")) / 100.0).as(s"${c}_sum"))
      } :+ count(lit(1)).as("n_rows")
      val wide = li.agg(aggs.head, aggs.tail: _*).localCheckpoint()
      ProfileCols.map { c =>
        wide.select(lit(c).as("col_name"),
          ($"n_rows" - col(s"${c}_n")).as("n_null"),
          col(s"${c}_d").as("n_distinct"),
          col(s"${c}_min").as("vmin"), col(s"${c}_max").as("vmax"),
          col(s"${c}_sum").as("vsum"))
      }.reduce(_.unionAll(_)).orderBy($"col_name")
    }),

    // ---- A16: pivot (years × nation revenue) -----------------------------
    // Explicit pivot values — Spark skips the extra distinct-collection job
    // a bare pivot() runs, which at 100 TB is a full scan saved. Cents-exact
    // cell sums.
    "a16_pivot" -> ((s, dir) => {
      import s.implicits._
      val cents = sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount")
        * 100).cast("long"))
      val piv = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .withColumn("yr", year($"l_shipdate"))
        .groupBy($"n_name")
        .pivot("yr", PivotYears.map(_.toString))
        .agg((cents / 100.0))
      PivotYears.foldLeft(piv) { (df, y) =>
        df.withColumnRenamed(y.toString, s"y$y")
      }.orderBy($"n_name")
    }),

    // ---- A17: exact per-group quantiles ----------------------------------
    // Spark's exact `percentile` (sort-within-group) vs DuckDB
    // quantile_cont — identical linear-interpolation definition. At 100 TB
    // the exact form holds one group's values per task; the sketch path is
    // approx_percentile (t-digest), same call shape.
    "a17_group_quantiles" -> ((s, dir) => {
      import s.implicits._
      // ONE percentile(col, array(...)) agg — a single per-group sort for
      // all four quantiles (four separate percentile() calls each pay
      // their own sort of the group's values)
      val ps = QuantilePs.map(_._2).mkString("array(", ", ", ")")
      val qs = QuantilePs.zipWithIndex.map { case ((nm, _), i) =>
        round(element_at($"__qs", i + 1), 4).as(s"p$nm")
      }
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(expr(s"percentile(l_extendedprice, $ps)").as("__qs"))
        .select($"l_returnflag" +: qs: _*)
        .orderBy($"l_returnflag")
    }),

    // ---- A21: CUBE grouping sets (completes a12's rollup: cross-category
    // subtotals too — 4 grouping-set combinations in one pass) -------------
    "a21_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .cube($"event_type", ($"user_id" % 3).as("shard"))
        .agg(count(lit(1)).as("cnt"),
          (sum(round($"value" * 100).cast("long")) / 100.0).as("sum_value"))
        .select(coalesce($"event_type", lit("(all)")).as("etype"),
          coalesce($"shard".cast("string"), lit("(all)")).as("shard"),
          $"cnt", $"sum_value")
        .orderBy($"etype", $"shard")
    }),

    // ---- A22: Shannon entropy of a categorical distribution --------------
    // One count pass + one tiny agg; the lone transcendental (ln) is
    // rounded to 6dp inside the per-category term on both engines (the
    // BM25 idf treatment), so the sum is order-proof
    "a22_entropy" -> ((s, dir) => {
      import s.implicits._
      // H = ln n − (Σ c·ln c)/n. Each ln is scaled to an exact 6dp LONG
      // (the t12 integer-scaling treatment) so the weighted sum is
      // associativity-proof; the closing arithmetic is a fixed-order
      // scalar expression, identical in both engines.
      val counts = t(s, dir, "events")
        .groupBy($"event_type").agg(count(lit(1)).as("c"))
      counts.agg(sum($"c").as("n"),
          sum($"c" * round(log($"c".cast("double")) * 1000000.0)
            .cast("long")).as("clogc6"))
        .select(round(
          round(log($"n".cast("double")) * 1000000.0).cast("long") / 1000000.0
            - ($"clogc6".cast("double") / 1000000.0) / $"n", 6)
          .as("entropy_nats"), $"n".as("n_events"))
    }),

    // ---- W14: time-series resample with gap fill -------------------------
    // Hourly buckets over the full span for EVERY series, empty buckets
    // zero-filled — the regularization step before any fixed-step window
    // model. The spine is (distinct keys) × explode(sequence(h0, h1)): the
    // span is a 1-row broadcast, so spine construction is a per-key
    // projection, never a driver loop; the fill join is one co-partitioned
    // left join. Cents-exact sums.
    "w14_resample" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_type", graft.functions.Det.epochS($"ts").as("es"),
          $"value")
        .withColumn("hr", expr("es div 3600"))
      val hourly = ev.groupBy($"event_type", $"hr")
        .agg(count(lit(1)).as("n"),
          (sum(round($"value" * 100).cast("long")) / 100.0).as("sum_value"))
      val span = ev.agg(min($"hr").as("h0"), max($"hr").as("h1"))
      val spine = ev.select($"event_type").distinct()
        .crossJoin(broadcast(span))
        .select($"event_type", explode(sequence($"h0", $"h1")).as("hr"))
      spine.join(hourly, Seq("event_type", "hr"), "left")
        .select($"event_type", $"hr",
          coalesce($"n", lit(0L)).as("n"),
          coalesce($"sum_value", lit(0.0)).as("sum_value"))
        .orderBy($"event_type", $"hr")
    }),

    // ---- A19: correlation matrix -----------------------------------------
    // All pairwise Pearson correlations in ONE co-moment aggregation pass,
    // then unioned to long format off the 1-row frame.
    "a19_corr" -> ((s, dir) => {
      import s.implicits._
      val aggs = CorrPairs.zipWithIndex.map { case ((x, y), i) =>
        round(corr(col(x), col(y)), 4).as(s"r$i")
      }
      val wide = t(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
        .localCheckpoint()
      CorrPairs.zipWithIndex.map { case ((x, y), i) =>
        wide.select(lit(x).as("x"), lit(y).as("y"), col(s"r$i").as("r"))
      }.reduce(_.unionAll(_)).orderBy($"x", $"y")
    })
  )

  def oracles: Map[String, String] = Map(
    "g1_pagerank" -> {
      val base = s"($PrScale // (SELECT count(*) FROM deg))"
      val tele = s"((${100L - PrDamp} * $base) // 100)"
      def iter(prev: String, out: String) =
        s"""$out AS (
           |  SELECT e.dst AS node,
           |    $tele + ($PrDamp * sum(p.pr // d.outdeg)) // 100 AS pr
           |  FROM edges e JOIN $prev p ON e.src = p.node
           |    JOIN deg d ON e.src = d.src
           |  GROUP BY e.dst)""".stripMargin
      val iters = (1 to PrIters)
        .map(i => iter(if (i == 1) "pr0" else s"it${i - 1}", s"it$i"))
        .mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (SELECT c AS src, s AS dst FROM pairs
         |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |pr0 AS (SELECT src AS node, $base AS pr FROM deg),
         |$iters
         |SELECT node, CAST(pr AS BIGINT) AS pr FROM it$PrIters
         |ORDER BY pr DESC, node LIMIT $PrTopK""".stripMargin
    },

    "a15_profile" -> ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS vmin, CAST(max($c) AS DOUBLE) AS vmax,
         |  CAST(sum(CAST(round($c * 100) AS BIGINT)) AS DOUBLE) / 100.0
         |    AS vsum
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "a16_pivot" -> {
      val cells = PivotYears.map { y =>
        s"""  CAST(sum(CASE WHEN year(l_shipdate) = $y THEN
           |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           |    END) AS DOUBLE) / 100.0 AS y$y""".stripMargin
      }.mkString(",\n")
      s"""SELECT n_name,
         |$cells
         |FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    },

    "a17_group_quantiles" -> {
      val qs = QuantilePs.map { case (nm, p) =>
        s"round(CAST(quantile_cont(l_extendedprice, $p) AS DOUBLE), 4) AS p$nm"
      }.mkString(",\n  ")
      s"""SELECT l_returnflag,
         |  $qs
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },

    "a19_corr" -> CorrPairs.map { case (x, y) =>
      s"""SELECT '$x' AS x, '$y' AS y,
         |  round(corr($x, $y), 4) AS r FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY x, y"),

    "w14_resample" -> {
      val es = graft.functions.Det.epochSSql("ts")
      s"""WITH ev AS (
         |  SELECT event_type, $es // 3600 AS hr, value FROM events),
         |hourly AS (
         |  SELECT event_type, hr, count(*) AS n,
         |    sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
         |  FROM ev GROUP BY event_type, hr),
         |span AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM ev),
         |spine AS (
         |  SELECT et.event_type, unnest(generate_series(span.h0, span.h1))
         |    AS hr
         |  FROM (SELECT DISTINCT event_type FROM ev) et, span)
         |SELECT s.event_type, s.hr,
         |  coalesce(h.n, 0) AS n, coalesce(h.sum_value, 0.0) AS sum_value
         |FROM spine s LEFT JOIN hourly h
         |  ON s.event_type = h.event_type AND s.hr = h.hr
         |ORDER BY s.event_type, s.hr""".stripMargin
    },

    "a21_cube" ->
      """SELECT coalesce(event_type, '(all)') AS etype,
        |  coalesce(CAST(shard AS VARCHAR), '(all)') AS shard, cnt, sum_value
        |FROM (
        |  SELECT event_type, user_id % 3 AS shard, count(*) AS cnt,
        |    sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |  FROM events GROUP BY CUBE(event_type, user_id % 3))
        |ORDER BY etype, shard""".stripMargin,

    "a22_entropy" ->
      """WITH c AS (SELECT event_type, count(*) AS c FROM events
        |           GROUP BY event_type),
        |a AS (SELECT sum(c) AS n,
        |        sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0)
        |          AS BIGINT)) AS clogc6
        |      FROM c)
        |SELECT round(
        |    CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
        |      / 1000000.0
        |    - (CAST(clogc6 AS DOUBLE) / 1000000.0) / n, 6) AS entropy_nats,
        |  CAST(n AS BIGINT) AS n_events
        |FROM a""".stripMargin
  )
}
