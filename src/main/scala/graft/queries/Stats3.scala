package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.functions.Det

/** Round-9 continuation pack: the experimentation layer a product team
  * runs on top of the round-5/7/8 statistics (a35/a39 say whether arms
  * differ; q19 says whether the test was powered; this pack adds the
  * guardrail that validates the RANDOMIZATION itself (q22 SRM) and the
  * variance-reduction estimator every mature platform ships (q21 CUPED)),
  * plus offline structural-change diagnostics over the shared hourly
  * grid (a70 changepoint; a71 Granger) and corpus-shape laws (t47
  * readability, t48 Heaps).
  *
  * Exactness recipe: the Stats/Stats2 rules — quantize once to integer
  * units (cents/milli), carry every aggregate as an exact BIGINT, and
  * assemble the final float formula from those integers with the same
  * expression shape in both engines; `round(…, 6)` absorbs 1-ulp libm
  * divergence; packed-BIGINT argmax keys replace `first()`-over-sort.
  */
object Stats3 {

  private def d(c: Column): Column = c.cast("double")

  /** q21/q22 experiment assignment seed (keyed-LCG 50/50 user split —
    * the a50/p15 stable-hash pattern; stable under reprocessing, no RNG
    * state, partition-invariant). Seed chosen so the realized split is
    * HEALTHY at every test SF (χ² = 0.067/0.027/0.171 at sf0.001/0.01/
    * 0.1) — q22's alarm must be a true negative on an intact
    * assignment; an unlucky seed (e.g. 71: χ² = 8.64 at sf0.01) would
    * read as a guardrail false-positive at the correctness SF. */
  private[graft] val AbSeed = 11L

  /** χ²(1df) upper-tail critical value at α = 0.05 — the SRM alarm
    * threshold of Fabijan et al. 2019 (shortest-repr double literal,
    * identical parse in both engines; compared against the ROUNDED
    * statistic so the flag is decided on bit-identical inputs). */
  private val Chi2Crit1df = 3.841459

  /** q21/q22 shared per-user experiment frame: (user_id, grp, x, y) with
    * grp the keyed-LCG arm, x the PRE-period purchase cents sum and y
    * the POST-period purchase cents sum (absent-period users carry REAL
    * zeros — the a57 rule: CUPED's covariate must be defined for every
    * randomized user). The period split is the data-driven midpoint DAY
    * (exact integer arithmetic on epoch days, the q16 day convention).
    * ONE definition so the SRM guardrail provably audits the same
    * assignment the CUPED estimator adjusts. 100 TB shape: one bounds
    * agg (broadcast) + ONE map-side-combined per-user agg collapsing the
    * corpus to a row per user; everything downstream runs on that frame.
    */
  private[graft] def abUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"user_id", $"event_type",
        expr("CAST(ts AS LONG) div 86400").as("dd"),
        round($"value" * 100).cast("long").as("cents"))
    val bounds = ev.agg(min($"dd").as("d_lo"), max($"dd").as("d_hi"))
      .select(expr("(d_lo + d_hi + 1) div 2").as("d_mid"))
    ev.crossJoin(broadcast(bounds))
      .groupBy($"user_id")
      .agg(
        sum(when($"event_type" === "purchase" && $"dd" < $"d_mid",
          $"cents").otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase" && $"dd" >= $"d_mid",
          $"cents").otherwise(0L)).as("y"))
      .withColumn("grp",
        (Det.frac($"user_id", AbSeed) < 0.5).cast("int"))
  }

  /** DuckDB twin of [[abUsers]] — same arithmetic, shared by the q21/q22
    * oracles so the two gates provably score the same frame. */
  private def abUsersSql: String =
    s"""ev AS (
       |  SELECT user_id, event_type,
       |    ${Det.epochSSql("ts")} // 86400 AS dd,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |bounds AS (
       |  SELECT (min(dd) + max(dd) + 1) // 2 AS d_mid FROM ev),
       |users AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN event_type = 'purchase' AND dd < d_mid
       |      THEN cents ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase' AND dd >= d_mid
       |      THEN cents ELSE 0 END) AS BIGINT) AS y,
       |    CAST(CASE WHEN ${Det.fracSql("user_id", AbSeed)} < 0.5
       |      THEN 1 ELSE 0 END AS INT) AS grp
       |  FROM ev CROSS JOIN bounds
       |  GROUP BY user_id, d_mid)""".stripMargin

  /** a70 packed-argmax shift: pk = |D|·2²⁰ + (2²⁰ − 1 − t). Exact while
    * |D| < 2^43 · 2²⁰ = 2^63 ⇒ |D| ≲ 8.8e12 (ledgered); ties → smallest
    * t wins (complement index under MAX — the a69 rule). */
  private[graft] val CpPackShift = 1048576L

  /** a72 R/S block sizes (dyadic — 4 octaves inside the 720-hour span,
    * so every m has ≥ 5 blocks and the log-log fit has real spread). */
  private val HurstMs = Seq(16L, 32L, 64L, 128L)

  /** e24 power-iteration depth and the embedding width (the corpus
    * contract e23 pins). 10 iterations is the STATED estimate depth —
    * the gate compares the identical 10-step fold in both engines, so
    * convergence is a reporting concern, not a correctness one. */
  private val PowIters = 10
  private val EDim = 64

  /** t49 split seed + train fraction (keyed-LCG doc split — the p15
    * pattern) and the overlap gram width (the t9/t26 decontamination
    * convention). */
  private val SplitSeed = 97L
  private val TrainFrac = 0.8
  private val LeakN = 8

  /** z11 canary selection (keyed LCG; ~2% of docs carry a planted
    * marker). */
  private val CanarySeed = 131L
  private val CanaryFrac = 0.02

  /** z12 MCAR mask (keyed LCG; 10% of events hide their value). */
  private val MaskSeed = 137L
  private val MaskFrac = 0.1

  /** z12's error-readout text: bias/RMSE of mean-imputation against
    * the held-out truth, assembled PURELY from exact moments — never a
    * per-row error sum (which would re-associate doubles): with
    * μ = S_obs/n_obs, Σe = n_m·μ − S_m and Σe² = n_m·μ² − 2·μ·S_m +
    * Z2_m, all from BIGINT carries (generated once, the zx recipe). */
  private val impCast: Seq[String] =
    Seq("n_obs", "s_obs", "n_m", "s_m", "z2_m")
      .map(m => s"CAST($m AS DOUBLE) AS f_$m")
  private val impReadout: Seq[(String, String)] = {
    val mu = "(f_s_obs / f_n_obs)"
    val bias = s"($mu - f_s_m / f_n_m)"
    val mse = s"($mu * $mu - 2.0 * $mu * (f_s_m / f_n_m) " +
      "+ f_z2_m / f_n_m)"
    Seq(
      "obs_mean" -> s"round($mu / 100.0, 6)",
      "bias" -> s"round($bias / 100.0, 6)",
      "rmse" -> s"round(sqrt($mse) / 100.0, 6)")
  }

  /** The a61/a67 hourly grid's DuckDB twin (hourly cents volume per
    * (hr, event_type) with absent hours REAL zeros) — the same CTE text
    * the Stats2 forecast oracles carry, shared here by a70/a71. */
  private val hourlyGridSql =
    s"""hourly AS (
       |  SELECT ${Det.epochSSql("ts")} // 3600 AS hr, event_type,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2),
       |grid AS (
       |  SELECT h.hr, t.event_type, COALESCE(hourly.v, 0) AS v
       |  FROM (SELECT DISTINCT hr FROM hourly) h
       |  CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
       |  LEFT JOIN hourly
       |    ON hourly.hr = h.hr AND hourly.event_type = t.event_type)""".stripMargin

  /** a71 Granger F-test, assembled from the ten exact-BIGINT lag moments
    * by ONE formula text evaluated verbatim by BOTH engines (the d23
    * generated-SQL recipe — identical parse ⇒ identical IEEE DAG).
    * Inputs: np (usable rows), sy/sy1/sx1 (sums), syy/sy1y1/sx1x1
    * (squares), syy1/syx1/sy1x1 (cross products), all pre-cast to
    * DOUBLE under f_-prefixed names by [[grangerCastSql]]. Restricted
    * model y_t ~ 1 + y_{t−1}; unrestricted adds x_{t−1}; coefficients
    * by Cramer's rule on the 3×3 normal equations. */
  private val grangerCastCols: Seq[String] =
    Seq("np", "sy", "sy1", "sx1", "syy", "sy1y1", "sx1x1", "syy1",
      "syx1", "sy1x1")
      .map(m => s"CAST($m AS DOUBLE) AS f_$m")

  private val grangerFormulaSql: Seq[(String, String)] = {
    // restricted slope/intercept and SSE_r
    val br = "((f_np * f_syy1 - f_sy * f_sy1) / " +
      "(f_np * f_sy1y1 - f_sy1 * f_sy1))"
    val ar = s"((f_sy - $br * f_sy1) / f_np)"
    val sseR = s"(f_syy - $ar * f_sy - $br * f_syy1)"
    // unrestricted 3×3 Cramer determinants: A·[a b c]ᵀ = rhs with
    // A = [[n, sy1, sx1], [sy1, sy1y1, sy1x1], [sx1, sy1x1, sx1x1]],
    // rhs = [sy, syy1, syx1]
    val det = "(f_np * (f_sy1y1 * f_sx1x1 - f_sy1x1 * f_sy1x1) " +
      "- f_sy1 * (f_sy1 * f_sx1x1 - f_sy1x1 * f_sx1) " +
      "+ f_sx1 * (f_sy1 * f_sy1x1 - f_sy1y1 * f_sx1))"
    val detA = "(f_sy * (f_sy1y1 * f_sx1x1 - f_sy1x1 * f_sy1x1) " +
      "- f_sy1 * (f_syy1 * f_sx1x1 - f_sy1x1 * f_syx1) " +
      "+ f_sx1 * (f_syy1 * f_sy1x1 - f_sy1y1 * f_syx1))"
    val detB = "(f_np * (f_syy1 * f_sx1x1 - f_sy1x1 * f_syx1) " +
      "- f_sy * (f_sy1 * f_sx1x1 - f_sy1x1 * f_sx1) " +
      "+ f_sx1 * (f_sy1 * f_syx1 - f_syy1 * f_sx1))"
    val detC = "(f_np * (f_sy1y1 * f_syx1 - f_syy1 * f_sy1x1) " +
      "- f_sy1 * (f_sy1 * f_syx1 - f_syy1 * f_sx1) " +
      "+ f_sy * (f_sy1 * f_sy1x1 - f_sy1y1 * f_sx1))"
    val (au, bu, cu) = (s"($detA / $det)", s"($detB / $det)", s"($detC / $det)")
    val sseU = s"(f_syy - $au * f_sy - $bu * f_syy1 - $cu * f_syx1)"
    Seq(
      "ar_coef" -> s"round($br, 6)",
      "xlag_coef" -> s"round($cu, 6)",
      "sse_drop_pct" -> s"round(($sseR - $sseU) / $sseR * 100.0, 6)",
      "f_stat" -> s"round(($sseR - $sseU) / ($sseU / (f_np - 3.0)), 6)")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Q21: CUPED variance-reduced A/B readout -----------------------
    // Deng, Xu, Kohavi & Walker 2013 ("Improving the Sensitivity of
    // Online Controlled Experiments"): adjust each user's post-period
    // metric y by the pre-period covariate x, ŷ = y − θ(x − x̄), with
    // θ = cov(x,y)/var(x) POOLED across arms — unbiased because
    // assignment is independent of x. Reports, per arm: n, raw mean,
    // CUPED mean, and the pooled θ and variance-reduction ratio ρ²
    // (the fraction of metric variance the covariate removes).
    // Exactness: per-user cents are exact BIGINTs; the five pooled
    // moments and per-arm sums are exact BIGINT aggs; θ/ρ²/means
    // assemble in doubles with the t41 shape (n·Σxy crosses int64
    // first — cast THEN multiply), round 6. 100 TB shape: the shared
    // per-user collapse + a 2-row arm agg + a 1-row pooled agg.
    // On this corpus ρ² ≈ 7e-5 (sf0.1): the synthetic users' pre/post
    // purchase sums are nearly independent, so CUPED removes ~nothing —
    // stated honestly (the q19 all-arms-under-powered convention); the
    // estimator itself is what's under test.
    "q21_cuped" -> ((s, dir) => {
      import s.implicits._
      val u = abUsers(s, dir).localCheckpoint() // feeds pooled AND arms
      val pooled = u.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
          sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
        .withColumn("cov", d($"n") * d($"sxy") - d($"sx") * d($"sy"))
        .withColumn("vx", d($"n") * d($"sxx") - d($"sx") * d($"sx"))
        .withColumn("vy", d($"n") * d($"syy") - d($"sy") * d($"sy"))
        .select($"n", $"sx", ($"cov" / $"vx").as("theta"),
          ($"cov" * $"cov" / ($"vx" * $"vy")).as("rho2"))
      u.groupBy($"grp")
        .agg(count(lit(1)).as("n_users"), sum($"x").as("sxg"),
          sum($"y").as("syg"))
        .crossJoin(broadcast(pooled))
        .select($"grp", $"n_users",
          round(d($"syg") / d($"n_users") / 100.0, 6).as("mean_y"),
          round((d($"syg") / d($"n_users") - $"theta" *
            (d($"sxg") / d($"n_users") - d($"sx") / d($"n"))) / 100.0,
            6).as("mean_y_cuped"),
          round($"theta", 6).as("theta"),
          round($"rho2", 6).as("var_reduction"))
        .orderBy($"grp")
    }),

    // ---- Q22: sample-ratio-mismatch guardrail --------------------------
    // Fabijan et al. 2019 ("Diagnosing Sample Ratio Mismatch"): before
    // reading ANY experiment metric, test the realized arm counts
    // against the designed 50/50 split — χ² = (n1 − n0)²/n with 1 df
    // (the two-cell goodness-of-fit closed form). A triggered SRM means
    // the assignment or logging pipeline is broken and every downstream
    // readout (a35/a39/q19/q21) is void. Exactness: integer counts;
    // (n1−n0) casts to DOUBLE BEFORE squaring (the ledgered shape —
    // exact at any n < 2^63 users, never an int64 square) and the
    // alarm flag compares the ROUNDED χ² to the critical literal so
    // both engines decide on identical inputs. 100 TB shape: the
    // shared per-user collapse + a 1-row agg.
    "q22_srm" -> ((s, dir) => {
      import s.implicits._
      abUsers(s, dir)
        .agg(sum($"grp").cast("long").as("n1"),
          sum(lit(1L) - $"grp").cast("long").as("n0"))
        .withColumn("chi2", round(
          d($"n1" - $"n0") * d($"n1" - $"n0") / d($"n1" + $"n0"), 6))
        .select($"n1", $"n0", ($"n1" - $"n0").as("delta"), $"chi2",
          ($"chi2" > Chi2Crit1df).as("srm_alarm"))
    }),

    // ---- A70: offline changepoint (centered-CUSUM argmax) ---------------
    // The OFFLINE companion to a65's online Page–Hinkley and w28's CUSUM:
    // given the whole series, WHERE did the level shift? Estimator
    // t̂ = argmax_t |S_t − (t/n)·S_n| (Page 1954's CUSUM read backward;
    // Hinkley 1970's ML changepoint for a mean shift), carried ×n so
    // D_t = n·S_t − t·S_n stays an exact BIGINT — no division until the
    // two segment means. Reports, per event_type: the split hour, the
    // exact |D| peak, and the pre/post means with their shift. On this
    // corpus the shift is ~flat (no injected level change in the raw
    // volume series — i3's STEP injection is per-row, not hourly):
    // stated honestly; the estimator is what's under test.
    // Exactness: prefix sums and D are BIGINT (|D| ≤ n·S_n, ledgered
    // with the ×2²⁰ packed-argmax headroom); means divide in double,
    // round 6. Ties → smallest t (complement-index pack, the a69 rule).
    // 100 TB shape: the SHARED hourly collapse (map-side combine) is
    // the only corpus-sized pass; the per-type window runs on the
    // ≤ types·n_hours frame; the argmax is a types-row agg.
    "a70_changepoint" -> ((s, dir) => {
      import s.implicits._
      val grid = Stats2.holtHourly(s, dir)
        .localCheckpoint() // feeds the prefix window AND the totals
      val w = Window.partitionBy($"event_type").orderBy($"hr")
      val pre = grid
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("st", sum($"v").over(w))
        .localCheckpoint() // feeds the D scan AND the argmax join-back
      val tot = grid.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"v").as("sn"))
      val dd = pre.join(broadcast(tot), Seq("event_type"))
        .filter($"t" < $"n")
        .withColumn("dabs", abs($"n" * $"st" - $"t" * $"sn"))
      val arg = dd.groupBy($"event_type")
        .agg(max($"dabs" * CpPackShift +
          (lit(CpPackShift - 1L) - $"t")).as("pk"))
        .select($"event_type", expr(s"pk div $CpPackShift").as("dmax"),
          (lit(CpPackShift - 1L) - expr(s"pk % $CpPackShift")).as("t"))
      arg.join(pre, Seq("event_type", "t"))
        .join(broadcast(tot), Seq("event_type"))
        .select($"event_type", $"n".as("n_hours"), $"t".as("split_t"),
          $"hr".as("split_hr"), $"dmax",
          round(d($"st") / d($"t") / 100.0, 6).as("pre_mean"),
          round((d($"sn") - d($"st")) / (d($"n") - d($"t")) / 100.0, 6)
            .as("post_mean"),
          round(((d($"sn") - d($"st")) / (d($"n") - d($"t")) -
            d($"st") / d($"t")) / 100.0, 6).as("shift"))
        .orderBy($"event_type")
    }),

    // ---- A71: Granger causality (lag-1 F-test) ---------------------------
    // Does one hourly series help FORECAST another beyond its own past
    // (Granger 1969)? Both directions over the click/purchase pair:
    // restricted y_t ~ 1 + y_{t−1} vs unrestricted + x_{t−1};
    // F = (SSE_r − SSE_u)/(SSE_u/(n−3)) with 1 numerator df. The
    // companion to a60's partial correlation (same hourly frame;
    // Granger adds the TEMPORAL direction a correlation can't see).
    // Exactness: the ten moments are exact BIGINTs (products ≤ v_max²,
    // ledgered with the a60 hourly bound); the coefficient/SSE assembly
    // is ONE shared formula text evaluated verbatim by both engines
    // (the d23 generated-SQL recipe), round 6. 100 TB shape: the
    // SHARED hourly collapse; the pivot/lag window runs on the
    // ≤ n_hours collapsed frame (bounded-frame exception, one task by
    // design); two 1-row moment aggs union to the 2-row report.
    "a71_granger" -> ((s, dir) => {
      import s.implicits._
      val xy = Stats2.holtHourly(s, dir)
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"hr")
        .agg(max(when($"event_type" === "click", $"v")).as("vc"),
          max(when($"event_type" === "purchase", $"v")).as("vp"))
      val w = Window.orderBy($"hr") // ≤ n_hours rows: bounded frame
      val lagged = xy
        .withColumn("vc1", lag($"vc", 1).over(w))
        .withColumn("vp1", lag($"vp", 1).over(w))
        .filter($"vc1".isNotNull)
        .localCheckpoint() // feeds both direction aggs
      def moments(label: String, y: Column, y1: Column, x1: Column) =
        lagged.agg(count(lit(1)).as("np"),
            sum(y).as("sy"), sum(y1).as("sy1"), sum(x1).as("sx1"),
            sum(y * y).as("syy"), sum(y1 * y1).as("sy1y1"),
            sum(x1 * x1).as("sx1x1"), sum(y * y1).as("syy1"),
            sum(y * x1).as("syx1"), sum(y1 * x1).as("sy1x1"))
          .selectExpr(s"'$label' AS direction" +: "np" +:
            grangerCastCols: _*)
          .selectExpr(Seq("direction", "np AS n_used") ++
            grangerFormulaSql.map { case (a, f) => s"$f AS $a" }: _*)
      moments("click->purchase", $"vp", $"vp1", $"vc1")
        .unionByName(moments("purchase->click", $"vc", $"vc1", $"vp1"))
        .orderBy($"direction")
    }),

    // ---- G12: community conductance ---------------------------------------
    // Per-community cut quality for the g5 LPA partition (Kannan, Vempala
    // & Vetta 2004; the NCP lens of Leskovec et al. 2008): φ(S) =
    // cut(S) / min(vol(S), 2m − vol(S)) — the internal complement to
    // g11's modularity (g11 scores the partition against a null model;
    // φ says how leaky each community is in absolute terms). Directed
    // counts over the both-directions edge list, so cut/vol need no ÷2.
    // Exactness: pure integer counts; φ as exact ppm (NULL when a
    // community holds every edge — min = 0, φ undefined; the identical
    // CASE in both engines). 100 TB shape: the shared trade graph + two
    // label joins (the g11 pass) + a ≤communities-row agg.
    // On this corpus φ = 1.0 for EVERY community — the conductance view
    // of g11's finding (Q = −0.42): synchronous LPA on a bipartite
    // graph collapses to side-alternating labels, so every edge is a
    // cut edge. Stated honestly; the two gates corroborate each other.
    "g12_conductance" -> ((s, dir) => {
      import s.implicits._
      val edges = Analytics.tradeGraphEdges(s, dir)
        .localCheckpoint() // feeds LPA, the 2m agg AND the label joins
      val lab = graft.ops.Lpa.propagate(edges, Analytics.LpaRounds)
        .localCheckpoint() // feeds both endpoint joins AND the size agg
      val m2 = edges.agg(count(lit(1)).as("e2"))
      val comm = edges
        .join(lab.select($"node".as("src"), $"lbl".as("ls")), Seq("src"))
        .join(lab.select($"node".as("dst"), $"lbl".as("ld")), Seq("dst"))
        .groupBy($"ls".as("lbl"))
        .agg(count(lit(1)).as("vol"),
          sum(($"ls" =!= $"ld").cast("long")).as("cut"))
      val nn = lab.groupBy($"lbl").agg(count(lit(1)).as("n_nodes"))
      comm.join(nn, Seq("lbl")).crossJoin(broadcast(m2))
        .withColumn("mn", least($"vol", $"e2" - $"vol"))
        .select($"lbl", $"n_nodes", $"vol", $"cut",
          when($"mn" > 0, expr("(cut * 1000000) div mn")).as("phi_ppm"))
        .orderBy($"lbl")
    }),

    // ---- G13: clustering coefficient report --------------------------------
    // The Watts–Strogatz 1998 average local clustering coefficient and
    // Newman 2003 global transitivity over the g3 co-purchase graph —
    // the one-row "is this graph clumpy or random" diagnostic beside
    // g10's assortativity. cc(v) = 2·tri(v)/(deg(v)·(deg(v)−1)) over
    // nodes with deg ≥ 2 (triangle-free nodes carry REAL zeros);
    // transitivity = Σtri / Σwedges = 3T/W. Exactness: per-node cc as
    // exact ppm (integer div — deg(deg−1) is even so wedges divide
    // exactly); both summary ratios assemble from exact BIGINTs, the
    // readable avg_cc in double round 6. 100 TB shape: the SHARED
    // degree-ordered triangle pass (O(√m) wedge bound, ops/Triangles)
    // + one node agg; nothing beyond g3's cost.
    "g13_clustering" -> ((s, dir) => {
      import s.implicits._
      val e = Analytics.coPurchaseEdges(s, dir)
        .localCheckpoint() // feeds the degree agg AND the triangle pass
      val deg = e.select($"a".as("node")).unionAll(e.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
      deg.filter($"deg" >= 2)
        .join(graft.ops.Triangles.perNode(e), Seq("node"), "left")
        .select($"deg", coalesce($"tri", lit(0L)).as("tri0"))
        .withColumn("cc_ppm", expr("(tri0 * 2000000) div (deg * (deg - 1))"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(($"tri0" > 0).cast("long")).as("n_closed"),
          max($"deg").as("max_deg"),
          sum($"tri0").as("tri3"),
          sum(expr("(deg * (deg - 1)) div 2")).as("wedges"),
          sum($"cc_ppm").as("s_ccppm"))
        .select($"n_nodes", $"n_closed", $"max_deg",
          expr("tri3 div 3").as("n_triangles"), $"wedges",
          expr("(tri3 * 1000000) div wedges").as("trans_ppm"),
          round(d($"s_ccppm") / d($"n_nodes") / 1e6, 6).as("avg_cc"))
    }),

    // ---- T47: readability report -------------------------------------------
    // Flesch 1948 reading ease per language, from the two corpus ratios
    // (words/sentence and syllables/word), with BOTH proxies stated:
    // this corpus carries NO sentence punctuation (verified: zero
    // [.!?] in every doc), so each document counts as one sentence —
    // words_per_doc IS the sentence-length term; syllables are vowel
    // runs ([aeiouy]+ on the lowercased text, the standard
    // dictionary-free proxy). The absolute FRE is therefore far below
    // the human scale (~60-word "sentences") — the per-language DELTAS
    // are the signal, like t2's quality score. Exactness: all three
    // counts are exact BIGINTs; the formula assembles in double,
    // round 6. 100 TB shape: ONE map-side-combined lang agg; the regex
    // and tokenizer run inside whole-stage codegen.
    "t47_readability" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang",
          size(graft.text.TextOps.tokens($"text")).cast("long").as("w"),
          size(regexp_extract_all(lower($"text"), lit("[aeiouy]+"),
            lit(0))).cast("long").as("vg"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"w").as("words"),
          sum($"vg").as("vgroups"))
        .select($"lang", $"n_docs", $"words", $"vgroups",
          round(d($"words") / d($"n_docs"), 6).as("words_per_doc"),
          round(d($"vgroups") / d($"words"), 6).as("syll_per_word"),
          round(lit(206.835) - lit(1.015) * (d($"words") / d($"n_docs"))
            - lit(84.6) * (d($"vgroups") / d($"words")), 6).as("fre"))
        .orderBy($"lang")
    }),

    // ---- T48: Heaps' law vocabulary-growth fit ------------------------------
    // Heaps 1978 / Herdan: V(N) ≈ K·N^β — the vocabulary-growth twin of
    // t41's Zipf rank-frequency fit (the two laws are duals; natural
    // text sits near β ≈ 0.5–0.7, template/boilerplate corpora flatten).
    // Ten checkpoints at exact doc-rank deciles (doc_id order — the
    // corpus's stable ingest order): N_k = tokens in the first k/10 of
    // docs, V_k = distinct tokens FIRST seen there (first-occurrence
    // rank ≤ cut — a min-agg, never a windowed COUNT DISTINCT); log-log
    // OLS over the 10 points via the t41 e6-quantized recipe. Output:
    // the checkpoint curve with the fitted (β, K, R²) riding along (the
    // q20 ride-along convention). On THIS corpus the vocabulary is
    // CLOSED (~31 generator words): V saturates at the first decile, so
    // β = 0 exactly and R² is undefined (vy = 0 → NULL under the same
    // CASE guard in both engines — ANSI Spark throws on /0 even for
    // doubles). Stated honestly: the flat curve IS the boilerplate
    // signal the fit exists to flag. 100 TB shape: the two-pass
    // distributed rank (no global window), ONE token-keyed min-agg for
    // first occurrences, a broadcast 10-row cut grid joined to the
    // per-doc and per-token frames, and a 10-row fit agg.
    "t48_heaps" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", graft.text.TextOps.tokens($"text").as("tk"))
      val ranked = graft.ops.Ranks.globalRowNumberWithTotal(
          docs.select($"doc_id", size($"tk").cast("long").as("ntok")),
          Seq($"doc_id"), "rk", "nn")
        .localCheckpoint() // feeds the cut grid, N_k agg AND first ranks
      val nn1 = ranked.agg(max($"nn").as("nn"))
      val cuts = broadcast(
        s.createDataFrame((1L to 10L).map(Tuple1(_))).toDF("k")
          .crossJoin(nn1).withColumn("cut", expr("(k * nn) div 10")))
      val ntokK = ranked.join(cuts, $"rk" <= $"cut")
        .groupBy($"k").agg(sum($"ntok").as("n_tokens"))
      val firsts = docs
        .join(ranked.select($"doc_id", $"rk"), Seq("doc_id"))
        .select(explode($"tk").as("w"), $"rk")
        .groupBy($"w").agg(min($"rk").as("frk"))
      val vocabK = firsts.join(cuts, $"frk" <= $"cut")
        .groupBy($"k").agg(count(lit(1)).as("vocab"))
      val pts = ntokK.join(vocabK, Seq("k"))
        .withColumn("x", round(log(d($"n_tokens")) * 1e6).cast("long"))
        .withColumn("y", round(log(d($"vocab")) * 1e6).cast("long"))
        .localCheckpoint() // feeds the fit agg AND the report
      val fit = pts
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
          sum($"y" * $"y").as("syy"))
        .withColumn("cov", d($"n") * d($"sxy") - d($"sx") * d($"sy"))
        .withColumn("vx", d($"n") * d($"sxx") - d($"sx") * d($"sx"))
        .withColumn("vy", d($"n") * d($"syy") - d($"sy") * d($"sy"))
        .select(
          when($"vx" > 0, round($"cov" / $"vx", 6)).as("heaps_beta"),
          when($"vx" > 0, round(exp((d($"sy") - $"cov" / $"vx" * d($"sx"))
            / d($"n") / 1e6), 6)).as("heaps_k"),
          when($"vx" > 0 && $"vy" > 0,
            round($"cov" * $"cov" / ($"vx" * $"vy"), 6)).as("r2"))
      pts.crossJoin(broadcast(fit))
        .select($"k".as("decile"), $"n_tokens", $"vocab",
          $"heaps_beta", $"heaps_k", $"r2")
        .orderBy($"decile")
    }),

    // ---- A72: Hurst exponent (rescaled-range analysis) ---------------------
    // Long-range dependence — the diagnostic a38/a62 can't see (short
    // correlograms miss slow power-law memory): Hurst 1951's R/S over
    // dyadic block sizes (Mandelbrot & Wallis 1969), H = slope of
    // ln(avg R/S) vs ln(m). H ≈ 0.5 = memoryless, > 0.5 = persistent.
    // Per block of m consecutive hours: R = range of the cumulative
    // mean deviation, S = population std; both are carried ×m so the
    // range numerator m·S_k − k·S_m stays an exact BIGINT — R/S is ONE
    // double division per block, e6-quantized so the per-m average is
    // an exact integer sum (the a45 summand rule; zero-variance blocks
    // are excluded under the identical guard in both engines). On this
    // corpus H ≈ 0.5 — memoryless, consistent with a62's white-noise
    // verdict and a69's ~0 seasonal strength; honest null. 100 TB
    // shape: the SHARED hourly collapse × a 4-row m-grid, one
    // per-(type, m, block) window + two tiny aggs; the fit is 4 points
    // per type.
    "a72_hurst" -> ((s, dir) => {
      import s.implicits._
      val ms = broadcast(s.createDataFrame(HurstMs.map(Tuple1(_)))
        .toDF("m"))
      val w = Window.partitionBy($"event_type").orderBy($"hr")
      val g = Stats2.holtHourly(s, dir)
        .withColumn("t", row_number().over(w).cast("long"))
        .crossJoin(ms)
        .withColumn("blk", expr("(t - 1) div m"))
        .withColumn("k", $"t" - lit(1L) - $"m" * $"blk" + lit(1L))
      val wb = Window.partitionBy($"event_type", $"m", $"blk")
      val wbk = wb.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val blocks = g
        .withColumn("nb", count(lit(1)).over(wb))
        .filter($"nb" === $"m") // drop the ragged tail block
        .withColumn("sk", sum($"v").over(wbk))
        .withColumn("sm", sum($"v").over(wb))
        .withColumn("sx2", sum($"v" * $"v").over(wb))
        .withColumn("dev", $"m" * $"sk" - $"k" * $"sm")
        .groupBy($"event_type", $"m", $"blk")
        .agg(max($"dev").as("dmax"), min($"dev").as("dmin"),
          max($"m" * $"sx2" - $"sm" * $"sm").as("varm2"))
        .filter($"varm2" > 0)
        .select($"event_type", $"m",
          round((d($"dmax") - d($"dmin"))
            / sqrt(d($"varm2")) * 1e6).cast("long").as("rs_e6"))
      val perM = blocks.groupBy($"event_type", $"m")
        .agg(count(lit(1)).as("n_blocks"), sum($"rs_e6").as("s_rs"))
        .withColumn("x", round(log(d($"m")) * 1e6).cast("long"))
        .withColumn("y", round(log(d($"s_rs") / d($"n_blocks") / 1e6)
          * 1e6).cast("long"))
        .localCheckpoint() // feeds the fit agg AND the report
      val fit = perM.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
        .withColumn("cov", d($"n") * d($"sxy") - d($"sx") * d($"sy"))
        .withColumn("vx", d($"n") * d($"sxx") - d($"sx") * d($"sx"))
        .select($"event_type",
          when($"vx" > 0, round($"cov" / $"vx", 6)).as("hurst_h"))
      perM.join(broadcast(fit), Seq("event_type"))
        .select($"event_type", $"m", $"n_blocks",
          round(d($"s_rs") / d($"n_blocks") / 1e6, 6).as("avg_rs"),
          $"hurst_h")
        .orderBy($"event_type", $"m")
    }),

    // ---- Q23: DAU/MAU stickiness curve --------------------------------------
    // The engagement ratio every product dashboard leads with (the
    // "stickiness" convention popularized by Facebook's growth team):
    // per day, DAU / MAU with MAU = distinct users active in the
    // trailing 30 days INCLUSIVE. Computed without any distinct-over-
    // window: each (user, active-day) row contributes to the 30
    // forward days' MAU via one bounded explode + dedup — linear, one
    // shuffle, no per-day rescan. Partial-window days at the stream
    // head are reported as-is (days_observed rides along so consumers
    // can mask warm-up). Exactness: integer day arithmetic + exact ppm.
    // 100 TB shape: ONE distinct user-day collapse (map-side combine),
    // a ×30 bounded fan-out + dedup, two day aggs, one day join.
    "q23_stickiness" -> ((s, dir) => {
      import s.implicits._
      val ud = t(s, dir, "events")
        .select($"user_id", expr("CAST(ts AS LONG) div 86400").as("dd"))
        .distinct()
        .localCheckpoint() // feeds DAU, the MAU fan-out AND day bounds
      val d0 = ud.agg(min($"dd").as("d_min"))
      val dau = ud.groupBy($"dd").agg(count(lit(1)).as("dau"))
      val mau = ud
        .select($"user_id",
          explode(sequence(lit(0L), lit(29L))).as("o"), $"dd")
        .select($"user_id", ($"dd" + $"o").as("dd"))
        .distinct()
        .groupBy($"dd").agg(count(lit(1)).as("mau"))
      dau.join(mau, Seq("dd")).crossJoin(broadcast(d0))
        .select($"dd", $"dau", $"mau",
          least($"dd" - $"d_min" + 1L, lit(30L)).as("days_observed"),
          expr("(dau * 1000000) div mau").as("stick_ppm"))
        .orderBy($"dd")
    }),

    // ---- E24: top principal component (in-query power iteration) ----------
    // The eigen-view of e23's isotropy audit: the covariance matrix's
    // top eigenpair by 10 von-Mises power iterations (Mises &
    // Pollaczek-Geiringer 1929) run INSIDE the query on a 1-row
    // array-state frame — the d23 EM-chain recipe generalized from
    // scalars to arrays, with every fold a left fold from an exact-0.0
    // seed in a fixed element order, so the whole iteration is
    // bit-identical in both engines (the a67 association contract).
    // Matrix: the e6-quantized centered-covariance NUMERATOR
    // M = n·Σqq' − (Σq)(Σq)' — BIGINT moments until the one double
    // assembly (t41 shape); M is PSD so the positive start never
    // flips sign. Reports λ/(n²·10¹²) in unit², the explained-variance
    // share λ/tr(M), and the top loading dim (packed argmax). On this
    // ISOTROPIC corpus there is no eigengap, so 10 iterations yield a
    // LOWER-BOUND estimate ≈ tr/64 with explained ≈ 1/64 — exactly
    // e23's PR = 63.94/64 finding from the eigen side; stated. 100 TB
    // shape: ONE map-only upper-triangle pair explode collapsed by a
    // map-side-combined (j,k) agg to 2080 rows; the iteration chain is
    // 1-row jobs (localCheckpoint per step, the EM-fold rule).
    "e24_top_component" -> ((s, dir) => {
      import s.implicits._
      val D = EDim
      val q = t(s, dir, "embeddings")
        .select($"vec_id", expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
          .as("q"))
        .localCheckpoint() // feeds the pair, sum AND count aggs
      val pairs = q.select(explode(expr(
          s"flatten(transform(sequence(0, ${D - 1}), j -> " +
            s"transform(sequence(j, ${D - 1}), k -> " +
            "struct(j AS j, k AS k, " +
            "element_at(q, j + 1) * element_at(q, k + 1) AS p))))"))
          .as("e"))
        .select($"e.j", $"e.k", $"e.p")
        .groupBy($"j", $"k").agg(sum($"p").as("s2"))
      val sums = q.select(posexplode($"q").as(Seq("j", "qj")))
        .groupBy($"j").agg(sum($"qj").as("s1"))
        .localCheckpoint() // joins BOTH triangle sides
      val nrow = q.agg(count(lit(1)).as("n"))
      val mjk = pairs
        .join(broadcast(sums.select($"j", $"s1".as("s1j"))), Seq("j"))
        .join(broadcast(sums.select($"j".as("k"), $"s1".as("s1k"))),
          Seq("k"))
        .crossJoin(broadcast(nrow))
        .select($"j", $"k",
          (d($"n") * d($"s2") - d($"s1j") * d($"s1k")).as("m"))
      val mfull = mjk.select(($"j" * D + $"k").as("idx"), $"m")
        .unionAll(mjk.filter($"j" =!= $"k")
          .select(($"k" * D + $"j").as("idx"), $"m"))
      // The 10 von-Mises rounds as ONE aggregate(sequence) fold
      // (optimization r12): the per-round localCheckpoint chain paid one
      // Spark job per round to keep Catalyst from exponentially inlining
      // the w-reuse; a higher-order `aggregate` iterates at RUNTIME, so
      // there is nothing to inline — the matvec text appears 3× per round
      // (w, its norm, the normalize) and re-evaluates to the identical
      // doubles (same ops, same order as the materialized-w form).
      val wT = s"transform(sequence(0, ${D - 1}), j -> " +
        s"aggregate(transform(sequence(0, ${D - 1}), k -> " +
        s"element_at(am, j * $D + k + 1) * element_at(acc.v, k + 1)), " +
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b))"
      val nrmT = s"sqrt(aggregate(transform($wT, x -> x * x), " +
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b))"
      val st = mfull
        .agg(expr("transform(sort_array(collect_list(struct(idx, m))), " +
          "e -> e.m)").as("am"))
        .crossJoin(broadcast(nrow))
        .selectExpr("am", "n",
          s"""aggregate(sequence(1, $PowIters),
             |  named_struct(
             |    'v', transform(sequence(0, ${D - 1}),
             |           x -> CAST(0.125 AS DOUBLE)),
             |    'nrm', CAST(0.0 AS DOUBLE)),
             |  (acc, i) -> named_struct(
             |    'v', transform($wT, x -> x / $nrmT),
             |    'nrm', $nrmT)
             |) AS __pw""".stripMargin) // v seed 1/√64 — exact dyadic
        .selectExpr("am", "n", "__pw.nrm AS nrm", "__pw.v AS v")
      st.selectExpr("n", "nrm", "v",
          s"aggregate(transform(sequence(0, ${D - 1}), j -> " +
            s"element_at(am, j * $D + j + 1)), " +
            "CAST(0.0 AS DOUBLE), (a, b) -> a + b) AS tr",
          s"array_max(transform(sequence(0, ${D - 1}), j -> " +
            "CAST(round(abs(element_at(v, j + 1)) * 1000000) AS BIGINT) " +
            s"* $D + ${D - 1} - j)) AS pk")
        .selectExpr("n AS n_vecs", s"$D AS dim",
          "round(nrm / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12), 6)" +
            " AS top_eigenvalue",
          "round(nrm / tr, 6) AS explained_ratio",
          s"CAST(${D - 1} - pk % $D AS INT) AS top_dim",
          s"round(CAST(pk div $D AS DOUBLE) / 1e6, 6) AS top_loading")
    }),

    // ---- A73: Bartlett variance-homogeneity test ---------------------------
    // The variance sibling the mean-test family (a35/a39/a53/a66) was
    // missing (Bartlett 1937): are the per-event-type value variances
    // equal? χ² = [(N−k)·ln s_p² − Σ(n_i−1)·ln s_i²] / C with the
    // Box 1953 correction C. Exactness: group moments are exact BIGINT
    // milli-units; each ln s_i² is e6-quantized so the k-term weighted
    // sum is an exact BIGINT (the a45 summand rule); C's Σ1/(n_i−1) is
    // e12-quantized (documented — the only sub-ulp deviation from the
    // textbook formula, identical in both engines and ~1e-8 relative
    // at these n). One conditional-agg pass; the k-row frame does the
    // rest. 100 TB shape: ONE map-side-combined type agg (k rows),
    // then k-row arithmetic.
    "a73_bartlett" -> ((s, dir) => {
      import s.implicits._
      val g = t(s, dir, "events")
        .select($"event_type",
          round($"value" * 1000).cast("long").as("q"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"q").as("sq"),
          sum($"q" * $"q").as("sq2"))
        .withColumn("v",
          (d($"sq2") - d($"sq") * d($"sq") / d($"n")) / (d($"n") - 1.0))
        .withColumn("l6", round(log($"v") * 1e6).cast("long"))
        // (n−1)·s² truncated to 1 milli² unit by a PURE-INTEGER div
        // (sq² rides DECIMAL(38,0)/HUGEINT — the a40 escape path): an
        // exact-BIGINT carry so the k-group sum is order-free AND
        // tie-free (a rounded-double carry can land exactly on .5 and
        // split Spark half-up vs DuckDB half-even — the e25 lesson)
        .withColumn("wv",
          expr("sq2 - (CAST(sq AS DECIMAL(38,0)) * sq) div n"))
        .withColumn("r12",
          expr("1000000000000 div (n - 1)"))
      val ag = g.agg(count(lit(1)).as("k"), sum($"n").as("nn"),
          sum(($"n" - 1L) * $"l6").as("swl"),
          sum($"wv").as("swv"),
          sum($"r12").as("sr12"))
        .withColumn("spv", d($"swv") / (d($"nn") - d($"k")))
        .withColumn("num",
          (d($"nn") - d($"k")) * log($"spv")
            - d($"swl") / 1e6)
        .withColumn("cc", lit(1.0) +
          (d($"sr12") / 1e12 - lit(1.0) / (d($"nn") - d($"k")))
            / (lit(3.0) * (d($"k") - 1.0)))
      ag.select($"k".cast("int").as("k_groups"), $"nn".as("n_total"),
        ($"k" - 1L).as("df"),
        round($"num" / $"cc", 6).as("chi2"))
    }),

    // ---- Z10: experiment-readout chain gate --------------------------------
    // The z1/z3/z9 treatment for the experimentation family: SRM
    // guardrail (q22), raw and CUPED-adjusted lift (q21), the Welch t
    // (a39's shape on per-user totals), and the q19 MDE/power verdict —
    // ONE hash-gated query over ONE shared per-user pass, so the seams
    // between the individually-green stages are oracle-covered. All
    // thirteen sufficient statistics come from a single conditional
    // agg; every readout is generated ONCE as SQL text and evaluated
    // verbatim by both engines (the d23 recipe). The flags keep their
    // sources' conventions (srm on the rounded χ², powered on
    // unrounded bit-identical doubles). 100 TB shape: the shared
    // per-user collapse + one 1-row agg; the readout is scalar.
    "z10_experiment_e2e" -> ((s, dir) => {
      abMoments(s, dir)
        .selectExpr(zxReadout.map { case (a, e) => s"$e AS $a" }: _*)
    }),

    // ---- Q25: TOST equivalence test --------------------------------------------
    // The test a platform runs when the HOPE is "no difference" (a
    // migration, a refactor, a cheaper model): two one-sided tests
    // against a ±5%-of-control-mean margin (Schuirmann 1987) — the
    // experiment is EQUIVALENT only if BOTH one-sided t's clear the
    // one-sided z at α = 0.05. Same shared moment pass as z10 (ONE
    // helper, so the superiority and equivalence readouts provably
    // score the same experiment); readouts generated as shared text;
    // the verdict compares bit-identical doubles. On this corpus: NOT
    // demonstrably equivalent (t_lower ≈ 0.9 < 1.645) — with n = 750
    // per arm the data can't even prove sameness; the honest twin of
    // q19's under-powered verdict. 100 TB shape: identical to z10.
    "q25_tost" -> ((s, dir) => {
      abMoments(s, dir)
        .selectExpr(tostReadout.map { case (a, e) => s"$e AS $a" }: _*)
    }),

    // ---- Z12: imputation-quality chain gate -------------------------------------
    // The a2 imputer's honest scorecard as one query: hide a keyed-LCG
    // 10% of event values (MCAR — the i-pack injection idea applied to
    // MISSINGNESS), mean-impute per event_type from the OBSERVED rows
    // only (the a2 semantics), and audit against the held-out truth.
    // Bias and RMSE assemble PURELY from exact moments (never a
    // per-row double error sum — see impReadout), so the audit is
    // bit-exact: bias ≈ 0 by MCAR, RMSE ≈ the per-type σ — the
    // textbook mean-imputation floor, which is WHY w22's ffill and the
    // model-based detectors exist. 100 TB shape: ONE conditional
    // map-side agg per type; the readout is scalar.
    "z12_impute_e2e" -> ((s, dir) => {
      import s.implicits._
      val masked = Det.frac($"event_id", MaskSeed) < MaskFrac
      t(s, dir, "events")
        .select($"event_type", $"event_id",
          round($"value" * 100).cast("long").as("cents"),
          masked.as("m"))
        .groupBy($"event_type")
        .agg(sum(when(!$"m", 1L).otherwise(0L)).as("n_obs"),
          sum(when(!$"m", $"cents").otherwise(0L)).as("s_obs"),
          sum(when($"m", 1L).otherwise(0L)).as("n_m"),
          sum(when($"m", $"cents").otherwise(0L)).as("s_m"),
          sum(when($"m", $"cents" * $"cents").otherwise(0L)).as("z2_m"))
        .selectExpr("event_type" +: "n_obs" +: "n_m" +: impCast: _*)
        .selectExpr(Seq("event_type", "n_obs", "n_m") ++
          impReadout.map { case (a, e) => s"$e AS $a" }: _*)
        .orderBy($"event_type")
    }),

    // ---- A74: autocorrelation-robust (Newey–West) standard error -----------
    // The gap between a35/a39 (iid standard errors) and a38/a62 (which
    // PROVE the hourly series carries autocorrelation): the HAC
    // variance of the hourly-mean estimate (Newey & West 1987, Bartlett
    // kernel, L = 3 — the Box–Jenkins depth a38/a56/a62 share), beside
    // the iid se and the inflation factor an experimenter must apply
    // before trusting a time-aggregated metric. Exactness: the per-lag
    // moments (Σv_t·v_{t−k}, head/tail sums) are exact BIGINTs off ONE
    // lag pass; each γ_k assembles in double (n²·Σ crosses int64 first)
    // from generated formula text shared verbatim by both engines; the
    // kernel weights are exact dyadics (0.75/0.5/0.25). 100 TB shape:
    // the SHARED hourly collapse + one per-type window pass + a types-
    // row agg; the readout is scalar.
    "a74_hac_se" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"hr")
      var g = Stats2.holtHourly(s, dir)
      for (k <- 1 to HacL) g = g.withColumn(s"l$k", lag($"v", k).over(w))
      val aggs = Seq(count(lit(1)).as("n"), sum($"v").as("sv")) ++
        (0 to HacL).flatMap { k =>
          val lk = if (k == 0) $"v" else col(s"l$k")
          Seq(
            sum(when(lk.isNotNull, $"v" * lk).otherwise(0L)).as(s"sp$k"),
            sum(when(lk.isNotNull, $"v").otherwise(0L)).as(s"h$k"),
            sum(when(lk.isNotNull, lk).otherwise(0L)).as(s"tl$k"))
        }
      g.groupBy($"event_type").agg(aggs.head, aggs.tail: _*)
        .selectExpr("event_type" +: "n" +: hacCast: _*)
        .selectExpr("event_type" +:
          hacReadout.map { case (a, e) => s"$e AS $a" }: _*)
        .orderBy($"event_type")
    }),

    // ---- A75: Friedman repeated-measures rank test --------------------------
    // The BLOCKED k-group test the family was missing: a53's
    // Kruskal–Wallis treats users as noise; Friedman 1937 blocks on
    // them — each user ranks their own k per-type spends, so
    // between-user level differences cancel. Tie-corrected via the
    // a51/a66 doubled-rank identity (dr = 2·min-rank + eq − 1, exact
    // integer) and the Σ(t³−t) correction; users missing any of the k
    // types are EXCLUDED (complete-block design, the count reported).
    // The block width k is DERIVED from the data (countDistinct of
    // event_type, shared by both engines) — a hardcoded k on a corpus
    // with different type cardinality would silently drop every user
    // and divide by zero; with the derived k the n_complete = 0 case
    // can still occur (no user touches all types), so the χ²_F
    // assembly is CASE-guarded to NULL identically in both engines
    // (ANSI Spark would throw where DuckDB yields inf — the verify
    // gotcha). χ²_F = [3·ΣSD_j²/(n·k·(k+1)) − 3·n·(k+1)] / C with
    // C = 1 − Σ(t³−t)/(n·k·(k²−1)) — every sum an exact BIGINT, one
    // double assembly with the identical shape in both engines.
    // 100 TB shape: ONE (user, type) agg collapses the corpus; the
    // rank window is user-local (k rows per partition); two tiny aggs.
    "a75_friedman" -> ((s, dir) => {
      import s.implicits._
      val ut = t(s, dir, "events")
        .select($"user_id", $"event_type",
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"user_id", $"event_type")
        .agg(sum($"cents").as("v"))
        .localCheckpoint() // feeds the width probe AND the block filter
      val kTot = ut.select($"event_type").distinct()
        .agg(count(lit(1)).as("ktot"))
      val wu = Window.partitionBy($"user_id")
      val complete = ut
        .withColumn("kk", count(lit(1)).over(wu))
        .crossJoin(broadcast(kTot))
        .filter($"kk" === $"ktot")
        .drop("kk", "ktot")
      val nAll = ut.select($"user_id").distinct()
        .agg(count(lit(1)).as("n_users"))
      val ranked = complete
        .withColumn("rmin", rank().over(wu.orderBy($"v")))
        .withColumn("eq", count(lit(1))
          .over(Window.partitionBy($"user_id", $"v")))
        .withColumn("dr", lit(2L) * $"rmin" + $"eq" - lit(1L))
        .localCheckpoint() // feeds the type sums AND the tie terms
      val sd = ranked.groupBy($"event_type").agg(sum($"dr").as("sdj"))
        .agg(count(lit(1)).as("kk"), sum($"sdj" * $"sdj").as("s2"))
      val ties = ranked.groupBy($"user_id", $"v")
        .agg(count(lit(1)).as("t"))
        .agg(coalesce(sum($"t" * $"t" * $"t" - $"t"), lit(0L)).as("st3"))
      val nComp = ranked.select($"user_id").distinct()
        .agg(count(lit(1)).as("n"))
      sd.crossJoin(broadcast(ties.select($"st3")))
        .crossJoin(broadcast(nComp)).crossJoin(broadcast(nAll))
        .selectExpr("kk", "n", "n_users - n AS n_dropped",
          "CAST(s2 AS DOUBLE) AS f_s2", "CAST(n AS DOUBLE) AS f_n",
          "CAST(kk AS DOUBLE) AS f_k", "CAST(st3 AS DOUBLE) AS f_t3")
        .selectExpr("CAST(kk AS INT) AS k_groups", "n AS n_complete",
          "n_dropped", "kk - 1 AS df",
          "CASE WHEN n > 0 THEN " +
            "round((3.0 * f_s2 / (f_n * f_k * (f_k + 1.0)) " +
            "- 3.0 * f_n * (f_k + 1.0)) " +
            "/ (1.0 - f_t3 / (f_n * f_k * (f_k * f_k - 1.0))), 6) " +
            "END AS chi2_f")
    }),

    // ---- T49: train/test split-leakage audit --------------------------------
    // The audit BEFORE t9's decontamination filter: given the standard
    // keyed-LCG 80/20 doc split (the p15 pattern), how much of the test
    // side's 8-gram content already sits in train (the memorization-
    // risk / eval-inflation read — Lee et al. 2022's "train-test
    // overlap" measurement)? Reports split sizes, test docs with ≥1
    // train-shared gram (count + exact ppm), and the distinct shared
    // grams. Docs shorter than the gram width are excluded on both
    // engines (the t9/t26 convention). At sf0.1: 8.2% of test docs
    // leak — the d7 near-dup clusters straddling the split, which is
    // precisely why dedup must run BEFORE splitting (the operator's
    // actionable readout). 100 TB shape: ONE gram explode
    // with per-doc dedup, a gram-keyed semi-join (no fan-out — semi
    // joins never multiply), and four 1-row aggs.
    "t49_split_leakage" -> ((s, dir) => {
      import s.implicits._
      val tk = graft.text.TextOps.tokens($"text")
      val g = t(s, dir, "documents")
        .filter(size(tk) >= LeakN)
        .select($"doc_id",
          (Det.frac($"doc_id", SplitSeed) < TrainFrac).as("is_train"),
          explode(graft.text.TextOps.wordNgrams(tk, LeakN)).as("gram"))
        .distinct()
        .localCheckpoint() // feeds both split sides AND the doc counts
      val trainG = g.filter($"is_train").select($"gram").distinct()
        .localCheckpoint() // feeds the doc semi-join AND the gram count
      val testG = g.filter(!$"is_train")
      val nTr = g.filter($"is_train").select($"doc_id").distinct()
        .agg(count(lit(1)).as("n_train"))
      val nTe = testG.select($"doc_id").distinct()
        .agg(count(lit(1)).as("n_test"))
      val leaky = testG.join(trainG, Seq("gram"), "left_semi")
        .select($"doc_id").distinct().agg(count(lit(1)).as("n_leaky"))
      val shared = testG.select($"gram").distinct()
        .join(trainG, Seq("gram"), "left_semi")
        .agg(count(lit(1)).as("n_shared_grams"))
      nTr.crossJoin(broadcast(nTe)).crossJoin(broadcast(leaky))
        .crossJoin(broadcast(shared))
        .selectExpr("n_train", "n_test", "n_leaky",
          "(n_leaky * 1000000) div n_test AS leak_ppm",
          "n_shared_grams")
    }),

    // ---- Q24: experiment sample-size planner ---------------------------------
    // The PLANNING step the q22→a39→q19→q21 chain starts from: for a
    // grid of relative MDEs, the per-arm sample size a two-arm test
    // needs at α = 0.05 / power 0.8 (n = 2(z_α/2+z_β)²σ²/Δ², the q19
    // arithmetic inverted), and the days to reach it at the observed
    // user-arrival rate. σ² and the mean come from the CONTROL arm of
    // the shared abUsers frame (plan with the data you have — the
    // platform convention). Exactness: control moments exact BIGINT;
    // one double assembly with identical text; ceil()s compare on
    // bit-identical doubles. 100 TB shape: the shared per-user
    // collapse + a 1-row agg × a 4-row broadcast grid.
    "q24_sample_size" -> ((s, dir) => {
      import s.implicits._
      val ctl = abUsers(s, dir).filter($"grp" === 0)
        .agg(count(lit(1)).as("n0"), sum($"y").as("sy0"),
          sum($"y" * $"y").as("syy0"))
      val days = t(s, dir, "events")
        .select(expr("CAST(ts AS LONG) div 86400").as("dd"),
          $"user_id")
        .agg((max($"dd") - min($"dd") + 1L).as("n_days"),
          countDistinct($"user_id").as("n_users"))
      val grid = broadcast(s.createDataFrame(
        Seq(1L, 2L, 5L, 10L).map(Tuple1(_))).toDF("rel_mde_pct"))
      grid.crossJoin(broadcast(ctl)).crossJoin(broadcast(days))
        .selectExpr("rel_mde_pct", "n_days", "n_users",
          "CAST(n0 AS DOUBLE) AS f_n", "CAST(sy0 AS DOUBLE) AS f_sy",
          "CAST(syy0 AS DOUBLE) AS f_syy",
          "CAST(rel_mde_pct AS DOUBLE) AS f_rel")
        .selectExpr("rel_mde_pct",
          "round(f_sy / f_n / 100.0, 6) AS control_mean",
          s"round(2.0 * (${Stats2.Z975} + ${Stats2.Z80}) " +
            s"* (${Stats2.Z975} + ${Stats2.Z80}) " +
            "* ((f_syy - f_sy * f_sy / f_n) / (f_n - 1.0)) " +
            "/ ((f_rel / 100.0 * f_sy / f_n) " +
            "* (f_rel / 100.0 * f_sy / f_n)), 6) AS n_req",
          "n_days", "n_users")
        .selectExpr("rel_mde_pct", "control_mean",
          "CAST(ceil(n_req) AS BIGINT) AS n_per_arm",
          "CAST(ceil(2.0 * n_req / (CAST(n_users AS DOUBLE) " +
            "/ CAST(n_days AS DOUBLE))) AS BIGINT) AS days_to_power")
        .orderBy($"rel_mde_pct")
    }),

    // ---- Z11: decontamination canary end-to-end ------------------------------
    // The self-test a production decontamination path ships with (the
    // a45 PSI-self-check idea at pipeline scale): PLANT doc-unique
    // 8-token canary markers into a keyed-LCG 2% of the corpus, build
    // the eval set from the markers themselves, run the t9-style exact
    // 8-gram matcher over the MODIFIED corpus, and audit what comes
    // back — planted count, caught count, misses, false catches, and
    // recall. Expected 100% recall / 0 false catches BY CONSTRUCTION
    // (doc-unique markers); the value is the seam coverage: tokenizer,
    // gram generator, and matcher are proven to compose — a tokenizer
    // regression that splits 'cy123' differently, or a gram-width
    // drift, turns this row red while every per-stage gate stays
    // green. 100 TB shape: one map-only marker append, the t9 gram
    // explode, gram-keyed semi/anti joins, four 1-row aggs.
    "z11_canary_e2e" -> ((s, dir) => {
      import s.implicits._
      val marked = t(s, dir, "documents")
        .select($"doc_id", $"text",
          (Det.frac($"doc_id", CanarySeed) < CanaryFrac).as("plant"))
        .withColumn("ctext", expr("array_join(transform(" +
          s"sequence(0, ${LeakN - 1}), " +
          s"i -> concat('cy', CAST(doc_id * $LeakN + i AS STRING))), ' ')"))
        .withColumn("text2",
          when($"plant", concat($"text", lit(" "), $"ctext"))
            .otherwise($"text"))
        .localCheckpoint() // feeds the corpus grams AND the eval set
      val tk2 = graft.text.TextOps.tokens($"text2")
      val corpusG = marked.filter(size(tk2) >= LeakN)
        .select($"doc_id", $"plant",
          explode(graft.text.TextOps.wordNgrams(tk2, LeakN)).as("gram"))
        .distinct()
      val evalG = marked.filter($"plant")
        .select($"ctext".as("gram")).distinct()
        .localCheckpoint() // feeds the semi-join AND the planted count
      val caught = corpusG.join(evalG, Seq("gram"), "left_semi")
        .select($"doc_id", $"plant").distinct()
        .localCheckpoint() // feeds the two catch counts
      val nPlant = marked.filter($"plant").agg(count(lit(1)).as("n_planted"))
      val nCaught = caught.filter($"plant")
        .agg(count(lit(1)).as("n_caught"))
      val nFalse = caught.filter(!$"plant")
        .agg(count(lit(1)).as("n_false_catch"))
      nPlant.crossJoin(broadcast(nCaught)).crossJoin(broadcast(nFalse))
        .selectExpr("n_planted", "n_caught",
          "n_planted - n_caught AS n_missed", "n_false_catch",
          "(n_caught * 1000000) div n_planted AS recall_ppm")
    }),

    // ---- W35: Western Electric control-chart rules ---------------------------
    // The classic SPC rule set (Western Electric 1956) over the hourly
    // volume chart — the pattern alarms w31's EWMA chart doesn't
    // encode: R1 one point beyond 3σ; R2 two of three consecutive
    // beyond 2σ, same side; R3 four of five beyond 1σ, same side;
    // R4 eight consecutive on one side of center. Center/σ are the
    // series' own population moments (the w31 self-calibration
    // convention). Reports, per (event_type, rule): violations and the
    // first violating hour. Exactness: moments are exact BIGINT cents;
    // z thresholds compare on bit-identical doubles (the q19 flag
    // convention; no rounding before comparison); rolling rule counts
    // are integer window sums over fixed frames, evaluated only where
    // the frame is FULL. 100 TB shape: the SHARED hourly collapse, one
    // per-type moment agg (broadcast), ONE per-type window pass, a
    // ≤types·4-row report agg.
    "w35_we_rules" -> ((s, dir) => {
      import s.implicits._
      val grid = Stats2.holtHourly(s, dir)
        .localCheckpoint() // feeds the moments AND the chart pass
      val mom = weCalib(grid)
      val w = Window.partitionBy($"event_type").orderBy($"hr")
      def fr(k: Int) = w.rowsBetween(-(k - 1), 0)
      val z = grid.join(broadcast(mom), Seq("event_type"))
        .withColumn("zz", (d($"v") - $"mu") / $"sig")
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("r1", ($"zz" > 3.0 || $"zz" < -3.0).cast("long"))
        .withColumn("r2",
          (($"t" >= 3) && (sum(($"zz" > 2.0).cast("long")).over(fr(3)) >= 2
            || sum(($"zz" < -2.0).cast("long")).over(fr(3)) >= 2))
            .cast("long"))
        .withColumn("r3",
          (($"t" >= 5) && (sum(($"zz" > 1.0).cast("long")).over(fr(5)) >= 4
            || sum(($"zz" < -1.0).cast("long")).over(fr(5)) >= 4))
            .cast("long"))
        .withColumn("r4",
          (($"t" >= 8) && (sum(($"zz" > 0.0).cast("long")).over(fr(8)) === 8
            || sum(($"zz" < 0.0).cast("long")).over(fr(8)) === 8))
            .cast("long"))
      val rules = Seq("r1", "r2", "r3", "r4")
      rules.map { r =>
        z.filter(col(r) === 1L)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_violations"), min($"hr").as("first_hr"))
          .withColumn("rule", lit(r))
      }.reduce(_ unionByName _)
        .select($"event_type", $"rule", $"n_violations", $"first_hr")
        .orderBy($"event_type", $"rule")
    }),

    // ---- A76: Grubbs maximum-outlier test -----------------------------------
    // The FORMAL single-outlier test behind a24's MAD screen (Grubbs
    // 1950): G = max|x − x̄|/s per hourly series, with the suspect hour
    // identified; s is the SAMPLE standard deviation (n−1 denominator,
    // as Grubbs defines it — so G is comparable to the published
    // critical tables). The deviation argmax is exact: |v·n − S| is a
    // pure BIGINT (no division until the final G), packed with the
    // complement-hour-index tie rule (the a69/a70 pack). 100 TB shape:
    // the SHARED hourly collapse + one per-type window pass + one agg
    // with the packed argmax + a types-row readout join.
    "a76_grubbs" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"hr")
      val wp = Window.partitionBy($"event_type")
      val g = Stats2.holtHourly(s, dir)
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("dev",
          abs($"v" * count(lit(1)).over(wp) - sum($"v").over(wp)))
        .localCheckpoint() // feeds the moment agg AND the argmax decode
      val agg = g.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
          sum($"v" * $"v").as("sv2"),
          max($"dev" * CpPackShift +
            (lit(CpPackShift - 1L) - $"t")).as("pk"))
        .localCheckpoint() // feeds the decode AND the moment join
      agg
        .select($"event_type",
          expr(s"pk div $CpPackShift").as("dmax"),
          (lit(CpPackShift - 1L) - expr(s"pk % $CpPackShift")).as("t"))
        .join(g.select($"event_type", $"t", $"hr", $"v"),
          Seq("event_type", "t"))
        .join(broadcast(agg.select($"event_type", $"n", $"sv", $"sv2")),
          Seq("event_type"))
        .selectExpr("event_type", "n", "hr AS outlier_hr",
          "round(CAST(v AS DOUBLE) / 100.0, 6) AS outlier_v",
          "CAST(n AS DOUBLE) AS f_n", "CAST(sv AS DOUBLE) AS f_sv",
          "CAST(sv2 AS DOUBLE) AS f_sv2", "CAST(dmax AS DOUBLE) AS f_d")
        .selectExpr("event_type", "n", "outlier_hr", "outlier_v",
          "round(f_d / f_n / sqrt((f_sv2 - f_sv * f_sv / f_n) " +
            "/ (f_n - 1.0)), 6) AS g_stat")
        .orderBy($"event_type")
    }),

    // ---- A77: Jarque–Bera normality test --------------------------------------
    // The normality gate the test family assumed implicitly (a35/a39's
    // z/t readings lean on CLT; a47 checks randomness, not shape):
    // JB = n/6·(S² + (K−3)²/4) from exact raw moments of the per-event
    // milli-values (Jarque & Bera 1980). Σq³ and Σq⁴ ride
    // DECIMAL(38,0)/HUGEINT (the per-row q³ fits int64; the corpus
    // SUM does not, measured at sf0.1) — the a40 escape path as the
    // production path (the t38 precedent) — and every moment casts to
    // DOUBLE before the one generated-text assembly (identical IEEE
    // both engines; m2^1.5 written sqrt·m2, never pow). 100 TB shape:
    // ONE map-side-combined type agg; the readout is scalar.
    "a77_jarque_bera" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type",
          round($"value" * 1000).cast("long").as("q"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"q").as("s1"),
          sum($"q" * $"q").as("s2"),
          sum(($"q" * $"q").cast("decimal(38,0)") * $"q").as("s3"),
          sum(($"q" * $"q").cast("decimal(38,0)") * ($"q" * $"q"))
            .as("s4"))
        .selectExpr("event_type" +: "n" +: jbCast: _*)
        .selectExpr(Seq("event_type", "n") ++
          jbReadout.map { case (a, e) => s"$e AS $a" }: _*)
        .orderBy($"event_type")
    }),

    // ---- E25: per-dimension Fisher discriminant ratio ---------------------------
    // Supervised feature selection over the labeled embeddings (the
    // one-way ANOVA F per dimension — Fisher 1936's criterion applied
    // coordinate-wise): which dims separate the label classes at all?
    // Completes the embedding audit triad's unsupervised view (e23
    // isotropy, e24 top component) with the SUPERVISED one. Exactness:
    // e6-quantized per-(label, dim) moments are exact BIGINTs; the one
    // fractional per-class term S²/n is the a73 rounded carry (1 e6²
    // unit) so per-dim sums are order-free; F assembles in double with
    // identical text. On these isotropic synthetic embeddings F ≈ 1
    // everywhere (labels don't live in single coordinates) — honest;
    // the operator is the screen that PROVES you need the learned
    // projection (e24) rather than coordinate picks. 100 TB shape: ONE
    // map-only (vec → 64 rows) explode, two map-side-combined aggs
    // (≤ labels·64 and ≤ 64 rows), one dim join.
    "e25_fisher_ratio" -> ((s, dir) => {
      import s.implicits._
      val ex = t(s, dir, "embeddings")
        .select($"label", posexplode(expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"))
          .as(Seq("j", "q")))
        .localCheckpoint() // feeds the class agg AND the dim agg
      // wlj = ⌊slj²/nl⌋ in PURE integer arithmetic (slj² fits int64 at
      // this corpus — ledgered): the a73 rounded-double carry showed a
      // 1-ulp round-tie divergence here (DuckDB half-even vs Spark
      // half-up on an exactly-representable .5), so the fractional
      // term is truncated identically in both engines instead
      val cls = ex.groupBy($"label", $"j")
        .agg(count(lit(1)).as("nl"), sum($"q").as("slj"))
        .withColumn("wlj", expr("(slj * slj) div nl"))
      val perDim = cls.groupBy($"j")
        .agg(count(lit(1)).as("k"), sum($"nl").as("n"),
          sum($"slj").as("s"), sum($"wlj").as("sw"))
      val z2 = ex.groupBy($"j").agg(sum($"q" * $"q").as("z2"))
      perDim.join(z2, Seq("j"))
        .selectExpr("j AS dim", "k", "n",
          "CAST(k AS DOUBLE) AS f_k", "CAST(n AS DOUBLE) AS f_n",
          "CAST(s AS DOUBLE) AS f_s", "CAST(sw AS DOUBLE) AS f_sw",
          "CAST(z2 AS DOUBLE) AS f_z2")
        .selectExpr("dim", "CAST(k AS INT) AS k_classes", "n AS n_vecs",
          "round(((f_sw - f_s * f_s / f_n) / (f_k - 1.0)) " +
            "/ ((f_z2 - f_sw) / (f_n - f_k)), 6) AS f_ratio")
        .orderBy($"dim")
    }),

    // ---- A78: Brown–Forsythe robust variance test -----------------------------
    // The test a77 says to USE: Bartlett (a73) is notoriously
    // normality-sensitive, and a77 just measured skew ≈ 2 / kurtosis
    // ≈ 9 — Brown & Forsythe 1974's median-centered Levene variant is
    // the robust alternative: one-way ANOVA F on z = |q − median_g|.
    // Medians are EXACT lower medians computed on the value-domain
    // frame (counts per (type, q), cumulative over distinct values —
    // the a32 recipe, never a one-task data window). Exactness: z and
    // its group moments are exact BIGINTs; the one fractional
    // per-group term S_g²/n_g is truncated to 1 milli² by a pure
    // DECIMAL(38,0) integer div (the a73 wv carry — tie-free, never a
    // rounded double) so the k-group sum is order-free; F assembles in
    // double from generated text. Same verdict as a73 here (variances
    // differ) — now robust to the measured non-normality. 100 TB
    // shape: ONE (type, q) collapse for the medians + ONE event pass
    // for the z moments + k-row arithmetic.
    "a78_brown_forsythe" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_type",
          round($"value" * 1000).cast("long").as("q"))
      val win = Window.partitionBy($"event_type").orderBy($"q")
      val med = ev.groupBy($"event_type", $"q")
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum($"c").over(win))
        .withColumn("tot", sum($"c").over(Window.partitionBy($"event_type")))
        .filter($"cum" >= expr("(tot + 1) div 2")) // lower-median position
        .groupBy($"event_type").agg(min($"q").as("med"))
      val g = ev.join(broadcast(med), Seq("event_type"))
        .select($"event_type", abs($"q" - $"med").as("z"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("ng"), sum($"z").as("sg"),
          sum($"z" * $"z").as("z2g"))
        .withColumn("wg",
          expr("(CAST(sg AS DECIMAL(38,0)) * sg) div ng"))
      g.agg(count(lit(1)).as("k"), sum($"ng").as("nn"),
          sum($"sg").as("ss"), sum($"wg").as("sw"), sum($"z2g").as("sz2"))
        .selectExpr("k", "nn", "k - 1 AS df1", "nn - k AS df2",
          "CAST(k AS DOUBLE) AS f_k", "CAST(nn AS DOUBLE) AS f_n",
          "CAST(ss AS DOUBLE) AS f_ss", "CAST(sw AS DOUBLE) AS f_sw",
          "CAST(sz2 AS DOUBLE) AS f_z2")
        .selectExpr("CAST(k AS INT) AS k_groups", "nn AS n_total",
          "df1", "df2",
          "round(((f_sw - f_ss * f_ss / f_n) / (f_k - 1.0)) " +
            "/ ((f_z2 - f_sw) / (f_n - f_k)), 6) AS f_stat")
    }))

  /** w35's chart calibration (per-type population mean/σ from exact
    * BIGINT moments) — ONE definition shared with
    * [[graft.streaming.StreamJob.weRulesStream]]'s spec so the twin's
    * center lines can never drift from the batch chart's. */
  private[graft] def weCalib(grid: DataFrame): DataFrame =
    grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("sv2"))
      .select(col("event_type"),
        (d(col("sv")) / d(col("n"))).as("mu"),
        sqrt(d(col("sv2")) / d(col("n"))
          - (d(col("sv")) / d(col("n")))
          * (d(col("sv")) / d(col("n")))).as("sig"))

  /** a74 Newey–West truncation lag (Bartlett kernel, w_k = 1 − k/(L+1));
    * 3 matches the a38/a62 Box–Jenkins identification depth. */
  private val HacL = 3

  /** a74's per-lag moment names and the γ/se assembly — generated ONCE
    * (the d23/a71/z10 recipe). Inputs per type: n, sv (Σv), and per
    * k ∈ 0..L: sp_k (Σ v_t·v_{t−k} over the lag window), h_k
    * (Σ_{t>k} v_t), tl_k (Σ_{t≤n−k} v_t) — all exact BIGINT, pre-cast
    * to DOUBLE under f_ names. γ_k = A_k/n³ with A_k assembled in
    * double (n²·Σ crosses int64 first — the t41 rule). */
  private val hacMoments: Seq[String] =
    "n" +: "sv" +: (0 to HacL).flatMap(k =>
      Seq(s"sp$k", s"h$k", s"tl$k"))
  private val hacCast: Seq[String] =
    hacMoments.map(m => s"CAST($m AS DOUBLE) AS f_$m")
  private val hacReadout: Seq[(String, String)] = {
    def gam(k: Int): String =
      s"((f_n * f_n * f_sp$k - f_n * f_sv * (f_h$k + f_tl$k) " +
        s"+ (f_n - $k.0) * f_sv * f_sv) / (f_n * f_n * f_n))"
    val varHac = (1 to HacL)
      .map(k => s"(2.0 * ${1.0 - k.toDouble / (HacL + 1)} * ${gam(k)})")
      .foldLeft(gam(0))((acc, t) => s"($acc + $t)")
    Seq(
      "n_hours" -> "n",
      "mean_v" -> "round(f_sv / f_n / 100.0, 6)",
      "se_iid" -> s"round(sqrt(${gam(0)} / f_n) / 100.0, 6)",
      "se_hac" -> s"round(sqrt($varHac / f_n) / 100.0, 6)",
      "inflation" -> s"round(sqrt($varHac / f_n) / sqrt(${gam(0)} / f_n), 6)")
  }

  /** a77's moment casts + the skew/kurtosis/JB assembly — generated
    * ONCE (the z10/a74 recipe). Inputs: n, s1..s4 = Σq^k (s3 AND s4
    * carried as DECIMAL(38,0)/HUGEINT — the per-row q³ fits int64 but
    * the corpus SUM does not; the a40 escape path IS the production
    * path here, the t38 precedent — and cast to DOUBLE before any
    * arithmetic). Population central
    * moments by the standard raw-moment expansion; m2^1.5 is written
    * sqrt(m2)·m2 (no pow — identical IEEE in both engines). */
  private val jbCast: Seq[String] =
    Seq("n", "s1", "s2", "s3", "s4").map(m => s"CAST($m AS DOUBLE) AS f_$m")
  private val jbReadout: Seq[(String, String)] = {
    val mu = "(f_s1 / f_n)"
    val m2 = s"(f_s2 / f_n - $mu * $mu)"
    val m3 = s"(f_s3 / f_n - 3.0 * $mu * (f_s2 / f_n) " +
      s"+ 2.0 * $mu * $mu * $mu)"
    val m4 = s"(f_s4 / f_n - 4.0 * $mu * (f_s3 / f_n) " +
      s"+ 6.0 * $mu * $mu * (f_s2 / f_n) - 3.0 * $mu * $mu * $mu * $mu)"
    val sk = s"($m3 / (sqrt($m2) * $m2))"
    val ku = s"($m4 / ($m2 * $m2))"
    Seq(
      "skewness" -> s"round($sk, 6)",
      "kurtosis" -> s"round($ku, 6)",
      "jb_stat" -> (s"round(f_n / 6.0 * ($sk * $sk " +
        s"+ ($ku - 3.0) * ($ku - 3.0) / 4.0), 6)"))
  }

  /** z10/q25's shared per-user experiment moment pass: the 13
    * sufficient statistics in ONE conditional agg off [[abUsers]],
    * pre-cast under f_ names — ONE definition so the superiority
    * chain gate and the equivalence test provably score the same
    * experiment. */
  private def abMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g1 = $"grp" === 1
    abUsers(s, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(g1, 1L).otherwise(0L)).as("n1"),
        sum(when(!g1, 1L).otherwise(0L)).as("n0"),
        sum(when(g1, $"x").otherwise(0L)).as("sx1g"),
        sum(when(!g1, $"x").otherwise(0L)).as("sx0g"),
        sum(when(g1, $"y").otherwise(0L)).as("sy1g"),
        sum(when(!g1, $"y").otherwise(0L)).as("sy0g"),
        sum(when(g1, $"y" * $"y").otherwise(0L)).as("syy1g"),
        sum(when(!g1, $"y" * $"y").otherwise(0L)).as("syy0g"),
        sum($"x").as("sxa"), sum($"y").as("sya"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .selectExpr("n" +: "n1" +: "n0" +: zxCast: _*)
  }

  /** q25 margin (fraction of the control mean) and the one-sided 5%
    * normal quantile (shortest-repr double literal). */
  private val TostMarginFrac = 0.05
  private val Z95 = 1.6448536269514722

  /** q25's TOST readout — generated once (the zxReadout recipe). */
  private val tostReadout: Seq[(String, String)] = {
    val m1 = "(f_sy1g / f_n1)"
    val m0 = "(f_sy0g / f_n0)"
    val v1 = "((f_syy1g - f_sy1g * f_sy1g / f_n1) / (f_n1 - 1.0))"
    val v0 = "((f_syy0g - f_sy0g * f_sy0g / f_n0) / (f_n0 - 1.0))"
    val se = s"sqrt($v1 / f_n1 + $v0 / f_n0)"
    val diff = s"($m1 - $m0)"
    val marg = s"($TostMarginFrac * $m0)"
    val tLo = s"(($diff + $marg) / $se)"
    val tHi = s"(($marg - $diff) / $se)"
    Seq(
      "n1" -> "n1", "n0" -> "n0",
      "diff" -> s"round($diff / 100.0, 6)",
      "margin_abs" -> s"round($marg / 100.0, 6)",
      "t_lower" -> s"round($tLo, 6)",
      "t_upper" -> s"round($tHi, 6)",
      "equivalent" -> s"($tLo > $Z95 AND $tHi > $Z95)")
  }

  /** z10's double casts + readout formulas — generated ONCE and
    * evaluated verbatim by both engines (the d23/a71 recipe), so the
    * chain gate's scalar assembly cannot drift. */
  private val zxCast: Seq[String] =
    Seq("n", "n1", "n0", "sx1g", "sx0g", "sy1g", "sy0g", "syy1g",
      "syy0g", "sxa", "sya", "sxy", "sxx")
      .map(m => s"CAST($m AS DOUBLE) AS f_$m")

  private val zxReadout: Seq[(String, String)] = {
    val theta = "((f_n * f_sxy - f_sxa * f_sya) " +
      "/ (f_n * f_sxx - f_sxa * f_sxa))"
    val m1 = "(f_sy1g / f_n1)"
    val m0 = "(f_sy0g / f_n0)"
    val mx1 = "(f_sx1g / f_n1)"
    val mx0 = "(f_sx0g / f_n0)"
    val v1 = "((f_syy1g - f_sy1g * f_sy1g / f_n1) / (f_n1 - 1.0))"
    val v0 = "((f_syy0g - f_sy0g * f_sy0g / f_n0) / (f_n0 - 1.0))"
    val se = s"sqrt($v1 / f_n1 + $v0 / f_n0)"
    val chi2 = "round((f_n1 - f_n0) * (f_n1 - f_n0) / f_n, 6)"
    val diff = s"($m1 - $m0)"
    val cdiff = s"($diff - $theta * ($mx1 - $mx0))"
    val mde = s"((${Stats2.Z975} + ${Stats2.Z80}) * $se)"
    Seq(
      "n_users" -> "n", "n1" -> "n1", "n0" -> "n0",
      "srm_chi2" -> chi2,
      "srm_alarm" -> s"($chi2 > $Chi2Crit1df)",
      "diff" -> s"round($diff / 100.0, 6)",
      "cuped_diff" -> s"round($cdiff / 100.0, 6)",
      "theta" -> s"round($theta, 6)",
      "welch_t" -> s"round($diff / $se, 6)",
      "mde_abs" -> s"round($mde / 100.0, 6)",
      "powered" -> s"(abs($diff) > $mde)")
  }

  /** e24's DuckDB iteration chain — the d23 emOracleCtes pattern over
    * ARRAY state: per iteration, the matvec (left fold from an exact
    * 0.0 seed, k ascending — DuckDB's init-less list_reduce seeded via
    * list_prepend, the a67 recipe), the norm, and the normalization,
    * mirroring the Spark selectExpr chain operation for operation. */
  private def powIterCtes: String = (1 to PowIters).map { i =>
    val prev = if (i == 1) "p0" else s"p${i - 1}"
    s"""p${i}w AS (
       |  SELECT am, n, list_transform(range(0, $EDim), j ->
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(0, $EDim), k ->
       |        am[j * $EDim + k + 1] * v[k + 1])),
       |      (a, b) -> a + b)) AS w
       |  FROM $prev),
       |p${i}n AS (
       |  SELECT am, n, w,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(w, x -> x * x)), (a, b) -> a + b)) AS nrm
       |  FROM p${i}w),
       |p$i AS (
       |  SELECT am, n, nrm, list_transform(w, x -> x / nrm) AS v
       |  FROM p${i}n)""".stripMargin
  }.mkString(",\n")

  /** DuckDB twin of [[abMoments]]' conditional agg — ONE text shared by
    * the z10 and q25 oracles (mirroring the one shared Spark helper). */
  private val abMomentsSql: String =
    s"""m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n1,
       |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n0,
       |    CAST(sum(CASE WHEN grp = 1 THEN x ELSE 0 END) AS BIGINT)
       |      AS sx1g,
       |    CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT)
       |      AS sx0g,
       |    CAST(sum(CASE WHEN grp = 1 THEN y ELSE 0 END) AS BIGINT)
       |      AS sy1g,
       |    CAST(sum(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT)
       |      AS sy0g,
       |    CAST(sum(CASE WHEN grp = 1 THEN y * y ELSE 0 END) AS BIGINT)
       |      AS syy1g,
       |    CAST(sum(CASE WHEN grp = 0 THEN y * y ELSE 0 END) AS BIGINT)
       |      AS syy0g,
       |    CAST(sum(x) AS BIGINT) AS sxa,
       |    CAST(sum(y) AS BIGINT) AS sya,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM users),
       |c AS (SELECT n, n1, n0, ${zxCast.mkString(",\n    ")} FROM m)""".stripMargin

  /** DuckDB twin of one a71 direction's moment agg (generated so the
    * ten products can't drift from the Spark agg's). */
  private def grangerMomentsSql(label: String, y: String, y1: String,
      x1: String): String =
    s"""SELECT '$label' AS direction, CAST(count(*) AS BIGINT) AS np,
       |    CAST(sum($y) AS BIGINT) AS sy,
       |    CAST(sum($y1) AS BIGINT) AS sy1,
       |    CAST(sum($x1) AS BIGINT) AS sx1,
       |    CAST(sum($y * $y) AS BIGINT) AS syy,
       |    CAST(sum($y1 * $y1) AS BIGINT) AS sy1y1,
       |    CAST(sum($x1 * $x1) AS BIGINT) AS sx1x1,
       |    CAST(sum($y * $y1) AS BIGINT) AS syy1,
       |    CAST(sum($y * $x1) AS BIGINT) AS syx1,
       |    CAST(sum($y1 * $x1) AS BIGINT) AS sy1x1
       |  FROM lf""".stripMargin

  def oracles: Map[String, String] = Map(

    "a70_changepoint" ->
      s"""WITH $hourlyGridSql,
         |pre AS (
         |  SELECT event_type, hr, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr)
         |      AS BIGINT) AS t,
         |    CAST(sum(v) OVER (PARTITION BY event_type ORDER BY hr)
         |      AS BIGINT) AS st
         |  FROM grid),
         |tot AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v) AS BIGINT) AS sn
         |  FROM grid GROUP BY 1),
         |dd AS (
         |  SELECT pre.event_type, pre.hr, pre.t, pre.st, tot.n, tot.sn,
         |    abs(tot.n * pre.st - pre.t * tot.sn) AS dabs
         |  FROM pre JOIN tot USING (event_type)
         |  WHERE pre.t < tot.n),
         |arg AS (
         |  SELECT event_type,
         |    max(dabs * $CpPackShift + (${CpPackShift - 1L} - t)) AS pk
         |  FROM dd GROUP BY 1),
         |sel AS (
         |  SELECT event_type, pk // $CpPackShift AS dmax,
         |    ${CpPackShift - 1L} - (pk % $CpPackShift) AS t
         |  FROM arg)
         |SELECT d.event_type, d.n AS n_hours, d.t AS split_t,
         |  d.hr AS split_hr, sel.dmax,
         |  round(CAST(d.st AS DOUBLE) / CAST(d.t AS DOUBLE) / 100.0, 6)
         |    AS pre_mean,
         |  round((CAST(d.sn AS DOUBLE) - CAST(d.st AS DOUBLE))
         |    / (CAST(d.n AS DOUBLE) - CAST(d.t AS DOUBLE)) / 100.0, 6)
         |    AS post_mean,
         |  round(((CAST(d.sn AS DOUBLE) - CAST(d.st AS DOUBLE))
         |    / (CAST(d.n AS DOUBLE) - CAST(d.t AS DOUBLE))
         |    - CAST(d.st AS DOUBLE) / CAST(d.t AS DOUBLE)) / 100.0, 6)
         |    AS shift
         |FROM sel JOIN dd d
         |  ON d.event_type = sel.event_type AND d.t = sel.t
         |ORDER BY d.event_type""".stripMargin,

    "a71_granger" ->
      s"""WITH $hourlyGridSql,
         |xy AS (
         |  SELECT hr,
         |    max(CASE WHEN event_type = 'click' THEN v END) AS vc,
         |    max(CASE WHEN event_type = 'purchase' THEN v END) AS vp
         |  FROM grid WHERE event_type IN ('click', 'purchase')
         |  GROUP BY hr),
         |lagged AS (
         |  SELECT hr, vc, vp,
         |    lag(vc) OVER (ORDER BY hr) AS vc1,
         |    lag(vp) OVER (ORDER BY hr) AS vp1
         |  FROM xy),
         |lf AS (SELECT * FROM lagged WHERE vc1 IS NOT NULL),
         |m1 AS (${grangerMomentsSql("click->purchase", "vp", "vp1", "vc1")}),
         |m2 AS (${grangerMomentsSql("purchase->click", "vc", "vc1", "vp1")}),
         |mm AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2),
         |cc AS (SELECT direction, np, ${grangerCastCols.mkString(",\n    ")}
         |  FROM mm)
         |SELECT direction, np AS n_used,
         |  ${grangerFormulaSql.map { case (a, f) => s"$f AS $a" }
            .mkString(",\n  ")}
         |FROM cc ORDER BY direction""".stripMargin,

    "q21_cuped" ->
      s"""WITH $abUsersSql,
         |pooled AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM users),
         |pf AS (
         |  SELECT n, sx,
         |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS cov,
         |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS vx,
         |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS vy
         |  FROM pooled),
         |pt AS (
         |  SELECT n, sx, cov / vx AS theta,
         |    cov * cov / (vx * vy) AS rho2 FROM pf),
         |arms AS (
         |  SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(sum(x) AS BIGINT) AS sxg, CAST(sum(y) AS BIGINT) AS syg
         |  FROM users GROUP BY grp)
         |SELECT grp, n_users,
         |  round(CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0, 6)
         |    AS mean_y,
         |  round((CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE) - theta *
         |    (CAST(sxg AS DOUBLE) / CAST(n_users AS DOUBLE)
         |      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0, 6)
         |    AS mean_y_cuped,
         |  round(theta, 6) AS theta,
         |  round(rho2, 6) AS var_reduction
         |FROM arms CROSS JOIN pt ORDER BY grp""".stripMargin,

    "g12_conductance" ->
      s"""WITH ${Analytics.lpaOracleCtes},
         |lab AS (SELECT node, lbl FROM l${Analytics.LpaRounds}),
         |m2 AS (SELECT CAST(count(*) AS BIGINT) AS e2 FROM edges),
         |el AS (
         |  SELECT ls.lbl AS lbl,
         |    CASE WHEN ls.lbl <> ld.lbl THEN 1 ELSE 0 END AS x
         |  FROM edges e
         |  JOIN lab ls ON ls.node = e.src
         |  JOIN lab ld ON ld.node = e.dst),
         |comm AS (
         |  SELECT lbl, CAST(count(*) AS BIGINT) AS vol,
         |    CAST(sum(x) AS BIGINT) AS cut
         |  FROM el GROUP BY 1),
         |nn AS (
         |  SELECT lbl, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM lab GROUP BY 1)
         |SELECT comm.lbl, nn.n_nodes, comm.vol, comm.cut,
         |  CASE WHEN least(comm.vol, m2.e2 - comm.vol) > 0
         |    THEN (comm.cut * 1000000)
         |      // least(comm.vol, m2.e2 - comm.vol) END AS phi_ppm
         |FROM comm JOIN nn USING (lbl) CROSS JOIN m2
         |ORDER BY comm.lbl""".stripMargin,

    "g13_clustering" ->
      s"""WITH ${Analytics.coPurchaseEdgesSql},
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS node FROM edges
         |    UNION ALL SELECT b FROM edges)
         |  GROUP BY node),
         |tri AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
         |    SELECT a AS node FROM tris
         |    UNION ALL SELECT b FROM tris
         |    UNION ALL SELECT c FROM tris)
         |  GROUP BY node),
         |nn AS (
         |  SELECT deg.deg, COALESCE(tri.tri, 0) AS tri0,
         |    (COALESCE(tri.tri, 0) * 2000000)
         |      // (deg.deg * (deg.deg - 1)) AS cc_ppm
         |  FROM deg LEFT JOIN tri ON tri.node = deg.node
         |  WHERE deg.deg >= 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(CASE WHEN tri0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_closed,
         |  max(deg) AS max_deg,
         |  CAST(sum(tri0) AS BIGINT) // 3 AS n_triangles,
         |  CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS wedges,
         |  (CAST(sum(tri0) AS BIGINT) * 1000000)
         |    // CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS trans_ppm,
         |  round(CAST(sum(cc_ppm) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    / 1e6, 6) AS avg_cc
         |FROM nn""".stripMargin,

    "a72_hurst" ->
      s"""WITH $hourlyGridSql,
         |ser AS (
         |  SELECT event_type, hr, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr)
         |      AS BIGINT) AS t
         |  FROM grid),
         |gm AS (
         |  SELECT ser.event_type, ser.v, ser.t, CAST(mm.m AS BIGINT) AS m,
         |    (ser.t - 1) // CAST(mm.m AS BIGINT) AS blk,
         |    ser.t - 1 - CAST(mm.m AS BIGINT)
         |      * ((ser.t - 1) // CAST(mm.m AS BIGINT)) + 1 AS k
         |  FROM ser CROSS JOIN (VALUES ${HurstMs.map(m => s"($m)")
            .mkString(", ")}) mm(m)),
         |wins AS (
         |  SELECT event_type, m, blk, k,
         |    CAST(count(*) OVER (PARTITION BY event_type, m, blk)
         |      AS BIGINT) AS nb,
         |    CAST(sum(v) OVER (PARTITION BY event_type, m, blk ORDER BY k
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS sk,
         |    CAST(sum(v) OVER (PARTITION BY event_type, m, blk)
         |      AS BIGINT) AS sm,
         |    CAST(sum(v * v) OVER (PARTITION BY event_type, m, blk)
         |      AS BIGINT) AS sx2
         |  FROM gm),
         |blocks AS (
         |  SELECT event_type, m,
         |    CAST(round((CAST(max(m * sk - k * sm) AS DOUBLE)
         |        - CAST(min(m * sk - k * sm) AS DOUBLE))
         |      / sqrt(CAST(max(m * sx2 - sm * sm) AS DOUBLE)) * 1e6)
         |      AS BIGINT) AS rs_e6
         |  FROM wins WHERE nb = m
         |  GROUP BY event_type, m, blk
         |  HAVING max(m * sx2 - sm * sm) > 0),
         |per_m AS (
         |  SELECT event_type, m, CAST(count(*) AS BIGINT) AS n_blocks,
         |    CAST(sum(rs_e6) AS BIGINT) AS s_rs,
         |    CAST(round(ln(CAST(m AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         |    CAST(round(ln(CAST(sum(rs_e6) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE) / 1e6) * 1e6) AS BIGINT) AS y
         |  FROM blocks GROUP BY event_type, m),
         |st AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM per_m GROUP BY event_type),
         |fit AS (
         |  SELECT event_type,
         |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
         |      THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         |      END AS hurst_h
         |  FROM st)
         |SELECT p.event_type, p.m, p.n_blocks,
         |  round(CAST(p.s_rs AS DOUBLE) / CAST(p.n_blocks AS DOUBLE)
         |    / 1e6, 6) AS avg_rs,
         |  fit.hurst_h
         |FROM per_m p JOIN fit USING (event_type)
         |ORDER BY p.event_type, p.m""".stripMargin,

    "q25_tost" ->
      s"""WITH $abUsersSql,
         |$abMomentsSql
         |SELECT ${tostReadout.map { case (a, e) => s"$e AS $a" }
            .mkString(",\n  ")}
         |FROM c""".stripMargin,

    "e25_fisher_ratio" ->
      s"""WITH ex AS (
         |  SELECT label, j, q FROM (
         |    SELECT label,
         |      unnest(range(0, $EDim)) AS j,
         |      unnest(list_transform(embedding,
         |        x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS q
         |    FROM embeddings)),
         |cls AS (
         |  SELECT label, j, CAST(count(*) AS BIGINT) AS nl,
         |    CAST(sum(q) AS BIGINT) AS slj
         |  FROM ex GROUP BY label, j),
         |cls2 AS (
         |  SELECT label, j, nl, slj, (slj * slj) // nl AS wlj
         |  FROM cls),
         |per_dim AS (
         |  SELECT j, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(nl) AS BIGINT) AS n,
         |    CAST(sum(slj) AS BIGINT) AS s,
         |    CAST(sum(wlj) AS BIGINT) AS sw
         |  FROM cls2 GROUP BY j),
         |z2 AS (
         |  SELECT j, CAST(sum(q * q) AS BIGINT) AS z2
         |  FROM ex GROUP BY j),
         |c AS (
         |  SELECT CAST(per_dim.j AS INT) AS dim, k, n,
         |    CAST(k AS DOUBLE) AS f_k, CAST(n AS DOUBLE) AS f_n,
         |    CAST(s AS DOUBLE) AS f_s, CAST(sw AS DOUBLE) AS f_sw,
         |    CAST(z2.z2 AS DOUBLE) AS f_z2
         |  FROM per_dim JOIN z2 ON z2.j = per_dim.j)
         |SELECT dim, CAST(k AS INT) AS k_classes, n AS n_vecs,
         |  round(((f_sw - f_s * f_s / f_n) / (f_k - 1.0))
         |    / ((f_z2 - f_sw) / (f_n - f_k)), 6) AS f_ratio
         |FROM c ORDER BY dim""".stripMargin,

    "z12_impute_e2e" ->
      s"""WITH m AS (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN NOT mk THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_obs,
         |    CAST(sum(CASE WHEN NOT mk THEN cents ELSE 0 END) AS BIGINT)
         |      AS s_obs,
         |    CAST(sum(CASE WHEN mk THEN 1 ELSE 0 END) AS BIGINT) AS n_m,
         |    CAST(sum(CASE WHEN mk THEN cents ELSE 0 END) AS BIGINT)
         |      AS s_m,
         |    CAST(sum(CASE WHEN mk THEN cents * cents ELSE 0 END)
         |      AS BIGINT) AS z2_m
         |  FROM (
         |    SELECT event_type,
         |      CAST(round(value * 100) AS BIGINT) AS cents,
         |      (${Det.fracSql("event_id", MaskSeed)} < $MaskFrac) AS mk
         |    FROM events)
         |  GROUP BY event_type),
         |c AS (SELECT event_type, n_obs, n_m,
         |  ${impCast.mkString(",\n  ")} FROM m)
         |SELECT event_type, n_obs, n_m,
         |  ${impReadout.map { case (a, e) => s"$e AS $a" }
            .mkString(",\n  ")}
         |FROM c ORDER BY event_type""".stripMargin,

    "a78_brown_forsythe" ->
      s"""WITH ev AS (
         |  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS q
         |  FROM events),
         |vc AS (
         |  SELECT event_type, q, CAST(count(*) AS BIGINT) AS c
         |  FROM ev GROUP BY event_type, q),
         |cw AS (
         |  SELECT event_type, q,
         |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY q)
         |      AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS tot
         |  FROM vc),
         |med AS (
         |  SELECT event_type, CAST(min(q) AS BIGINT) AS med
         |  FROM cw WHERE cum >= (tot + 1) // 2
         |  GROUP BY event_type),
         |g AS (
         |  SELECT ev.event_type, CAST(count(*) AS BIGINT) AS ng,
         |    CAST(sum(abs(ev.q - med.med)) AS BIGINT) AS sg,
         |    CAST(sum(abs(ev.q - med.med) * abs(ev.q - med.med))
         |      AS BIGINT) AS z2g
         |  FROM ev JOIN med ON med.event_type = ev.event_type
         |  GROUP BY ev.event_type),
         |g2 AS (
         |  SELECT event_type, ng, sg, z2g,
         |    CAST((CAST(sg AS HUGEINT) * sg) // ng AS BIGINT) AS wg
         |  FROM g),
         |ag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(ng) AS BIGINT) AS nn,
         |    CAST(sum(sg) AS BIGINT) AS ss,
         |    CAST(sum(wg) AS BIGINT) AS sw,
         |    CAST(sum(z2g) AS BIGINT) AS sz2
         |  FROM g2),
         |c AS (
         |  SELECT k, nn, k - 1 AS df1, nn - k AS df2,
         |    CAST(k AS DOUBLE) AS f_k, CAST(nn AS DOUBLE) AS f_n,
         |    CAST(ss AS DOUBLE) AS f_ss, CAST(sw AS DOUBLE) AS f_sw,
         |    CAST(sz2 AS DOUBLE) AS f_z2
         |  FROM ag)
         |SELECT CAST(k AS INT) AS k_groups, nn AS n_total, df1, df2,
         |  round(((f_sw - f_ss * f_ss / f_n) / (f_k - 1.0))
         |    / ((f_z2 - f_sw) / (f_n - f_k)), 6) AS f_stat
         |FROM c""".stripMargin,

    "a77_jarque_bera" ->
      s"""WITH m AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(q) AS BIGINT) AS s1,
         |    CAST(sum(q * q) AS BIGINT) AS s2,
         |    CAST(sum(CAST(q * q AS HUGEINT) * q)
         |      AS DECIMAL(38, 0)) AS s3,
         |    CAST(sum(CAST(q * q AS HUGEINT) * (q * q))
         |      AS DECIMAL(38, 0)) AS s4
         |  FROM (SELECT event_type,
         |      CAST(round(value * 1000) AS BIGINT) AS q FROM events)
         |  GROUP BY event_type),
         |c AS (SELECT event_type, n, ${jbCast.mkString(",\n    ")}
         |  FROM m)
         |SELECT event_type, n,
         |  ${jbReadout.map { case (a, e) => s"$e AS $a" }
            .mkString(",\n  ")}
         |FROM c ORDER BY event_type""".stripMargin,

    "a76_grubbs" ->
      s"""WITH $hourlyGridSql,
         |g AS (
         |  SELECT event_type, hr, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr)
         |      AS BIGINT) AS t,
         |    abs(v * CAST(count(*) OVER (PARTITION BY event_type)
         |        AS BIGINT)
         |      - CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT))
         |      AS dev
         |  FROM grid),
         |agg AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v) AS BIGINT) AS sv,
         |    CAST(sum(v * v) AS BIGINT) AS sv2,
         |    max(dev * $CpPackShift + (${CpPackShift - 1L} - t)) AS pk
         |  FROM g GROUP BY event_type),
         |sel AS (
         |  SELECT event_type, n, sv, sv2, pk // $CpPackShift AS dmax,
         |    ${CpPackShift - 1L} - (pk % $CpPackShift) AS t
         |  FROM agg),
         |j AS (
         |  SELECT sel.event_type, sel.n, g.hr, g.v,
         |    CAST(sel.n AS DOUBLE) AS f_n, CAST(sel.sv AS DOUBLE) AS f_sv,
         |    CAST(sel.sv2 AS DOUBLE) AS f_sv2,
         |    CAST(sel.dmax AS DOUBLE) AS f_d
         |  FROM sel JOIN g ON g.event_type = sel.event_type
         |    AND g.t = sel.t)
         |SELECT event_type, n, hr AS outlier_hr,
         |  round(CAST(v AS DOUBLE) / 100.0, 6) AS outlier_v,
         |  round(f_d / f_n / sqrt((f_sv2 - f_sv * f_sv / f_n)
         |    / (f_n - 1.0)), 6) AS g_stat
         |FROM j ORDER BY event_type""".stripMargin,

    "w35_we_rules" -> {
      val ruleSel = Seq("r1", "r2", "r3", "r4").map { r =>
        s"""SELECT event_type, '$r' AS rule,
           |    CAST(count(*) AS BIGINT) AS n_violations,
           |    min(hr) AS first_hr
           |  FROM rr WHERE $r = 1 GROUP BY event_type""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH $hourlyGridSql,
         |mom AS (
         |  SELECT event_type,
         |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
         |    sqrt(CAST(sum(v * v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |      - (CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |      * (CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)))
         |      AS sig
         |  FROM grid GROUP BY event_type),
         |z AS (
         |  SELECT g.event_type, g.hr,
         |    (CAST(g.v AS DOUBLE) - m.mu) / m.sig AS zz,
         |    CAST(row_number() OVER (PARTITION BY g.event_type
         |      ORDER BY g.hr) AS BIGINT) AS t
         |  FROM grid g JOIN mom m USING (event_type)),
         |rr AS (
         |  SELECT event_type, hr,
         |    CASE WHEN zz > 3.0 OR zz < -3.0 THEN 1 ELSE 0 END AS r1,
         |    CASE WHEN t >= 3 AND (
         |      sum(CASE WHEN zz > 2.0 THEN 1 ELSE 0 END) OVER w3 >= 2 OR
         |      sum(CASE WHEN zz < -2.0 THEN 1 ELSE 0 END) OVER w3 >= 2)
         |      THEN 1 ELSE 0 END AS r2,
         |    CASE WHEN t >= 5 AND (
         |      sum(CASE WHEN zz > 1.0 THEN 1 ELSE 0 END) OVER w5 >= 4 OR
         |      sum(CASE WHEN zz < -1.0 THEN 1 ELSE 0 END) OVER w5 >= 4)
         |      THEN 1 ELSE 0 END AS r3,
         |    CASE WHEN t >= 8 AND (
         |      sum(CASE WHEN zz > 0.0 THEN 1 ELSE 0 END) OVER w8 = 8 OR
         |      sum(CASE WHEN zz < 0.0 THEN 1 ELSE 0 END) OVER w8 = 8)
         |      THEN 1 ELSE 0 END AS r4
         |  FROM z
         |  WINDOW
         |    w3 AS (PARTITION BY event_type ORDER BY hr
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         |    w5 AS (PARTITION BY event_type ORDER BY hr
         |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         |    w8 AS (PARTITION BY event_type ORDER BY hr
         |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
         |SELECT event_type, rule, n_violations, first_hr FROM (
         |  $ruleSel)
         |ORDER BY event_type, rule""".stripMargin
    },

    "z11_canary_e2e" ->
      s"""WITH marked AS (
         |  SELECT doc_id, text,
         |    (${Det.fracSql("doc_id", CanarySeed)} < $CanaryFrac)
         |      AS plant,
         |    array_to_string(list_transform(range(0, $LeakN),
         |      i -> 'cy' || CAST(doc_id * $LeakN + i AS VARCHAR)), ' ')
         |      AS ctext
         |  FROM documents),
         |m2 AS (
         |  SELECT doc_id, plant, ctext,
         |    CASE WHEN plant THEN text || ' ' || ctext ELSE text END
         |      AS text2
         |  FROM marked),
         |cg AS (
         |  SELECT DISTINCT doc_id, plant, gram FROM (
         |    SELECT doc_id, plant, unnest(list_transform(
         |      generate_series(0, greatest(len(tk) - $LeakN, 0)),
         |      i -> array_to_string(list_slice(tk, i + 1, i + $LeakN),
         |        ' '))) AS gram
         |    FROM (SELECT doc_id, plant,
         |          list_filter(string_split(text2, ' '),
         |            x -> len(x) > 0) AS tk
         |          FROM m2)
         |    WHERE len(tk) >= $LeakN)),
         |eg AS (SELECT DISTINCT ctext AS gram FROM m2 WHERE plant),
         |caught AS (
         |  SELECT DISTINCT c.doc_id, c.plant
         |  FROM cg c SEMI JOIN eg ON c.gram = eg.gram),
         |np AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_planted
         |  FROM m2 WHERE plant),
         |nc AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_caught
         |  FROM caught WHERE plant),
         |nf AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_false_catch
         |  FROM caught WHERE NOT plant)
         |SELECT n_planted, n_caught, n_planted - n_caught AS n_missed,
         |  n_false_catch,
         |  (n_caught * 1000000) // n_planted AS recall_ppm
         |FROM np CROSS JOIN nc CROSS JOIN nf""".stripMargin,

    "q24_sample_size" ->
      s"""WITH $abUsersSql,
         |ctl AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(y) AS BIGINT) AS sy0,
         |    CAST(sum(y * y) AS BIGINT) AS syy0
         |  FROM users WHERE grp = 0),
         |days AS (
         |  SELECT CAST(max(dd) - min(dd) + 1 AS BIGINT) AS n_days,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |  FROM ev),
         |c AS (
         |  SELECT CAST(g.r AS BIGINT) AS rel_mde_pct, n_days, n_users,
         |    CAST(n0 AS DOUBLE) AS f_n, CAST(sy0 AS DOUBLE) AS f_sy,
         |    CAST(syy0 AS DOUBLE) AS f_syy,
         |    CAST(CAST(g.r AS BIGINT) AS DOUBLE) AS f_rel
         |  FROM (VALUES (1), (2), (5), (10)) g(r)
         |  CROSS JOIN ctl CROSS JOIN days),
         |r AS (
         |  SELECT rel_mde_pct,
         |    round(f_sy / f_n / 100.0, 6) AS control_mean,
         |    round(2.0 * (${Stats2.Z975} + ${Stats2.Z80})
         |      * (${Stats2.Z975} + ${Stats2.Z80})
         |      * ((f_syy - f_sy * f_sy / f_n) / (f_n - 1.0))
         |      / ((f_rel / 100.0 * f_sy / f_n)
         |      * (f_rel / 100.0 * f_sy / f_n)), 6) AS n_req,
         |    n_days, n_users
         |  FROM c)
         |SELECT rel_mde_pct, control_mean,
         |  CAST(ceil(n_req) AS BIGINT) AS n_per_arm,
         |  CAST(ceil(2.0 * n_req / (CAST(n_users AS DOUBLE)
         |    / CAST(n_days AS DOUBLE))) AS BIGINT) AS days_to_power
         |FROM r ORDER BY rel_mde_pct""".stripMargin,

    "t49_split_leakage" ->
      s"""WITH g AS (
         |  SELECT DISTINCT doc_id,
         |    (${Det.fracSql("doc_id", SplitSeed)} < $TrainFrac)
         |      AS is_train,
         |    gram
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(0, greatest(len(tk) - $LeakN, 0)),
         |      i -> array_to_string(list_slice(tk, i + 1, i + $LeakN),
         |        ' '))) AS gram
         |    FROM (SELECT doc_id, ${Curate.tokensSqlExpr} AS tk
         |          FROM documents)
         |    WHERE len(tk) >= $LeakN)),
         |train_g AS (SELECT DISTINCT gram FROM g WHERE is_train),
         |test_g AS (SELECT doc_id, gram FROM g WHERE NOT is_train),
         |n_tr AS (
         |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_train
         |  FROM g WHERE is_train),
         |n_te AS (
         |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_test
         |  FROM test_g),
         |leaky AS (
         |  SELECT CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_leaky
         |  FROM test_g t SEMI JOIN train_g tr ON t.gram = tr.gram),
         |shared AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_shared_grams FROM (
         |    SELECT DISTINCT t.gram FROM test_g t
         |    SEMI JOIN train_g tr ON t.gram = tr.gram))
         |SELECT n_train, n_test, n_leaky,
         |  (n_leaky * 1000000) // n_test AS leak_ppm, n_shared_grams
         |FROM n_tr CROSS JOIN n_te CROSS JOIN leaky
         |CROSS JOIN shared""".stripMargin,

    "a75_friedman" ->
      s"""WITH ut AS (
         |  SELECT user_id, event_type,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY user_id, event_type),
         |ktot AS (
         |  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS ktot
         |  FROM ut),
         |comp AS (
         |  SELECT user_id, event_type, v,
         |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS kk2
         |  FROM ut),
         |nall AS (
         |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |  FROM ut),
         |ranked AS (
         |  SELECT user_id, event_type, v,
         |    CAST(rank() OVER (PARTITION BY user_id ORDER BY v)
         |      AS BIGINT) AS rmin,
         |    CAST(count(*) OVER (PARTITION BY user_id, v) AS BIGINT) AS eq
         |  FROM comp WHERE kk2 = (SELECT ktot FROM ktot)),
         |dr AS (
         |  SELECT user_id, event_type, v, 2 * rmin + eq - 1 AS dr
         |  FROM ranked),
         |sd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS kk,
         |    CAST(sum(sdj * sdj) AS BIGINT) AS s2
         |  FROM (SELECT event_type, CAST(sum(dr) AS BIGINT) AS sdj
         |        FROM dr GROUP BY event_type)),
         |ties AS (
         |  SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS st3
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS t
         |        FROM dr GROUP BY user_id, v)),
         |ncomp AS (
         |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM dr),
         |c AS (
         |  SELECT kk, n, n_users - n AS n_dropped,
         |    CAST(s2 AS DOUBLE) AS f_s2, CAST(n AS DOUBLE) AS f_n,
         |    CAST(kk AS DOUBLE) AS f_k, CAST(st3 AS DOUBLE) AS f_t3
         |  FROM sd CROSS JOIN ties CROSS JOIN ncomp CROSS JOIN nall)
         |SELECT CAST(kk AS INT) AS k_groups, n AS n_complete, n_dropped,
         |  kk - 1 AS df,
         |  CASE WHEN n > 0 THEN
         |    round((3.0 * f_s2 / (f_n * f_k * (f_k + 1.0))
         |      - 3.0 * f_n * (f_k + 1.0))
         |      / (1.0 - f_t3 / (f_n * f_k * (f_k * f_k - 1.0))), 6)
         |    END AS chi2_f
         |FROM c""".stripMargin,

    "a74_hac_se" ->
      s"""WITH $hourlyGridSql,
         |lagd AS (
         |  SELECT event_type, hr, v,
         |${(1 to HacL).map(k => s"    lag(v, $k) OVER (PARTITION BY " +
            s"event_type ORDER BY hr) AS l$k").mkString(",\n")}
         |  FROM grid),
         |m AS (
         |  SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v) AS BIGINT) AS sv,
         |${(0 to HacL).flatMap { k =>
            val lk = if (k == 0) "v" else s"l$k"
            Seq(
              s"    CAST(sum(CASE WHEN $lk IS NOT NULL THEN v * $lk " +
                s"ELSE 0 END) AS BIGINT) AS sp$k",
              s"    CAST(sum(CASE WHEN $lk IS NOT NULL THEN v " +
                s"ELSE 0 END) AS BIGINT) AS h$k",
              s"    CAST(sum(CASE WHEN $lk IS NOT NULL THEN $lk " +
                s"ELSE 0 END) AS BIGINT) AS tl$k")
          }.mkString(",\n")}
         |  FROM lagd GROUP BY event_type),
         |c AS (SELECT event_type, n, ${hacCast.mkString(",\n    ")}
         |  FROM m)
         |SELECT event_type,
         |  ${hacReadout.map { case (a, e) => s"$e AS $a" }
            .mkString(",\n  ")}
         |FROM c ORDER BY event_type""".stripMargin,

    "z10_experiment_e2e" ->
      s"""WITH $abUsersSql,
         |$abMomentsSql
         |SELECT ${zxReadout.map { case (a, e) => s"$e AS $a" }
            .mkString(",\n  ")}
         |FROM c""".stripMargin,

    "a73_bartlett" ->
      s"""WITH g0 AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(q) AS BIGINT) AS sq,
         |    CAST(sum(q * q) AS BIGINT) AS sq2
         |  FROM (SELECT event_type,
         |      CAST(round(value * 1000) AS BIGINT) AS q FROM events)
         |  GROUP BY event_type),
         |g AS (
         |  SELECT event_type, n, sq, sq2,
         |    (CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
         |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v,
         |    CAST(round(ln((CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE)
         |      * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(n AS DOUBLE) - 1.0)) * 1e6) AS BIGINT) AS l6,
         |    sq2 - CAST((CAST(sq AS HUGEINT) * sq) // n AS BIGINT) AS wv,
         |    1000000000000 // (n - 1) AS r12
         |  FROM g0),
         |ag AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(sum((n - 1) * l6) AS BIGINT) AS swl,
         |    CAST(sum(wv) AS BIGINT) AS swv,
         |    CAST(sum(r12) AS BIGINT) AS sr12
         |  FROM g),
         |f AS (
         |  SELECT k, nn,
         |    CAST(swv AS DOUBLE) / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
         |      AS spv,
         |    swl, sr12
         |  FROM ag),
         |f2 AS (
         |  SELECT k, nn,
         |    (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)) * ln(spv)
         |      - CAST(swl AS DOUBLE) / 1e6 AS num,
         |    1.0 + (CAST(sr12 AS DOUBLE) / 1e12
         |      - 1.0 / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
         |      / (3.0 * (CAST(k AS DOUBLE) - 1.0)) AS cc
         |  FROM f)
         |SELECT CAST(k AS INT) AS k_groups, nn AS n_total,
         |  k - 1 AS df, round(num / cc, 6) AS chi2
         |FROM f2""".stripMargin,

    "e24_top_component" ->
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
         |  FROM embeddings),
         |pr AS (
         |  SELECT u[1] AS j, u[2] AS k, u[3] AS p FROM (
         |    SELECT unnest(flatten(list_transform(range(0, $EDim), j ->
         |      list_transform(range(j, $EDim), k ->
         |        [j, k, q[j + 1] * q[k + 1]])))) AS u
         |    FROM q)),
         |pairs AS (
         |  SELECT j, k, CAST(sum(p) AS BIGINT) AS s2
         |  FROM pr GROUP BY j, k),
         |sums AS (
         |  SELECT j, CAST(sum(qj) AS BIGINT) AS s1 FROM (
         |    SELECT unnest(range(0, $EDim)) AS j, unnest(q) AS qj FROM q)
         |  GROUP BY j),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         |mm AS (
         |  SELECT p.j, p.k,
         |    (CAST(nn.n AS DOUBLE) * CAST(p.s2 AS DOUBLE)
         |      - CAST(sj.s1 AS DOUBLE) * CAST(sk.s1 AS DOUBLE)) AS m
         |  FROM pairs p
         |  JOIN sums sj ON sj.j = p.j
         |  JOIN sums sk ON sk.j = p.k
         |  CROSS JOIN nn),
         |mfull AS (
         |  SELECT j * $EDim + k AS idx, m FROM mm
         |  UNION ALL SELECT k * $EDim + j, m FROM mm WHERE j <> k),
         |p0 AS (
         |  SELECT list(m ORDER BY idx) AS am,
         |    (SELECT n FROM nn) AS n,
         |    list_transform(range(0, $EDim),
         |      x -> CAST(0.125 AS DOUBLE)) AS v,
         |    CAST(0.0 AS DOUBLE) AS nrm
         |  FROM mfull),
         |$powIterCtes,
         |fin AS (
         |  SELECT n, nrm, v,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(0, $EDim),
         |        j -> am[j * $EDim + j + 1])), (a, b) -> a + b) AS tr,
         |    list_aggregate(list_transform(range(0, $EDim), j ->
         |      CAST(round(abs(v[j + 1]) * 1000000) AS BIGINT) * $EDim
         |        + ${EDim - 1} - j), 'max') AS pk
         |  FROM p$PowIters)
         |SELECT n AS n_vecs, $EDim AS dim,
         |  round(nrm / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12), 6)
         |    AS top_eigenvalue,
         |  round(nrm / tr, 6) AS explained_ratio,
         |  CAST(${EDim - 1} - pk % $EDim AS INT) AS top_dim,
         |  round(CAST(pk // $EDim AS DOUBLE) / 1e6, 6) AS top_loading
         |FROM fin""".stripMargin,

    "q23_stickiness" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id,
         |    ${Det.epochSSql("ts")} // 86400 AS dd
         |  FROM events),
         |d0 AS (SELECT min(dd) AS d_min FROM ud),
         |dau AS (
         |  SELECT dd, CAST(count(*) AS BIGINT) AS dau
         |  FROM ud GROUP BY dd),
         |contrib AS (
         |  SELECT DISTINCT user_id, dd + o AS dd FROM (
         |    SELECT user_id, dd, unnest(range(0, 30)) AS o FROM ud)),
         |mau AS (
         |  SELECT dd, CAST(count(*) AS BIGINT) AS mau
         |  FROM contrib GROUP BY dd)
         |SELECT dau.dd, dau.dau, mau.mau,
         |  least(dau.dd - d0.d_min + 1, 30) AS days_observed,
         |  (dau.dau * 1000000) // mau.mau AS stick_ppm
         |FROM dau JOIN mau USING (dd) CROSS JOIN d0
         |ORDER BY dau.dd""".stripMargin,

    "t47_readability" ->
      s"""WITH pd AS (
         |  SELECT lang,
         |    CAST(len(${Curate.tokensSqlExpr}) AS BIGINT) AS w,
         |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
         |      AS BIGINT) AS vg
         |  FROM documents),
         |ag AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(w) AS BIGINT) AS words,
         |    CAST(sum(vg) AS BIGINT) AS vgroups
         |  FROM pd GROUP BY lang)
         |SELECT lang, n_docs, words, vgroups,
         |  round(CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         |    AS words_per_doc,
         |  round(CAST(vgroups AS DOUBLE) / CAST(words AS DOUBLE), 6)
         |    AS syll_per_word,
         |  round(206.835
         |    - 1.015 * (CAST(words AS DOUBLE) / CAST(n_docs AS DOUBLE))
         |    - 84.6 * (CAST(vgroups AS DOUBLE) / CAST(words AS DOUBLE)),
         |    6) AS fre
         |FROM ag ORDER BY lang""".stripMargin,

    "t48_heaps" ->
      s"""WITH docs AS (
         |  SELECT doc_id, ${Curate.tokensSqlExpr} AS tk FROM documents),
         |ranked AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS ntok,
         |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER () AS BIGINT) AS nn
         |  FROM docs),
         |cuts AS (
         |  SELECT CAST(t.k AS BIGINT) AS k,
         |    (CAST(t.k AS BIGINT) * (SELECT max(nn) FROM ranked)) // 10
         |      AS cut
         |  FROM range(1, 11) t(k)),
         |ntok_k AS (
         |  SELECT c.k, CAST(sum(r.ntok) AS BIGINT) AS n_tokens
         |  FROM ranked r JOIN cuts c ON r.rk <= c.cut GROUP BY c.k),
         |firsts AS (
         |  SELECT w, CAST(min(rk) AS BIGINT) AS frk FROM (
         |    SELECT unnest(d.tk) AS w, r.rk
         |    FROM docs d JOIN ranked r USING (doc_id))
         |  GROUP BY w),
         |vocab_k AS (
         |  SELECT c.k, CAST(count(*) AS BIGINT) AS vocab
         |  FROM firsts f JOIN cuts c ON f.frk <= c.cut GROUP BY c.k),
         |pts AS (
         |  SELECT k, n_tokens, vocab,
         |    CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
         |      AS x,
         |    CAST(round(ln(CAST(vocab AS DOUBLE)) * 1e6) AS BIGINT) AS y
         |  FROM ntok_k JOIN vocab_k USING (k)),
         |st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM pts),
         |f AS (
         |  SELECT n, sx, sy,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
         |  FROM st),
         |fit AS (
         |  SELECT
         |    CASE WHEN vx > 0 THEN round(cov / vx, 6) END AS heaps_beta,
         |    CASE WHEN vx > 0 THEN
         |      round(exp((CAST(sy AS DOUBLE) - cov / vx
         |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1e6), 6)
         |      END AS heaps_k,
         |    CASE WHEN vx > 0 AND vy > 0
         |      THEN round(cov * cov / (vx * vy), 6) END AS r2
         |  FROM f)
         |SELECT pts.k AS decile, pts.n_tokens, pts.vocab,
         |  fit.heaps_beta, fit.heaps_k, fit.r2
         |FROM pts CROSS JOIN fit ORDER BY decile""".stripMargin,

    "q22_srm" ->
      s"""WITH $abUsersSql,
         |c AS (
         |  SELECT CAST(sum(grp) AS BIGINT) AS n1,
         |    CAST(sum(1 - grp) AS BIGINT) AS n0
         |  FROM users),
         |f AS (
         |  SELECT n1, n0, n1 - n0 AS delta,
         |    round(CAST(n1 - n0 AS DOUBLE) * CAST(n1 - n0 AS DOUBLE)
         |      / CAST(n1 + n0 AS DOUBLE), 6) AS chi2
         |  FROM c)
         |SELECT n1, n0, delta, chi2,
         |  chi2 > $Chi2Crit1df AS srm_alarm
         |FROM f""".stripMargin)
}
