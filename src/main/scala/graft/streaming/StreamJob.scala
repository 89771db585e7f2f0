package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.inject.{AnomalySetting, Injector}
import graft.ml.FittedDetector

/** Streaming pipeline (SURVEY §2.9, T1–T3), replacing the reference's
  * broken row-loop + 1 Hz full-table rescan (T7 defects:
  * `Backend/engine.py:245`, `Backend/execute_calls.py:941-970`) with
  * Structured Streaming by construction:
  *
  *  - T1 replay: a file source over the staged dataset directory replays it
  *    micro-batch by micro-batch (`maxFilesPerTrigger`); event-time pacing
  *    (the reference's `sleep(gap/speedup)`) becomes trigger cadence —
  *    at scale the source is Kafka/files landing, same plan;
  *  - T2 injection: [[Injector.injectStreaming]] — stateless Column
  *    expressions with pre-pass stats, no shuffle in the stream;
  *  - T3 detection: `foreachBatch` scores ONLY the new micro-batch with the
  *    pre-trained detector and appends to the scored table — incremental,
  *    not a rescan; `availableNow` drains a finite replay and stops.
  *
  * Watermark support (T4, absent in the reference) comes free:
  * `withEventTimeWatermark` on the replayed frame.
  */
object StreamJob {

  /** T1: stage a normalized dataset as N parquet files and open a replaying
    * stream over them (filesPerTrigger files per micro-batch). */
  def stageAndReplay(spark: SparkSession, normalized: DataFrame,
                     stageDir: String, nChunks: Int = 20,
                     filesPerTrigger: Int = 1): DataFrame = {
    normalized.repartitionByRange(nChunks, col("timestamp"))
      .write.mode("overwrite").parquet(stageDir)
    // The file source orders batches by file modification time; chunks
    // written in the same instant tie and replay order becomes arbitrary,
    // breaking the event-time-ordered-arrival contract that stateful window
    // scoring relies on. Stamp strictly increasing mtimes in range order
    // (part-NNNNN is range-ordered under repartitionByRange).
    val parts = new java.io.File(stageDir).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    val base = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base + i * 2000L)
    }
    spark.readStream
      .schema(normalized.schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(stageDir)
  }

  /** T1 pacing — the reference's `speedup` parameter
    * (`Backend/Simulator/SimulateFromDataSet/simulator.py:203-217` sleeps
    * `gap/speedup` between rows): a dataset whose event time spans S seconds
    * replays over S/speedup wall-clock seconds. Row-level sleeps don't exist
    * in a distributed engine; the equivalent is micro-batch cadence —
    * `nChunks` range-ordered files at one file per trigger, interval =
    * S/(nChunks·speedup). Pass the result as `trigger` to [[detectSink]]
    * (with `availableNow = false`). */
  def replayTrigger(normalized: DataFrame, tsCol: String, nChunks: Int,
                    speedup: Double): Trigger = {
    require(speedup > 0, "speedup must be positive")
    val r = normalized
      .agg(min(col(tsCol)).cast("long"), max(col(tsCol)).cast("long")).head
    val spanSec = math.max(r.getLong(1) - r.getLong(0), 0L)
    val intervalMs = math.max((spanSec * 1000.0 / (nChunks * speedup)).toLong, 1L)
    Trigger.ProcessingTime(intervalMs)
  }

  /** Streaming exact dedup with BOUNDED state: re-deliveries of the same
    * key are dropped while the first sighting is within the watermark
    * horizon; the per-key state then expires (a plain `dropDuplicates`
    * would grow state forever — unusable on an unbounded stream). The
    * streaming leg of the d1 exact-dedup story: at-least-once sources →
    * effectively-once downstream. */
  def dedupStream(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream keyed range join — the streaming twin of the batch
    * interval join (J3): each left row matches right rows with the same
    * key whose event time falls in `[l.ts - lookbackSec, l.ts]`.
    *
    * Both sides carry watermarks and the join condition bounds BOTH event
    * times, so Spark derives state-eviction watermarks for each side —
    * state size is O(key-cardinality × lookback window), not O(stream).
    * Without the time-range condition the state would grow unboundedly
    * and Spark (correctly) refuses append mode.
    *
    * Left/right frames must have disjoint column names apart from `key`;
    * the joined frame carries both sides' columns. Inner join: a left row
    * with no in-window right match is dropped (use the batch J3 for outer
    * semantics on bounded data). */
  def rangeJoinStreams(left: DataFrame, right: DataFrame, key: String,
                       lTs: String, rTs: String, watermark: String,
                       lookbackSec: Long): DataFrame =
    left.withWatermark(lTs, watermark).alias("l")
      .join(right.withWatermark(rTs, watermark).alias("r"),
        expr(s"l.$key = r.$key AND r.$rTs >= l.$lTs - INTERVAL $lookbackSec SECONDS" +
          s" AND r.$rTs <= l.$lTs"))
      .drop(col(s"r.$key"))

  /** Streaming sketch maintenance: the count-min counter grid (a14's
    * batch sketch) as an incrementally-maintained aggregation. The
    * grouping key space is bounded BY CONSTRUCTION (d·w counters), so
    * `complete`-mode state stays constant no matter the stream's key
    * cardinality — frequency estimates over an unbounded stream with
    * fixed memory. Same function works on a static frame, which is how
    * the spec proves stream ≡ batch across micro-batch cuts. */
  def cmSketchStream(stream: DataFrame, keyCol: String,
                     d: Int = 4, w: Int = 256): DataFrame =
    stream.select(posexplode(
        graft.functions.CmHash.slotArray(col(keyCol), d, w))
        .as(Seq("j", "slot")))
      .groupBy(col("j"), col("slot")).agg(count(lit(1)).as("c"))

  /** Streaming curation-funnel counts: t29's per-(source, first-failing-
    * rule) drop mass maintained incrementally over a document stream —
    * the live observability layer a continuous ingest pipeline alerts
    * on. The stage index is the SHARED [[graft.text.TextOps
    * .funnelStage]] expression (map-only per row), so the streaming
    * counts are definitionally t29's batch counts; complete-mode state
    * is bounded BY CONSTRUCTION at sources × 5 rows regardless of
    * stream length (the cmSketchStream contract). Downstream funnel
    * arithmetic (scaffold join, survivor cumsum) reads this tiny frame
    * per trigger — it never touches the stream. Same function works on
    * a static frame, which is how the spec proves stream ≡ batch across
    * micro-batch cuts. */
  def funnelStream(stream: DataFrame): DataFrame =
    stream.select(col("source"),
        graft.text.TextOps.funnelStage(col("text")).as("stage"))
      .groupBy(col("source"), col("stage")).agg(count(lit(1)).as("c"))

  /** Streaming shard manifest: p19's per-shard (count, token mass, id
    * span, order-invariant checksum) maintained incrementally over a
    * document stream — continuous corpus-integrity accounting. Every
    * aggregate is incremental-friendly (counts/sums/min/max), the hash
    * is the SHARED [[graft.text.TextOps.contentHash60]], and
    * complete-mode state is bounded BY CONSTRUCTION at `shards` rows
    * regardless of stream length (the cmSketchStream contract). Same
    * function on a static frame is how the spec proves stream ≡ batch
    * across micro-batch cuts. */
  def manifestStream(stream: DataFrame, idCol: String, textCol: String,
                     shards: Int = graft.text.TextOps.ManifestShards,
                     checksumMod: Long =
                       graft.text.TextOps.ManifestChecksumMod): DataFrame = {
    val h = graft.text.TextOps.contentHash60(col(textCol))
    stream.select(col(idCol).as("__id"),
        size(graft.text.TextOps.tokens(col(textCol))).cast("long")
          .as("__nt"), h.as("__h"))
      .withColumn("shard", (col("__h") % shards).cast("int"))
      .withColumn("__h31", col("__h") % checksumMod)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("sum_tokens"),
        sum(col("__h31")).as("checksum"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"))
  }

  /** Streaming drift-monitor input: per-(source, quality-bin) counts
    * maintained incrementally over a document stream — the state the PSI
    * drift alarm (`a45_psi_drift`) reads. The bin expression is the
    * SHARED [[graft.queries.Curate.psiCounts]] (the funnelStage
    * pattern), so the streaming counts are definitionally a45's input
    * frame; complete-mode state is bounded BY CONSTRUCTION at sources ×
    * ≤21 fixed-width bins regardless of stream length, and the PSI
    * arithmetic runs on that tiny frame per trigger — it never touches
    * the stream. */
  def psiStream(stream: DataFrame): DataFrame =
    graft.queries.Curate.psiCounts(stream)

  /** Streaming seasonality-monitor input: per-(event_type, hour-of-day)
    * moment counts maintained incrementally over an event stream — the
    * state a46's seasonal-strength arithmetic reads. The moment
    * expression is the SHARED [[graft.queries.Stats.seasCounts]] (the
    * psiCounts pattern), so the streaming counts are definitionally
    * a46's input frame; complete-mode state is bounded BY CONSTRUCTION
    * at event types × 24 buckets regardless of stream length, and the
    * SS arithmetic runs on that tiny frame per trigger. Input must
    * carry (event_type, es, q). */
  def seasonalStream(stream: DataFrame): DataFrame =
    graft.queries.Stats.seasCounts(stream)

  /** Streaming survival-monitor input: the per-user (first event, last
    * event, first conversion) sufficient statistic maintained
    * incrementally over an event stream — the state a49's Kaplan–Meier
    * curve (and a50's log-rank test) read. The aggregate is the SHARED
    * [[graft.queries.Stats.survSubjects]] (the seasCounts pattern), so
    * the streaming state is definitionally a49's subject frame and
    * `Stats.kmCurve(state)` is bit-identical to the oracle-green batch
    * curve once the same rows arrived — REGARDLESS of arrival order,
    * because min/max/conditional-min are commutative over cuts.
    * Complete-mode state is ONE row per user (the minimal sufficient
    * statistic — the O(keys) class of the as-of sinks). Input must
    * carry (user_id, event_type, es). */
  def survivalStream(stream: DataFrame): DataFrame =
    graft.queries.Stats.survSubjects(stream)

  case class SprtIn(user_id: Long, event_id: Long, es: Long, x: Long)
  case class SprtOut(user_id: Long, decision: String,
                     n_at_decision: Long, llr_e6: Long)
  case class SprtState(rn: Long, k: Long, decided: Boolean)

  /** Streaming Wald SPRT — a55's sequential conversion test as an
    * always-valid live monitor: per-user (count, successes, decided)
    * state (CONSTANT per key — three scalars), cumulative LLR in pure
    * BIGINT arithmetic from the SAME e6-integer literals the batch
    * query embeds ([[graft.queries.Stats.SprtL1e6]]), one decision row
    * emitted at the first threshold crossing and never again — exactly
    * a55's `crossed` branch (the batch 'continue' rows are simply the
    * keys that have not emitted yet). Same per-key arrival-order
    * contract as [[ewmaAlarmStream]]; in-batch disorder is sorted.
    * Input must carry (user_id, event_id, es, x). */
  def sprtStream(stream: DataFrame): org.apache.spark.sql.Dataset[SprtOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // serializable locals (the ewmaAlarmStream rule)
    val l1 = graft.queries.Stats.SprtL1e6
    val l0 = graft.queries.Stats.SprtL0e6
    val a = graft.queries.Stats.SprtAe6
    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("es").cast("long").as("es"), col("x").cast("long").as("x"))
      .as[SprtIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[SprtIn],
         state: org.apache.spark.sql.streaming.GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0L, 0L, false))
          val out = collection.mutable.ArrayBuffer[SprtOut]()
          rows.toSeq.sortBy(r => (r.es, r.event_id)).foreach { r =>
            val rn = st.rn + 1
            val k = st.k + r.x
            val llr = k * l1 + (rn - k) * l0
            val cross = !st.decided && (llr >= a || llr <= -a)
            if (cross)
              out += SprtOut(key,
                if (llr >= a) "accept_h1" else "accept_h0", rn, llr)
            st = SprtState(rn, k, st.decided || cross)
          }
          state.update(st)
          out.iterator
      }
  }

  case class HoltIn(event_type: String, hr: Long, v: Long)
  case class HoltOut(event_type: String, n: Long, level: Double,
                     trend: Double, sse: Double)
  case class HoltState(n: Long, l: Double, b: Double, s: Double)

  /** Streaming Holt smoothing — a61's level+trend recursion as a live
    * per-key forecaster over CLOSED hourly buckets (build the bucket
    * frame with the SHARED `Stats2.holtHourly`; a real deployment feeds
    * it from a tumbling-window aggregation upstream). State is four
    * scalars per key; each update replicates a61's fold step TERM FOR
    * TERM in the same association (α/β are the shared dyadic constants),
    * so the running (level, trend, SSE) is bit-identical to the batch
    * array fold at every prefix. Emits the post-update state per bucket
    * STARTING AT THE SECOND bucket per key (n ≥ 2): a single closed
    * bucket carries no trend and no forecast error (a61 filters
    * size(xs) ≥ 2 for the same reason), so emitting it would hand
    * consumers an extra row whose rmse reconstruction is sqrt(0/0) —
    * the state still initializes on bucket 1, it just stays silent.
    * The live h-step forecast is level + h·trend off any emission.
    * Same per-key arrival-order contract as [[ewmaAlarmStream]] (order
    * by hr); in-batch disorder is sorted. */
  def holtStream(stream: DataFrame): org.apache.spark.sql.Dataset[HoltOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // serializable locals (the ewmaAlarmStream rule)
    val alpha = graft.queries.Stats2.HoltAlpha
    val beta = graft.queries.Stats2.HoltBeta
    stream
      .select(col("event_type").cast("string").as("event_type"),
        col("hr").cast("long").as("hr"), col("v").cast("long").as("v"))
      .as[HoltIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[HoltIn],
         state: org.apache.spark.sql.streaming.GroupState[HoltState]) =>
          var st = state.getOption.getOrElse(HoltState(0L, 0.0, 0.0, 0.0))
          val out = collection.mutable.ArrayBuffer[HoltOut]()
          rows.toSeq.sortBy(_.hr).foreach { r =>
            val x = r.v.toDouble
            st =
              if (st.n == 0L) HoltState(1L, x, 0.0, 0.0)
              else {
                // a61's fold step, same association: l' = α·x + (1−α)(l+b)
                val nl = alpha * x + (1.0 - alpha) * (st.l + st.b)
                val nb = beta * (alpha * x + (1.0 - alpha) *
                  (st.l + st.b) - st.l) + (1.0 - beta) * st.b
                val ns = st.s +
                  (x - (st.l + st.b)) * (x - (st.l + st.b))
                HoltState(st.n + 1, nl, nb, ns)
              }
            // n = 1 is state-init only — no trend yet, rmse undefined
            if (st.n >= 2L) out += HoltOut(key, st.n, st.l, st.b, st.s)
          }
          state.update(st)
          out.iterator
      }
  }

  case class PhIn(user_id: Long, event_id: Long, es: Long, q: Long)
  case class PhOut(user_id: Long, decision: String,
                   n_at_decision: Long, ph_e9: Long)
  case class PhState(rn: Long, s: Long, m: Long, mMin: Long,
                     decided: Boolean)

  /** Streaming Page–Hinkley — a65's online mean-increase detector as a
    * live monitor (the one monitor in the family that IS defined
    * online: the batch query merely replays it). State is five scalars
    * per user (count, Σq, cumulative deviation m, running min of m,
    * decided); every update is pure BIGINT in e9 value units with the
    * running mean entering as the truncating division (S·10⁶)/rn —
    * Java `/`, Spark `div` and DuckDB `//` all truncate toward zero,
    * so the statistic is bit-identical to a65's window expression (its
    * SCALE_BOUNDS row carries the overflow bound). One 'drift' row per
    * user at the first m − min(m) > λ crossing, never re-emitted —
    * exactly a65's `crossed` branch. Same per-key arrival-order
    * contract as [[ewmaAlarmStream]]; in-batch disorder is sorted.
    * Input must carry (user_id, event_id, es, q) — build it with the
    * SHARED [[graft.queries.Stats2.phEvents]]. */
  def pageHinkleyStream(stream: DataFrame): org.apache.spark.sql.Dataset[PhOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // serializable locals (the ewmaAlarmStream rule)
    val delta = graft.queries.Stats2.PhDeltaE9
    val lambda = graft.queries.Stats2.PhLambdaE9
    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("es").cast("long").as("es"), col("q").cast("long").as("q"))
      .as[PhIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[PhIn],
         state: org.apache.spark.sql.streaming.GroupState[PhState]) =>
          var st = state.getOption
            .getOrElse(PhState(0L, 0L, 0L, Long.MaxValue, false))
          val out = collection.mutable.ArrayBuffer[PhOut]()
          rows.toSeq.sortBy(r => (r.es, r.event_id)).foreach { r =>
            val rn = st.rn + 1
            val s = st.s + r.q
            val m = st.m + (r.q * 1000000L - (s * 1000000L) / rn - delta)
            val mMin = math.min(st.mMin, m)
            val ph = m - mMin
            val cross = !st.decided && ph > lambda
            if (cross) out += PhOut(key, "drift", rn, ph)
            st = PhState(rn, s, m, mMin, st.decided || cross)
          }
          state.update(st)
          out.iterator
      }
  }

  case class HwIn(event_type: String, hr: Long, v: Long)
  case class HwOut(event_type: String, n: Long, level: Double,
                   trend: Double, sse: Double, s_amp: Double,
                   s_next3: Double)
  case class HwState(n: Long, buf: Seq[Double], l: Double, b: Double,
                     sse: Double, sea: Seq[Double])

  /** Streaming Holt–Winters — a67's triple smoothing as a live per-key
    * forecaster over CLOSED hourly buckets (feed with the SHARED
    * `Stats2.holtHourly`, ordered by hr — the holtStream contract).
    * Phase 1 buffers the first 2m buckets (state ≤ 2m doubles,
    * bounded); on the 2m-th arrival it computes a67's two-season init
    * TERM FOR TERM (fold-left sums with the 0.0 seed, the same
    * association as the batch `aggregate`), replays buckets m+1..2m
    * through the step, and switches to live mode: per bucket, the
    * level/trend/seasonal/SSE update replicates a67's fold step in the
    * same association, so the running state is bit-identical to the
    * batch array fold at every prefix. Emits from bucket 2m+1 (the
    * batch filter's n ≥ 2m+1 floor — the holtStream n≥2 rule), carrying
    * everything a67's report needs: the seasonal amplitude and the
    * t+3 seasonal slot ride along so consumers rebuild the full report
    * (level + h·trend + s) without holding the 24-slot state. */
  def holtWintersStream(stream: DataFrame): org.apache.spark.sql.Dataset[HwOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // serializable locals (the ewmaAlarmStream rule)
    val al = graft.queries.Stats2.HoltAlpha
    val be = graft.queries.Stats2.HoltBeta
    val ga = graft.queries.Stats2.HwGamma
    val m = graft.queries.Stats2.HwM
    stream
      .select(col("event_type").cast("string").as("event_type"),
        col("hr").cast("long").as("hr"), col("v").cast("long").as("v"))
      .as[HwIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[HwIn],
         state: org.apache.spark.sql.streaming.GroupState[HwState]) =>
          var st = state.getOption
            .getOrElse(HwState(0L, Vector.empty, 0.0, 0.0, 0.0, Vector.empty))
          val out = collection.mutable.ArrayBuffer[HwOut]()
          // a67's fold step, same association; j0 = 0-based seasonal slot
          def step(cur: HwState, x: Double): HwState = {
            val j0 = ((cur.n.toInt) % m) // slot of bucket t = n+1: (t−1) % m
            val sj = cur.sea(j0)
            val nl = al * (x - sj) + (1.0 - al) * (cur.l + cur.b)
            val nb = be * (nl - cur.l) + (1.0 - be) * cur.b
            val ns = ga * ((x - cur.l) - cur.b) + (1.0 - ga) * sj
            val err = x - ((cur.l + cur.b) + sj)
            HwState(cur.n + 1, cur.buf, nl, nb,
              cur.sse + err * err, cur.sea.updated(j0, ns))
          }
          rows.toSeq.sortBy(_.hr).foreach { r =>
            val x = r.v.toDouble
            if (st.sea.isEmpty) {
              // phase 1: buffer until the two init seasons are closed
              val buf = st.buf :+ x
              if (buf.length < 2 * m) st = HwState(buf.length.toLong, buf,
                0.0, 0.0, 0.0, Vector.empty)
              else {
                // a67's init: fold-left sums seeded 0.0 (the batch shape)
                val l0 = buf.take(m).foldLeft(0.0)(_ + _) / m.toDouble
                val m2 = buf.slice(m, 2 * m).foldLeft(0.0)(_ + _) / m.toDouble
                val b0 = (m2 - l0) / m.toDouble
                var cur = HwState(m.toLong, Vector.empty, l0, b0, 0.0,
                  buf.take(m).map(_ - l0).toVector)
                // replay the second init season through the fold
                buf.slice(m, 2 * m).foreach(xr => cur = step(cur, xr))
                st = cur // n = 2m; emissions start with the NEXT bucket
              }
            } else {
              st = step(st, x)
              out += HwOut(key, st.n, st.l, st.b, st.sse,
                st.sea.max - st.sea.min,
                st.sea(((st.n.toInt + 2) % m)))
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class CohortIn(user_id: Long, dd: Long)
  case class CohortOut(user_id: Long, cohort_day: Long, age: Long)
  case class CohortState(cd: Long, seen: Seq[Long])

  /** Streaming cohort-retention feed — q16's matrix as a live product
    * metric (the canonical always-on dashboard counter). Keyed by user;
    * state is the user's cohort day (first activity day — the arrival
    * contract makes first = min) plus the set of ages already emitted,
    * BOUNDED by distinct ages observed per user (≤ observation days).
    * Emits exactly one (user, cohort_day, age) row per new age — the
    * dedup q16's `distinct()` does in batch — so the consumer rebuilds
    * the matrix with one counting agg: n_active(cd, age) = row count,
    * cohort_users(cd) = the age-0 count (every user's first emission is
    * age 0 by construction), retention = the same exact ppm ratio.
    * Feed day-ordered per user (order by dd globally suffices — the
    * ewmaAlarmStream contract); in-batch disorder is sorted. Build the
    * input with the SHARED [[graft.queries.Stats2.cohortEvents]]. */
  def cohortStream(stream: DataFrame): org.apache.spark.sql.Dataset[CohortOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("dd").cast("long").as("dd"))
      .as[CohortIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[CohortIn],
         state: org.apache.spark.sql.streaming.GroupState[CohortState]) =>
          var st = state.getOption.getOrElse(CohortState(-1L, Seq.empty))
          val out = collection.mutable.ArrayBuffer[CohortOut]()
          rows.toSeq.sortBy(_.dd).foreach { r =>
            if (st.cd < 0L) st = CohortState(r.dd, Seq.empty)
            val age = r.dd - st.cd
            if (!st.seen.contains(age)) {
              out += CohortOut(key, st.cd, age)
              st = CohortState(st.cd, st.seen :+ age)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class WeIn(event_type: String, hr: Long, v: Long,
                  mu: Double, sig: Double)
  case class WeOut(event_type: String, hr: Long, rule: String)
  case class WeState(t: Long, ring: Seq[Double])

  /** Streaming Western Electric rules — `w35_we_rules`' pattern alarms
    * as a live SPC monitor over CLOSED hourly buckets (feed with the
    * SHARED `Stats2.holtHourly`, hr-ordered per key — the holtStream
    * contract). Calibration (per-type μ/σ — build with the SHARED
    * `Stats3.weCalib` over the reference window) joins as a DATAFRAME
    * (stream-static equi-join, the cusumStream pattern), so the center
    * lines are the batch chart's doubles bit-for-bit. State per type is
    * the bucket counter + the trailing ≤8 z-values (the widest rule
    * frame) — bounded regardless of stream length. z and every rule
    * predicate replicate the batch expressions' IEEE shape (cast,
    * subtract, divide; thresholds on unrounded doubles), so each
    * emitted (type, hr, rule) row is definitionally a batch violation
    * row, and rules only fire once their frame is FULL (the batch
    * t ≥ k guard). */
  def weRulesStream(stream: DataFrame,
                    calib: DataFrame): org.apache.spark.sql.Dataset[WeOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    stream.join(calib, Seq("event_type"))
      .select(col("event_type"), col("hr").cast("long").as("hr"),
        col("v").cast("long").as("v"), col("mu"), col("sig"))
      .as[WeIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[WeIn],
         state: org.apache.spark.sql.streaming.GroupState[WeState]) =>
          var st = state.getOption.getOrElse(WeState(0L, Seq.empty))
          val out = collection.mutable.ArrayBuffer[WeOut]()
          rows.toSeq.sortBy(_.hr).foreach { r =>
            val zz = (r.v.toDouble - r.mu) / r.sig
            val t = st.t + 1
            val ring = (st.ring :+ zz).takeRight(8)
            def cnt(k: Int, p: Double => Boolean) =
              ring.takeRight(k).count(p)
            if (zz > 3.0 || zz < -3.0) out += WeOut(key, r.hr, "r1")
            if (t >= 3 && (cnt(3, _ > 2.0) >= 2 || cnt(3, _ < -2.0) >= 2))
              out += WeOut(key, r.hr, "r2")
            if (t >= 5 && (cnt(5, _ > 1.0) >= 4 || cnt(5, _ < -1.0) >= 4))
              out += WeOut(key, r.hr, "r3")
            if (t >= 8 && (cnt(8, _ > 0.0) == 8 || cnt(8, _ < 0.0) == 8))
              out += WeOut(key, r.hr, "r4")
            st = WeState(t, ring)
          }
          state.update(st)
          out.iterator
      }
  }

  case class SrmIn(user_id: Long)
  case class SrmOut(user_id: Long, grp: Int)

  /** Streaming sample-ratio-mismatch feed — `q22_srm`'s randomization
    * audit as a live guardrail (the experimentation platform's
    * always-on check: a broken assignment must page BEFORE anyone
    * reads a metric). Emits each user's (user_id, arm) exactly once,
    * on FIRST sight (state = one presence bit per user — the
    * cohortStream state class, bounded by distinct users, NOT stream
    * length); the arm is the host twin of the SAME keyed LCG + seed
    * q21/q22 use (`Det.fracHost` ≡ `Det.frac` by DetSpec), so the
    * emitted frame is definitionally `abUsers`' (user_id, grp)
    * projection at every prefix. Consumers keep the 2-row arm counts
    * and the χ² = (n1−n0)²/n readout per trigger on that tiny frame —
    * counting users needs the dedup, and streaming COUNT DISTINCT
    * isn't incremental; first-touch emission is. */
  def srmStream(stream: DataFrame): org.apache.spark.sql.Dataset[SrmOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val seed = graft.queries.Stats3.AbSeed // serializable local
    stream
      .select(col("user_id").cast("long").as("user_id"))
      .as[SrmIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[SrmIn],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.exists || rows.isEmpty) Iterator.empty
          else {
            state.update(true)
            Iterator.single(SrmOut(key,
              if (graft.functions.Det.fracHost(key, seed) < 0.5) 1 else 0))
          }
      }
  }

  case class TtcIn(user_id: Long, event_type: String, es: Long)
  case class TtcOut(user_id: Long, s_es: Long, delta_s: Long)
  case class TtcState(sEs: Long, done: Boolean)

  /** Streaming time-to-convert — `q20_time_to_convert`'s activation
    * pair (FIRST signup → FIRST qualifying purchase) as a live feed:
    * the latency metric a product team pages on, emitted exactly once
    * per user ON the purchase that closes the pair. State is two facts
    * per user (first-signup epoch + a done bit — the srmStream
    * first-touch class, bounded by distinct users, NOT stream length).
    * Semantics ≡ batch under the family's per-key arrival-order
    * contract (es non-decreasing per user across batches; in-batch
    * disorder is sorted, signup-before-purchase on an es tie so a
    * same-second conversion counts, matching batch's es ≥ s_es).
    * A purchase before any signup is dropped exactly as the batch
    * filter drops it. Consumers keep q20's decile report per trigger
    * from the emitted pairs + the signup count (the spec rebuilds it
    * via the SHARED `Stats2.ttcReport`). */
  def timeToConvertStream(stream: DataFrame)
      : org.apache.spark.sql.Dataset[TtcOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("es").cast("long").as("es"))
      .as[TtcIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[TtcIn],
         state: org.apache.spark.sql.streaming.GroupState[TtcState]) =>
          var st = state.getOption.getOrElse(TtcState(-1L, false))
          val out = collection.mutable.ArrayBuffer[TtcOut]()
          rows.toSeq
            .sortBy(r => (r.es, if (r.event_type == "signup") 0 else 1))
            .foreach { r =>
              if (r.event_type == "signup" && st.sEs < 0L)
                st = TtcState(r.es, st.done)
              else if (r.event_type == "purchase" && !st.done &&
                st.sEs >= 0L && r.es >= st.sEs) {
                out += TtcOut(key, st.sEs, r.es - st.sEs)
                st = TtcState(st.sEs, true)
              }
            }
          state.update(st)
          out.iterator
      }
  }

  case class KmObsIn(user_id: Long, event_type: String, es: Long,
                     cents: Long)
  case class KmObsStat(user_id: Long, s_es: Long, p_es: Long)
  case class KmObsState(sEs: Long, pEs: Long, pendEs: Long)

  /** Streaming censored-observation feed — the sufficient statistic of
    * `q26_km_survival`'s observation frame (the r10 verdict's stretch
    * ask #6): per user the FIRST signup epoch and the FIRST qualifying
    * (≥ `Survival.KmThrCents`) purchase at-or-after it, emitted ON
    * CHANGE so the LAST emission per user is the final statistic
    * (≤ 2 emissions per user, never re-emitted). The administrative
    * horizon is applied by the CONSUMER — it is a corpus-level
    * constant broadcast at read time, and the obs (t, d) derive from
    * (s_es, p_es, tc) in one expression: t = p_es−s_es if a qualifying
    * purchase landed inside the window else tc−s_es, d likewise. The
    * spec rebuilds the FULL oracle-green q26 curve — Greenwood se and
    * KP bounds included — from these emissions via the SHARED
    * `Survival.kmReport` (the ttcReport pattern), AND asserts the
    * rebuilt (user_id, grp, t, d) frame ≡ batch `Survival.kmObs`
    * row-for-row: every gate of the survival pack (q26/q27/q29/q30/
    * a79/a80/a81) consumes only that frame, so ONE feed provably
    * powers all seven. State is three epochs per user while OPEN and
    * is REMOVED on close (both latches set — the r11 verdict ask:
    * live state is O(open users), not O(all users)): s_es latches on
    * the first signup, p_es on the first qualifying purchase with
    * es ≥ s_es, and pendEs latches the latest pre-signup qualifying
    * purchase so a same-second conversion still counts when the
    * purchase lands in an EARLIER batch than its tied signup (the
    * per-key contract — es non-decreasing per user across batches;
    * in-batch disorder sorted signup-first on ties — permits that
    * delivery order; the r11 ADVICE gap). Under pendEs ≤ s_es, which
    * the contract guarantees, only a tie can qualify, so the latch
    * fires iff pendEs == s_es.
    *
    * CONSUMER CONTRACT (changed with removal — measured, not
    * assumed): on this corpus every user re-signs up (≤24 signup
    * events/user), so after removal a later signup RE-OPENS fresh
    * state and re-emits — removal is NOT emission-neutral here. The
    * final statistic is therefore selected order-free as
    * `min(struct(s_es, -p_es))` per user: the true first-signup
    * epoch is the minimum s_es ever emitted (re-open emissions carry
    * strictly larger s_es and are discarded), and within it the
    * close (max p_es) wins over the open (-1). ≤2 emissions per
    * (user, s_es) epoch. The spec proves the rebuilt observation
    * frame ≡ batch `kmObs` row-for-row across cut layouts including
    * a purchase-before-tied-signup cut and post-close re-opens. */
  def kmObsStream(stream: DataFrame)
      : org.apache.spark.sql.Dataset[KmObsStat] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val thr = graft.queries.Survival.KmThrCents // serializable local
    stream
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("es").cast("long").as("es"),
        col("cents").cast("long").as("cents"))
      .as[KmObsIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[KmObsIn],
         state: org.apache.spark.sql.streaming.GroupState[KmObsState]) =>
          var st = state.getOption.getOrElse(KmObsState(-1L, -1L, -1L))
          val out = collection.mutable.ArrayBuffer[KmObsStat]()
          rows.toSeq
            .sortBy(r => (r.es, if (r.event_type == "signup") 0 else 1))
            .foreach { r =>
              if (r.event_type == "signup" && st.sEs < 0L) {
                // pendEs == r.es: a qualifying purchase tied with this
                // first signup was delivered in an earlier batch — it
                // closes the epoch at latch time (the r11 ADVICE fix)
                val p = if (st.pendEs == r.es) st.pendEs else -1L
                st = KmObsState(r.es, p, st.pendEs)
                out += KmObsStat(key, st.sEs, st.pEs)
              } else if (r.event_type == "purchase" && r.cents >= thr &&
                st.sEs >= 0L && st.pEs < 0L && r.es >= st.sEs) {
                st = KmObsState(st.sEs, r.es, st.pendEs)
                out += KmObsStat(key, st.sEs, st.pEs)
              } else if (r.event_type == "purchase" && r.cents >= thr &&
                st.sEs < 0L) {
                // pre-signup pending latch; latest wins (es is per-key
                // non-decreasing, so the latest is the max — the only
                // candidate that can tie the signup still to come)
                st = KmObsState(st.sEs, st.pEs, r.es)
              }
            }
          if (st.sEs >= 0L && st.pEs >= 0L) state.remove()
          else state.update(st)
          out.iterator
      }
  }

  case class CusumIn(user_id: Long, event_id: Long, es: Long, q: Long,
                     sq: Long, n_events: Long)
  case class CusumPeak(user_id: Long, n_events: Long, dabs: Long,
                       cp_es: Long)
  case class CusumState(rn: Long, cum: Long, bestDabs: Long, bestEs: Long)

  /** Streaming CUSUM peak tracker — `w28_cusum`'s per-user change-point
    * statistic as a live monitor, closing the mean-shift family (EWMA,
    * PSI, SPRT, seasonal, survival all have twins). Calibration (per-user
    * n and Σq — build it with the SHARED `Stats.cusumCalib` over the
    * reference corpus) joins as a DATAFRAME: stream-static equi-join,
    * never a driver-side map. State is FOUR scalars per user (prefix
    * count, prefix Σq, running max |D|, its timestamp): the statistic
    * D_k = n·S_k − k·Σq updates in O(1) per event in pure BIGINT
    * arithmetic — bit-identical to w28's window expression (overflow
    * bound: the w28 SCALE_BOUNDS row, n ≲ 3e6 events/user). A peak row
    * is emitted whenever the running maximum STRICTLY improves, so the
    * last emission per user carries the batch argmax with w28's
    * earliest-timestamp tie rule (`max(struct(dabs, −es))` ≡ strict->
    * under in-order arrival). Same per-key arrival-order contract as
    * [[ewmaAlarmStream]]; in-batch disorder is sorted. Input must carry
    * (user_id, event_id, es, q). */
  def cusumStream(stream: DataFrame,
                  calib: DataFrame): org.apache.spark.sql.Dataset[CusumPeak] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    stream.join(calib, Seq("user_id"))
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("es").cast("long").as("es"), col("q").cast("long").as("q"),
        col("sq").cast("long").as("sq"),
        col("n_events").cast("long").as("n_events"))
      .as[CusumIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[CusumIn],
         state: org.apache.spark.sql.streaming.GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L, -1L, 0L))
          val out = collection.mutable.ArrayBuffer[CusumPeak]()
          rows.toSeq.sortBy(r => (r.es, r.event_id)).foreach { r =>
            val rn = st.rn + 1
            val cum = st.cum + r.q
            val dabs = math.abs(r.n_events * cum - rn * r.sq)
            st =
              if (dabs > st.bestDabs) { // strict: earliest tie wins
                out += CusumPeak(key, r.n_events, dabs, r.es)
                CusumState(rn, cum, dabs, r.es)
              } else CusumState(rn, cum, st.bestDabs, st.bestEs)
          }
          state.update(st)
          out.iterator
      }
  }

  case class EwmaIn(user_id: Long, event_id: Long, es: Long, vc: Long,
                    mu: Double, sig: Double)
  case class EwmaAlarm(user_id: Long, es: Long, vc: Long,
                       ewma_milli: Double, z_sigma: Double)
  case class EwmaState(rn: Long, recent: Seq[Long])

  /** Streaming EWMA control chart — `w31_ewma_chart`'s truncated chart
    * over a live event stream. Calibration (per-user μ/σ — build it with
    * the SHARED `Stats.ewmaCalib` over the reference corpus) joins as a
    * DATAFRAME: a stream-static equi-join, because at corpus scale the
    * calibration table is data-sized and must never become a driver-side
    * map. `flatMapGroupsWithState` carries (row count, trailing D−1
    * values) per user — constant state per key. The per-row arithmetic
    * replicates w31's column expression TERM FOR TERM in the same
    * association (incl. the literal-0.0 padding of missing lags and
    * Spark round's scala-BigDecimal HALF_UP), so emitted alarms are
    * bit-identical to the oracle-green batch rows when per-key arrival
    * respects event order across triggers (in-batch disorder is sorted
    * here — the StatefulWindow contract). */
  def ewmaAlarmStream(stream: DataFrame,
                      calib: DataFrame): org.apache.spark.sql.Dataset[EwmaAlarm] = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // copy constants into serializable locals — aliasing the Stats
    // MODULE into the closure would drag the whole object through
    // task serialization
    val ewD = graft.queries.Stats.EwmaD
    val ewW: Array[Double] = graft.queries.Stats.ewmaW.toArray
    val ewT: Array[Double] = graft.queries.Stats.ewmaTail.toArray
    val ewL = graft.queries.Stats.EwmaL
    val cfac = graft.queries.Stats.ewmaCfac
    val r4 = (x: Double) =>
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    stream.join(calib, Seq("user_id"))
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("es").cast("long").as("es"), col("vc").cast("long").as("vc"),
        col("mu").cast("double").as("mu"),
        col("sig").cast("double").as("sig"))
      .as[EwmaIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[EwmaIn],
         state: org.apache.spark.sql.streaming.GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0L, Seq.empty))
          val out = collection.mutable.ArrayBuffer[EwmaAlarm]()
          rows.toSeq.sortBy(r => (r.es, r.event_id)).foreach { r =>
            val rn = st.rn + 1
            // w31's terms.reduce(_ + _): t0 + t1 + … left-assoc, missing
            // lags contribute the LITERAL 0.0 exactly as coalesce does
            var z = 0.0
            var d = 0
            while (d < ewD) {
              z += (if (d == 0) ewW(0) * r.vc.toDouble
                else if (d - 1 < st.recent.length)
                  ewW(d) * st.recent(d - 1).toDouble
                else 0.0)
              d += 1
            }
            val na = math.min(rn - 1, (ewD - 1).toLong).toInt
            val zf = z + ewT(na) * r.mu
            if (math.abs(zf - r.mu) > ewL * r.sig * cfac)
              out += EwmaAlarm(key, r.es, r.vc, r4(zf),
                r4((zf - r.mu) / (r.sig * cfac)))
            st = EwmaState(rn, (r.vc +: st.recent).take(ewD - 1))
          }
          state.update(st)
          out.iterator
      }
  }

  /** Seed the signature index for [[incrementalDedupSink]]: the corpus'
    * LSH band memberships (capped with the SAME hot-bucket guard the
    * batch query applies — a degenerate band is skipped at index-build
    * time, with the standard observed-metric drop accounting) and its
    * verification gram sets, both via the SHARED
    * [[graft.queries.TextDedup]] primitives. The index is O(corpus) by
    * nature — it IS the dedup index, not stream-length state. */
  def dedupIndexSeed(sp: SparkSession, corpus: DataFrame,
                     outTable: String): Unit = {
    graft.ops.Buckets.capMembers(
        graft.queries.TextDedup.bandsOfDocs(corpus),
        Seq(col("band"), col("bv")), label = "dedup_seed")
      .select(col("doc_id").as("old_id"), col("band"), col("bv"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${outTable}__index_bands")
    graft.queries.TextDedup.gramsOfDocs(corpus)
      .select(col("doc_id").as("old_id"), col("g").as("go"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${outTable}__index_grams")
  }

  /** Streaming incremental near-dup dedup — the continuous twin of the
    * oracle-green `d16_incremental_dedup` batch operator: each arriving
    * document probes the seeded signature index (band-bucket candidates,
    * batch side broadcast), is exact-verified by n-gram Jaccard at τ =
    * 1/2, and appends its per-doc report row (candidate count, dup count,
    * best match) to `outTable`. The probe-and-report body is the SHARED
    * [[graft.queries.TextDedup.dedupReport]], so stream ≡ batch is
    * definitional; StreamJobSpec proves it across 3 cut layouts.
    *
    * State = the signature index itself (seeded by [[dedupIndexSeed]]) —
    * O(indexed corpus), never O(stream history processed twice). With
    * `growIndex = true` each trigger also appends its batch's bands +
    * grams to the index, so later arrivals near-dup against earlier
    * stream docs too (the production ingest mode); docs sharing a
    * trigger do NOT probe each other, so that mode's output depends on
    * arrival granularity — exact d16 twin-ship is the default
    * fixed-index mode. Cap contract: the seed applies the batch
    * hot-bucket cap on the index side; d16's joint (old ∪ new) cap must
    * be non-binding for exact equivalence (`d18_cap_report` is the
    * audit; a binding cap means exact-dup mass to remove with d1 first). */
  def incrementalDedupSink(stream: DataFrame, outTable: String,
                           growIndex: Boolean = false): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val docs = batch.select(col("doc_id"), col("text")).localCheckpoint()
        val newBands = graft.queries.TextDedup.bandsOfDocs(docs)
          .select(col("doc_id").as("new_id"), col("band"), col("bv"))
          .localCheckpoint() // feeds the probe + the optional index append
        val newGrams = graft.queries.TextDedup.gramsOfDocs(docs)
          .select(col("doc_id").as("new_id"), col("g"))
          .localCheckpoint()
        graft.queries.TextDedup.dedupReport(
            docs.select(col("doc_id").as("new_id")),
            newBands,
            sp.table(s"${outTable}__index_bands"),
            newGrams.select(col("new_id"), col("g").as("gn")),
            sp.table(s"${outTable}__index_grams"))
          .write.mode("append").format("parquet").saveAsTable(outTable)
        if (growIndex) {
          newBands.select(col("new_id").as("old_id"), col("band"), col("bv"))
            .write.mode("append").format("parquet")
            .saveAsTable(s"${outTable}__index_bands")
          newGrams.select(col("new_id").as("old_id"), col("g").as("go"))
            .write.mode("append").format("parquet")
            .saveAsTable(s"${outTable}__index_grams")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming CDC upsert view — the u4 latest-per-key compaction
    * maintained incrementally: each micro-batch re-ranks (state ∪ batch)
    * per key and keeps the top-1, so `outTable` always equals the batch
    * compaction over every row seen so far. State is one row per key (the
    * upsert contract) and each trigger costs O(state + batch) with a
    * map-side WindowGroupLimit, never a rescan of the stream. `orderCols`
    * must be a TOTAL order per key (unique tiebreak) — that is what makes
    * the result micro-batch-cut-layout invariant (StreamJobSpec proves
    * stream ≡ u4 across layouts). The localCheckpoint materializes the
    * merge before the overwrite reads-then-replaces the same table (the
    * [[graft.ops.Merge]] staging contract). */
  def upsertLatestSink(stream: DataFrame, keyCols: Seq[String],
                      orderCols: Seq[String], outTable: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val cur =
          if (sp.catalog.tableExists(outTable)) sp.table(outTable)
          else batch.limit(0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(orderCols.map(col(_).desc): _*)
        cur.unionByName(batch)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .localCheckpoint()
          .write.mode("overwrite").format("parquet").saveAsTable(outTable)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** T5-streaming: bounded-state incremental sessionization — the streaming
    * twin of the oracle-green `w11_sessionize`. State is ONE open-session
    * row per ACTIVE user (never event-scale): each trigger re-runs the
    * gaps-and-islands split over (open-state intervals ∪ batch events) —
    * the batch algorithm applied to aggregates — closes every chain
    * element but the last, and carries the last forward with the user's
    * emitted-session count. Requires per-user event-time-ordered arrival
    * across triggers (the [[stageAndReplay]] range-chunk contract; within
    * a trigger order is free). [[sessionizeFlush]] closes residual opens
    * at end-of-stream. */
  def sessionizeSink(stream: DataFrame, userCol: String, tsCol: String,
                     gapS: Long, outTable: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val openT = s"${outTable}__open"
        val open =
          if (sp.catalog.tableExists(openT)) sp.table(openT)
          else batch.limit(0).select(col(userCol).as("user_id"),
            lit(0L).as("s0"), lit(0L).as("e1"), lit(0L).as("n"),
            lit(0L).as("emitted"))
        val ev = batch.select(col(userCol).as("user_id"),
            graft.functions.Det.epochS(col(tsCol)).as("s0"))
          .withColumn("e1", col("s0")).withColumn("n", lit(1L))
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("s0"), col("e1"))
        val sess = open.select(col("user_id"), col("s0"), col("e1"), col("n"))
          .unionByName(ev)
          .withColumn("gap", col("s0") - lag(col("e1"), 1).over(wOrd))
          .withColumn("ns",
            when(col("gap").isNull || col("gap") > gapS, 1L).otherwise(0L))
          .withColumn("slot", sum(col("ns")).over(wOrd.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("slot"))
          .agg(sum(col("n")).as("n"), min(col("s0")).as("s0"),
            max(col("e1")).as("e1"))
        // checkpoint BEFORE touching the state table: both writes below
        // must read materialized data, not the table being overwritten
        val sess2 = sess
          .join(sess.groupBy(col("user_id")).agg(max(col("slot")).as("mslot")),
            Seq("user_id"))
          .join(open.select(col("user_id"), col("emitted")),
            Seq("user_id"), "left")
          .na.fill(0L, Seq("emitted"))
          .localCheckpoint()
        sess2.filter(col("slot") < col("mslot"))
          .select(col("user_id"), (col("emitted") + col("slot")).as("sess_id"),
            col("n").as("n_events"), col("s0").as("sess_start"),
            col("e1").as("sess_end"))
          .write.mode("append").format("parquet").saveAsTable(outTable)
        sess2.filter(col("slot") === col("mslot"))
          .select(col("user_id"), col("s0"), col("e1"), col("n"),
            (col("emitted") + col("mslot") - 1).as("emitted"))
          .write.mode("overwrite").format("parquet").saveAsTable(openT)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming backward as-of join with O(keys) state — the streaming twin
    * of the oracle-green `z2_asof_join` batch operator
    * ([[graft.ops.AsOf.joinBackward]]): every micro-batch left row matches
    * the most recent right row at-or-before its event time, where the
    * right side is derived from the same stream by `rightFrom` (e.g. the
    * error-event subset). State is ONE carried right row per key
    * (`outTable__asof_state`) — never event-scale: under event-time-
    * ordered arrival, only the latest right row per key can still match a
    * future left row. Each trigger runs the EXACT batch operator over
    * (state ∪ batch-right), so within-trigger order needs no assumption,
    * and [[graft.ops.AsOf]]'s null-timestamp rules carry over unchanged.
    *
    * Contract: `rightFrom(batch)` returns `keys ++ tsCol ++ payload` rows
    * unique per (keys, tsCol) within the batch, and `tsCol` ties never
    * cross micro-batch cuts — stage the replay chunks ON THE JOIN
    * TIMESTAMP (e.g. `timestamp_seconds` of a truncated epoch, the
    * [[stageAndReplay]] range-chunk recipe) so equal-ts rows always
    * arrive together. StreamJobSpec proves stream ≡ z2 across 3 cut
    * layouts. No end-of-stream flush is needed: every left row is emitted
    * in its own trigger. */
  def asofBackwardSink(stream: DataFrame, keys: Seq[String], tsCol: String,
                       payload: Seq[String],
                       rightFrom: DataFrame => DataFrame,
                       outTable: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val stateT = s"${outTable}__asof_state"
        val sel = ((keys :+ tsCol) ++ payload).map(col)
        val rb = rightFrom(batch).select(sel: _*)
        // checkpoint: feeds the join AND the state overwrite, and the
        // overwrite must not read the table it is replacing
        val rightAll = (if (sp.catalog.tableExists(stateT))
            sp.table(stateT).unionByName(rb)
          else rb).localCheckpoint()
        graft.ops.AsOf.joinBackward(batch, rightAll, keys, tsCol, payload)
          .write.mode("append").format("parquet").saveAsTable(outTable)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(tsCol).desc)
        rightAll.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .write.mode("overwrite").format("parquet").saveAsTable(stateT)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming FORWARD as-of join — the conversion-attribution twin of
    * the oracle-green `z4_asof_forward` batch operator
    * ([[graft.ops.AsOf.joinForward]]): each left row matches the first
    * right row at-or-after its event time, per key. A forward match can
    * live in the future, so state carries the UNMATCHED left rows
    * per key (the analogue of a real stream's watermark state — bounded
    * by the key's right-event gap, not by the stream); each trigger runs
    * the exact batch operator over (pending ∪ batch-left) × batch-right.
    * Under event-time-ordered arrival, the first right row a key sees
    * after a pending left IS its globally-earliest at-or-after match, so
    * per-trigger matching is exact. Matched lefts emit in the trigger
    * that completes them; [[asofForwardFlush]] emits the rest with their
    * typed-null payload when a finite replay drains (a live stream would
    * close them by watermark instead). Same tie contract as
    * [[asofBackwardSink]]: stage replay chunks on the join timestamp. */
  def asofForwardSink(stream: DataFrame, keys: Seq[String], tsCol: String,
                      payload: Seq[String],
                      leftFrom: DataFrame => DataFrame,
                      rightFrom: DataFrame => DataFrame,
                      outTable: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val pendT = s"${outTable}__asof_pending"
        val lb = leftFrom(batch)
        val rb = rightFrom(batch)
          .select(((keys :+ tsCol) ++ payload).map(col): _*)
          // the match marker: payload columns may be legitimately null,
          // a carried `true` is not
          .withColumn("__m", lit(true))
        val cand = (if (sp.catalog.tableExists(pendT))
            sp.table(pendT).select(lb.columns.map(col): _*).unionByName(lb)
          else lb).localCheckpoint()
        val joined = graft.ops.AsOf
          .joinForward(cand, rb, keys, tsCol, payload :+ "__m")
          .localCheckpoint() // feeds out-append AND the pending overwrite
        joined.filter(col("asof___m")).drop("asof___m")
          .write.mode("append").format("parquet").saveAsTable(outTable)
        // pending rows keep their typed-null asof_ columns so the flush
        // can append them without knowing the payload types
        joined.filter(col("asof___m").isNull).drop("asof___m")
          .write.mode("overwrite").format("parquet").saveAsTable(pendT)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Emit the left rows still unmatched when a finite replay drains —
    * their forward match does not exist, so they carry null payload
    * (exactly the batch left-outer semantics). */
  def asofForwardFlush(sp: SparkSession, outTable: String): Unit = {
    val pendT = s"${outTable}__asof_pending"
    if (sp.catalog.tableExists(pendT)) {
      sp.table(pendT).localCheckpoint()
        .write.mode("append").format("parquet").saveAsTable(outTable)
      sp.sql(s"DROP TABLE $pendT")
    }
  }

  /** Close the sessions still open when a finite replay drains (the
    * end-of-stream flush every sessionizer needs; a live stream would
    * instead close them by watermark). */
  def sessionizeFlush(sp: SparkSession, outTable: String): Unit = {
    val openT = s"${outTable}__open"
    if (sp.catalog.tableExists(openT)) {
      sp.table(openT)
        .select(col("user_id"), (col("emitted") + 1).as("sess_id"),
          col("n").as("n_events"), col("s0").as("sess_start"),
          col("e1").as("sess_end"))
        .localCheckpoint()
        .write.mode("append").format("parquet").saveAsTable(outTable)
      sp.sql(s"DROP TABLE $openT")
    }
  }

  /** T2: per-row streaming injection for a list of settings (stats from the
    * static pre-pass). */
  def injectStream(stream: DataFrame, staticDf: DataFrame, idCol: String,
                   tsCol: String, settings: Seq[AnomalySetting]): DataFrame =
    settings.foldLeft(stream) { (s, setting) =>
      val stats = Injector.staticStats(staticDf, idCol, tsCol, setting)
      Injector.injectStreaming(s, idCol, tsCol, setting, stats)
    }

  /** T3: incremental detection sink — scores each micro-batch with the
    * pre-trained model and appends to `outTable`. */
  def detectSink(stream: DataFrame, fitted: FittedDetector, outTable: String,
                 availableNow: Boolean = true,
                 trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        fitted.transform(batch)
          .write.mode("append").format("parquet").saveAsTable(outTable)
      }
    val triggered =
      if (availableNow) writer.trigger(Trigger.AvailableNow())
      else trigger.map(writer.trigger).getOrElse(writer)
    triggered.start()
  }
}
