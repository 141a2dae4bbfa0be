package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch analytics beyond sessionization: burst (anomaly)
  * detection against a trailing baseline, and rolling-window distinct
  * actives. Both are all-integer surfaces (epoch-second arithmetic,
  * cross-multiplied thresholds) so their gates carry no floating point.
  */
object EventAnalytics {

  /** Hours whose event count spikes above `multNum/multDen` times the
    * trailing per-hour average for the same event type.
    *
    * Two stages: an hourly pre-aggregate (map-side combinable — the
    * input shuffle carries (type, hour) partial counts, never raw
    * events), then one window per event type over the TRAILING
    * `trailingHours` OBSERVED hour rows (`ROWS BETWEEN t PRECEDING AND
    * 1 PRECEDING` — hours with zero events are absent, so the baseline
    * is "recent active hours", deliberately; a gap-filled calendar
    * frame would need a generated dimension and buys nothing for spike
    * detection). `minTrailing` suppresses flags before the baseline
    * has enough history to mean anything.
    *
    * The spike test is integer cross-multiplication —
    * `n·trail_n·multDen ≥ multNum·trail_sum` ⇔
    * n ≥ (multNum/multDen)·avg — so the gate never divides.
    *
    * Scale: the window partitions by event type; cardinality(type) is
    * small, but each partition holds only HOURS (8,760/year), not
    * events, so even a single-type stream is a few thousand rows per
    * year per partition — driver-safe and executor-trivial at any
    * event volume. The heavy lifting (raw events → hourly counts) is
    * the fully parallel pre-aggregate.
    */
  def burstHours(events: DataFrame, typeCol: String, tsNanosCol: String,
      trailingHours: Int = 24, minTrailing: Int = 12,
      multNum: Int = 2, multDen: Int = 1): DataFrame = {
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        (col(tsNanosCol).cast("long").div_(1000000000L).div_(3600L) * 3600L)
          .as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
    val fr = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(-trailingHours.toLong, -1L)
    hourly
      .withColumn("trail_n", count(lit(1)).over(fr))
      .withColumn("trail_sum", coalesce(sum(col("n_events")).over(fr), lit(0L)))
      .filter(col("trail_n") >= minTrailing &&
        col("n_events") * col("trail_n") * lit(multDen.toLong) >=
          lit(multNum.toLong) * col("trail_sum"))
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("trail_n"), col("trail_sum"))
  }

  /** Rolling `windowDays`-day distinct active users, one row per day
    * OBSERVED in the data.
    *
    * The scalable formulation inverts the range join: each distinct
    * (user, day) activity row is exploded to the `windowDays` future
    * days it contributes to, de-duplicated on (user, contrib_day), and
    * counted — three linear shuffles with map-side combine, versus a
    * days×activity range join whose matched row count is identical but
    * whose JOIN has no equi-key (falls to broadcast-nested-loop on big
    * inputs). The observed-days semi-join keeps the grid honest at the
    * corpus edge (days past max(day) would otherwise report partial
    * windows) and broadcasts — it is one row per distinct day, a few
    * thousand rows per decade.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String,
      tsNanosCol: String, windowDays: Int = 7): DataFrame = {
    val ud = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("user_id"),
        col(tsNanosCol).cast("long").div_(1000000000L).div_(86400L).as("day"))
      .distinct()
    val observed = ud.select(col("day")).distinct()
    ud.select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1).cast("long")))
          .as("day"))
      .distinct()
      .join(broadcast(observed), "day")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Per-(type, day) daily counts with a trailing moving average over
    * the last `windowRows` OBSERVED days (rows frame, not a range —
    * the [[burstHours]] convention: quiet gaps don't dilute), the
    * standard rolling health metric a pipeline dashboard plots. The
    * average ships as the exact scaled integer
    * `avg_e4 = round(Σcounts/rows · 1e4)` — integer lineage end to
    * end. One shuffle (the daily aggregate); the window runs over the
    * per-type daily table, cardinality days×types. */
  def rollingDailyMetrics(events: DataFrame, typeCol: String,
      tsNanosCol: String, windowRows: Int = 7): DataFrame = {
    require(windowRows >= 1, "windowRows must be >= 1")
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(windowRows - 1), 0)
    daily
      .withColumn("trail_sum", sum(col("n_events")).over(w))
      .withColumn("trail_rows", count(lit(1)).over(w))
      .select(col("event_type"), col("day"), col("n_events"),
        col("trail_sum"),
        graft.functions.ExactRound.ratioScaled(col("trail_sum"),
          col("trail_rows"), 4).as("trail_avg_e4"))
  }

  /** First-order transition matrix over each user's event sequence —
    * (from_type, to_type) counts plus the exact e6 conditional
    * probability P(to | from): the Markov summary behind funnel
    * diagnosis ("what actually follows a click?") and behind
    * sequence-model training-data QA (does the corpus even contain
    * the transitions the model must learn?). Transitions are
    * consecutive events per user in (ts, tie) order; the last event
    * of each user emits none.
    *
    * Shape at scale: one per-user lead window (user partitions are
    * small), one map-side-combinable pair count, and a broadcast join
    * of the from-type totals (|types| rows). */
  def transitionMatrix(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).cast("long").as("n_from"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        graft.functions.ExactRound.ratioScaled(col("n"), col("n_from"), 6)
          .as("p_e6"))
  }

  /** Churn labels — the "will this user come back?" training-label
    * builder: per user, event count, last active day, days inactive
    * relative to the corpus horizon (its max observed day — the
    * label-generation cutoff), and the churn flag
    * (inactive >= `horizonDays`). The standard retention-model
    * labeling pass; leakage-free by construction because the cutoff
    * is data-derived, not wall-clock ([[graft.Bench]] sessions ban
    * `Date.now`-style inputs for the same reproducibility reason).
    *
    * Shape at scale: one map-side-combinable per-user aggregate + a
    * 1-row broadcast corpus horizon. */
  def churnLabels(events: DataFrame, userCol: String,
      tsNanosCol: String, horizonDays: Int = 7): DataFrame = {
    require(horizonDays >= 1, "horizonDays must be >= 1")
    val day = col(tsNanosCol).div_(86400L * 1000000000L)
    val perUser = events
      .select(col(userCol), day.as("day__"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), max(col("day__")).as("last_day"))
    val horizon = perUser.agg(max(col("last_day")).as("max_day__"))
    perUser.crossJoin(broadcast(horizon))
      .select(col(userCol), col("n_events"), col("last_day"),
        (col("max_day__") - col("last_day")).as("days_inactive"),
        (col("max_day__") - col("last_day") >= horizonDays.toLong)
          .as("churned"))
  }

  /** Inter-arrival statistics — per event type, the robust summary
    * (doubled-units median + MAD, the q76 kernel) of the gaps between
    * a user's consecutive events of that type: the arrival-cadence
    * profile behind capacity planning and bot detection (a median
    * gap of 0-1 s is not a human). Gaps are computed WITHIN
    * (user, type) — per-user windows stay small at any corpus size;
    * a global per-type sequence would interleave users and put a
    * whole type in one window task.
    *
    * Output: (type, n_gaps, med2, mad4) — med2/mad4 in doubled
    * seconds units per the [[RobustScore]] convention. */
  def interarrivalStats(events: DataFrame, userCol: String,
      typeCol: String, tsNanosCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsNanosCol), col(tieCol))
    val gaps = events
      .select(col(userCol), col(typeCol), col(tsNanosCol), col(tieCol))
      .withColumn("prev__", lag(col(tsNanosCol), 1).over(w))
      .filter(col("prev__").isNotNull)
      .select(col(typeCol),
        (col(tsNanosCol) - col("prev__")).div_(1000000000L).as("gap_s"))
    // scalable=true: the per-type median/MAD ranks run through
    // ScalableRank.groupRowNumber's range-partitioned sort — with a
    // handful of event types and billions of gaps, the default window
    // form would put one whole type in one task (r11 advice)
    RobustScore.madZScore(gaps, Seq(typeCol), col("gap_s"),
        scalable = true)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"), max(col("med2")).as("med2"),
        max(col("mad4")).as("mad4"))
  }

  /** Throttle / minimum-spacing filter — keep an event only if the
    * key's immediately preceding event is more than `minGapSeconds`
    * older (or there is none): the batch twin of a rate-limiting
    * ingest filter, and the dedup rule for double-fired trackers.
    * NOTE the documented semantics: spacing is relative to the
    * PREVIOUS RAW event (one `lag`), not to the last KEPT one — the
    * latter is inherently sequential per key and lives in the
    * stateful streaming layer ([[graft.streaming.Streams]]), while
    * this form is one window, engine-mirrorable, and what an
    * idempotent backfill wants.
    *
    * Shape at scale: one per-key window, codegen'd filter; no
    * shuffles beyond the key partition. */
  def throttle(events: DataFrame, keyCols: Seq[String],
      tsNanosCol: String, tieCol: String,
      minGapSeconds: Long): DataFrame = {
    require(minGapSeconds >= 1, "minGapSeconds must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsNanosCol), col(tieCol))
    val prev = lag(col(tsNanosCol), 1).over(w)
    events
      .withColumn("prev__", prev)
      .filter(col("prev__").isNull ||
        col(tsNanosCol) - col("prev__") > minGapSeconds * 1000000000L)
      .drop("prev__")
  }

  /** Exact e6-scaled decay powers (decayNum/decayDen)^k for k in
    * [0, maxAgeDays] — BigInt rationals rounded half-up, no libm pow
    * anywhere, so any engine reproduces the weights bit for bit.
    * Shared by [[decayActivity]] and its oracle SQL. */
  def decayPowersE6(decayNum: Int, decayDen: Int,
      maxAgeDays: Int): Seq[Long] =
    (0 to maxAgeDays).map { kk =>
      val nk = BigInt(decayNum).pow(kk)
      val dk = BigInt(decayDen).pow(kk)
      ((BigInt(2000000) * nk + dk) / (dk * 2)).toLong
    }

  /** EWMA daily metric SERIES — per (group, observed day), the
    * exponentially-decayed trailing event count
    * Σ_{0 <= t-d <= maxAgeDays} n_d · decay^(t-d), with the decay
    * powers as the shared exact e6 integer table ([[decayPowersE6]] —
    * one Scala derivation for engine and oracle, no libm per row):
    * the smoothed monitoring line a burst/regression detector
    * thresholds against, where a plain trailing mean ([[q120]]-style)
    * over-weights old days.
    *
    * Shape at scale: daily counts FIRST (map-side-combinable over the
    * corpus), then the bounded offset explode (maxAgeDays+1 rows per
    * (group, day) AGGREGATE, never per event), one groupBy, one
    * semi-join back to observed days. */
  /** One-sided CUSUM change-point detection over each group's daily
    * count series (Page 1954; the sequential-analysis standard for
    * "which event streams shifted upward, and on what day?").
    * Textbook recursion S_t = max(0, S_(t-1) + x_t − k) is running
    * state with reset — not directly distributable — but it has the
    * exact prefix form
    *
    *   S_t = cum_t − least(0, min_(j≤t) cum_j),  cum = Σ (x − k),
    *
    * so two cumulative windows compute it. The allowance k per group
    * is ceil(mean daily count) — a stream at its historical level
    * accumulates nothing; the alarm fires when S_t > hMult·k (the
    * classic h = 5σ-flavored multiple, in count units). All integer.
    *
    * Shape at scale: one map-side-combinable daily aggregate (corpus
    * → |groups|·|days| rows); the windows run per group over that
    * bounded daily frame only — the [[ewmaDailySeries]] precedent —
    * and the per-group k joins back via broadcast. */
  def cusumDaily(events: DataFrame, groupCol: String,
      tsNanosCol: String, hMult: Long = 5L): DataFrame = {
    require(hMult >= 1, "hMult >= 1")
    val day = graft.functions.TimeFns.floorDiv(col(tsNanosCol),
      86400L * 1000000000L)
    val daily = events
      .select(col(groupCol), day.as("day"))
      .groupBy(col(groupCol), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val per = daily.groupBy(col(groupCol))
      .agg(call_function("div",
        sum(col("n_events")) + count(lit(1)) - 1L,
        count(lit(1))).as("k"))
    val run = Window.partitionBy(col(groupCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(per), Seq(groupCol))
      .withColumn("cum__",
        sum(col("n_events") - col("k")).over(run))
      .withColumn("cusum",
        col("cum__") - least(lit(0L), min(col("cum__")).over(run)))
      .select(col(groupCol), col("day"), col("n_events"), col("k"),
        col("cusum"), (col("cusum") > col("k") * hMult).as("alarm"))
  }

  def ewmaDailySeries(events: DataFrame, groupCol: String,
      tsNanosCol: String, decayNum: Int = 4, decayDen: Int = 5,
      maxAgeDays: Int = 30): DataFrame = {
    val powers = decayPowersE6(decayNum, decayDen, maxAgeDays)
    val wArr = array(powers.map(lit): _*)
    val day = graft.functions.TimeFns.floorDiv(col(tsNanosCol),
      86400L * 1000000000L)
    val daily = events
      .select(col(groupCol), day.as("day"))
      .groupBy(col(groupCol), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val contrib = daily
      .select(col(groupCol), col("day"), col("n_events"),
        explode(sequence(lit(0), lit(maxAgeDays))).as("off__"))
      .select(col(groupCol).as("g__"), (col("day") + col("off__")).as("t_day"),
        (col("n_events") *
          element_at(wArr, col("off__").cast("int") + 1)).as("c__"))
      .groupBy(col("g__"), col("t_day"))
      .agg(sum(col("c__")).as("ewma_e6"))
    daily
      .join(contrib,
        col(groupCol) === col("g__") && col("day") === col("t_day"))
      .select(col(groupCol), col("day"), col("n_events"),
        col("ewma_e6"))
  }

  /** Recency-weighted user activity — the time-decayed engagement score
    * feature stores compute (each event contributes decay^age_days;
    * half-life ≈ ln2/ln(den/num) days): per user, the event count and
    * Σ decay^age as an e6-scaled long. Events older than `maxAgeDays`
    * contribute zero (bounds the lookup and matches the usual
    * feature-freshness cutoff). The reference day is the table's max
    * event day — data-derived and deterministic, so reruns over the
    * same table agree (the gate requirement; a serving deployment
    * passes "today" via the events it loads).
    *
    * Scale shape: one broadcast scalar (the max day), one codegen'd
    * array-literal lookup per event, one groupBy(user) with map-side
    * partial sums of longs. No window, no libm. */
  def decayActivity(events: DataFrame, userCol: String, tsNanosCol: String,
      decayNum: Int = 4, decayDen: Int = 5, maxAgeDays: Int = 30)
      : DataFrame = {
    require(decayNum > 0 && decayDen > decayNum && maxAgeDays >= 0,
      "need 0 < decayNum < decayDen and maxAgeDays >= 0")
    val powE6 = decayPowersE6(decayNum, decayDen, maxAgeDays)
    val days = events.select(col(userCol).as("user__"),
      col(tsNanosCol).div_(86400L * 1000000000L).as("d__"))
    val refDay = days.agg(max(col("d__")).as("ref__"))
    days.crossJoin(broadcast(refDay))
      .withColumn("age__", col("ref__") - col("d__"))
      .withColumn("w__",
        when(col("age__") <= maxAgeDays,
          element_at(array(powE6.map(lit): _*),
            col("age__").cast("int") + 1))
          .otherwise(lit(0L)))
      .groupBy(col("user__"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("w__")).as("activity_e6"))
      .withColumnRenamed("user__", userCol)
  }

  /** ANY-GAP ordered-pair support — for every ordered event-type pair
    * (A, B), how many users did A at some point STRICTLY BEFORE some
    * B (not necessarily adjacently — the gap-tolerant complement of
    * [[transitionMatrix]]'s consecutive-step counts, i.e. the
    * sequential-pattern support of the length-2 pattern ⟨A B⟩ à la
    * PrefixSpan), plus the lift of the pair against the independent
    * marginals: lift_e6 = n_ab·U / (n_a·n_b) over U total users.
    *
    * The existential "some A before some B" collapses to a per-user
    * TYPE SUMMARY — a user supports ⟨A B⟩ iff min_ts(A) < max_ts(B) —
    * so the pair expansion runs over the per-user distinct-type table
    * (≤ |types| rows per user, bounded by the event vocabulary),
    * never over raw events: one per-(user, type) min/max aggregate,
    * one per-user self-join with bounded multiplicity, one
    * map-side-combinable distinct-user count, two broadcast marginal
    * joins. A = B rows are excluded (self-precedence is near-vacuous
    * for any user with 2+ events of a type). */
  def orderedPairSupport(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String): DataFrame = {
    import graft.functions.ExactRound
    val perType = graft.Caches.register(events
      .select(col(userCol).as("u__"), col(typeCol).as("t__"),
        col(tsCol).as("ts__"))
      .groupBy(col("u__"), col("t__"))
      .agg(min(col("ts__")).as("min_ts__"), max(col("ts__")).as("max_ts__"))
      .persist())
    val totU = perType.select(col("u__")).distinct()
      .agg(count(lit(1)).as("nu__"))
    val marg = perType.groupBy(col("t__"))
      .agg(count(lit(1)).as("n_users__"))
    val a = perType.select(col("u__"), col("t__").as("type_a"),
      col("min_ts__"))
    val b = perType.select(col("u__"), col("t__").as("type_b"),
      col("max_ts__"))
    a.join(b, Seq("u__"))
      .filter(col("type_a") =!= col("type_b") &&
        col("min_ts__") < col("max_ts__"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(marg.select(col("t__").as("type_a"),
        col("n_users__").as("n_a"))), "type_a")
      .join(broadcast(marg.select(col("t__").as("type_b"),
        col("n_users__").as("n_b"))), "type_b")
      .crossJoin(broadcast(totU))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        ExactRound.ratioScaledBig(
          col("n_ab").cast("decimal(38,0)") * col("nu__"),
          col("n_a").cast("decimal(38,0)") * col("n_b"), 6)
          .as("lift_e6"))
  }

  /** Consecutive-day activity STREAKS per user — the classic
    * gaps-and-islands rollup (engagement streaks for retention
    * features; also the "N consecutive days of scrape success" health
    * card): per user the count of distinct active days, the number of
    * maximal consecutive-day runs, and the longest run. The island
    * key is `day − row_number()` over the user's distinct days —
    * constant within a consecutive run, strictly decreasing across a
    * gap — so islands fall out of one window + two groupBys, all
    * integer.
    *
    * Shape at scale: the window partitions by USER over the per-user
    * DISTINCT-day table (≤ horizon-days rows per partition, bounded
    * by the calendar, not the corpus); both rollups are
    * map-side-combinable. */
  def activityStreaks(events: DataFrame, userCol: String,
      tsNanosCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user__")).orderBy(col("d__"))
    events
      .select(col(userCol).as("user__"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("d__"))
      .distinct()
      .withColumn("isl__", col("d__") - row_number().over(w))
      .groupBy(col("user__"), col("isl__"))
      .agg(count(lit(1)).as("run__"))
      .groupBy(col("user__"))
      .agg(sum(col("run__")).cast("long").as("n_days"),
        count(lit(1)).as("n_streaks"),
        max(col("run__")).as("longest_streak"))
      .withColumnRenamed("user__", userCol)
  }

  /** STRICT ORDERED FUNNEL within a horizon — users who performed the
    * given steps in order (each event STRICTLY after the previous
    * step's chosen event, and within `horizonNanos` of the user's
    * step-1 anchor), with per-stage user counts and conversion vs
    * stage 1. Greedy earliest-event semantics: each stage binds to
    * the EARLIEST qualifying event; for "reached within a horizon
    * from the first entry" queries this matches the exhaustive search
    * whenever one exists inside the horizon (picking the earliest t₂
    * only ever widens what t₃ can satisfy — both constraints relax
    * monotonically in earlier predecessors), so the greedy chain is
    * exact, not an approximation.
    *
    * Shape at scale: one cached (user, type, ts) projection; per
    * stage one equi-join on user against the shrinking reached set
    * plus a map-side-combinable min — stages are a bounded constant,
    * the reached set only shrinks; the conversion window runs over
    * the ≤|steps|-row stage table. */
  def strictFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      horizonNanos: Long): DataFrame = {
    require(steps.size >= 2 && steps.size <= 8 &&
      steps.distinct.size == steps.size,
      "need 2..8 distinct steps")
    import graft.functions.ExactRound
    val ev = graft.Caches.register(events
      .select(col(userCol).as("u__"), col(typeCol).as("t__"),
        col(tsCol).cast("long").as("ts__"))
      .filter(col("t__").isin(steps: _*))
      .persist())
    var cur = ev.filter(col("t__") === steps.head)
      .groupBy(col("u__")).agg(min(col("ts__")).as("t1__"))
      .select(col("u__"), col("t1__"), col("t1__").as("prev__"))
    val stages = Seq.newBuilder[DataFrame]
    stages += cur.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("stage"), lit(steps.head).as("step"),
        col("n_users"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      cur = ev.filter(col("t__") === step)
        .join(cur, "u__")
        .filter(col("ts__") > col("prev__") &&
          col("ts__") - col("t1__") <= horizonNanos)
        .groupBy(col("u__"), col("t1__"))
        .agg(min(col("ts__")).as("nx__"))
        .select(col("u__"), col("t1__"), col("nx__").as("prev__"))
      stages += cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(step).as("step"),
          col("n_users"))
    }
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("stage"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    stages.result().reduce(_ unionByName _)
      .withColumn("conv_e6", ExactRound.ratioScaled(col("n_users"),
        first(col("n_users")).over(w), 6))
  }

  /** RFM user segmentation — recency / frequency / monetary quintiles
    * (the classic value-segmentation sheet; also the "which users feed
    * the training data" weighting input): per user the days since
    * last activity (vs the corpus horizon — data-derived, so reruns
    * agree), the event count, and the e2 monetary sum; each metric
    * quintiled 1..5 over the unique total order (metric ASC, user ASC)
    * as q = ⌊(rn−1)·5/n⌋ + 1 — deterministic at any tie density, and
    * identical in the oracle's row_number form. `rfm_code` packs the
    * three digits. NOTE the ASCENDING convention: r_q 1 = most recent,
    * f_q/m_q 1 = lightest users.
    *
    * Shape at scale: one per-user aggregate, a 1-row broadcast
    * horizon, and three range-partitioned global ranks
    * ([[ScalableRank]] — no global window); quintile math is pure
    * integer. */
  def rfmScores(events: DataFrame, userCol: String, tsNanosCol: String,
      valueCol: String): DataFrame = {
    val per = graft.Caches.register(events
      .groupBy(col(userCol).as("u__"))
      .agg(max(col(tsNanosCol).div_(86400L * 1000000000L)).as("ld__"),
        count(lit(1)).as("frequency"),
        // coalesce AFTER the sum: an all-null-value user must read 0,
        // not sort as NULL (Spark sorts nulls first ASC, DuckDB last
        // — an unguarded NULL would order differently per engine)
        coalesce(sum(round(col(valueCol) * 100).cast("long")), lit(0L))
          .as("monetary_e2"))
      .persist())
    val hor = per.agg(max(col("ld__")).as("h__"))
    var base = per.crossJoin(broadcast(hor))
      .select(col("u__"), (col("h__") - col("ld__")).as("recency_days"),
        col("frequency"), col("monetary_e2"), lit(1).as("g__"))
    for ((metric, out) <- Seq("recency_days" -> "r_q",
        "frequency" -> "f_q", "monetary_e2" -> "m_q")) {
      base = ScalableRank.groupRowNumber(base, Seq("g__"),
          Seq(col(metric), col("u__")), "rn__", "n__")
        .withColumn(out, call_function("div",
          (col("rn__") - 1L) * 5L, col("n__")) + 1L)
        .drop("rn__", "n__")
    }
    base.select(col("u__").as(userCol), col("recency_days"),
      col("frequency"), col("monetary_e2"), col("r_q"), col("f_q"),
      col("m_q"),
      (col("r_q") * 100L + col("f_q") * 10L + col("m_q")).as("rfm_code"))
  }

  /** Top ENTRY PATHS — the distribution of each user's first `depth`
    * event types in time order ("what do journeys start with?", the
    * onboarding-flow card next to [[transitionMatrix]]'s step edges):
    * one row per distinct path string with its user count. Users with
    * fewer than `depth` events contribute their full shorter path.
    * Order inside a user is (ts, tie) — pass a unique tie column so
    * the path is total-ordered under same-timestamp events.
    *
    * Shape at scale: one per-user window (rank ≤ depth cut), one
    * per-user collect of ≤ depth structs sorted in-row (array_sort on
    * (rn, type) — no cross-row ordering dependence), one
    * map-side-combinable path count. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, depth: Int = 3): DataFrame = {
    require(depth >= 1 && depth <= 8, "depth in 1..8")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u__")).orderBy(col("ts__"), col("tie__"))
    events
      .select(col(userCol).as("u__"), col(tsCol).as("ts__"),
        col(tieCol).as("tie__"), col(typeCol).as("t__"))
      .withColumn("rn__", row_number().over(w))
      .filter(col("rn__") <= depth)
      .groupBy(col("u__"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn__"), col("t__")))),
        x => x.getField("t__")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }

  /** LINEAR MULTI-TOUCH ATTRIBUTION — q237's last-touch sibling: per
    * conversion event, every `touchType` event by the same user
    * STRICTLY before it and within `windowNanos` shares the credit
    * equally (credit_e6 = 10⁶ div n_touches, truncating — the exact
    * integer convention; Σ credit ≤ 10⁶ with the remainder
    * documented). Conversions with no in-window touch report 0
    * touches and 0 credit (organic).
    *
    * Shape at scale: one equi-join on USER between the two filtered
    * event slices (per-user multiplicities are activity-bounded, the
    * q237 allowance) + one map-side-combinable per-conversion count;
    * no windows. */
  def linearAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, touchType: String,
      convType: String, windowNanos: Long): DataFrame = {
    import graft.functions.ExactRound
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u__"), col(idCol).as("conv_id"),
        col(tsCol).as("ct__"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("u__"), col(tsCol).as("tt__"))
    val counts = conv.join(touch, Seq("u__"), "left")
      .filter(col("tt__").isNull ||
        (col("tt__") < col("ct__") &&
          col("ct__") - col("tt__") <= windowNanos))
      .groupBy(col("conv_id"))
      .agg(sum(when(col("tt__").isNotNull, 1L).otherwise(0L))
        .cast("long").as("n_touches"))
    // conversions whose only join rows were out-of-window touches
    // vanish in the filter — restore them as organic
    conv.select(col("conv_id"))
      .join(counts, Seq("conv_id"), "left")
      .select(col("conv_id"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        when(coalesce(col("n_touches"), lit(0L)) > 0,
          call_function("div", lit(1000000L), col("n_touches")))
          .otherwise(lit(0L)).as("credit_e6"))
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution — the 40/20/40
    * sibling of [[linearAttribution]]'s equal split: per conversion,
    * in-window strictly-earlier touches in (ts, id) order get 40% for
    * the first, 40% for the last, and the middles share the remaining
    * 20% equally (single touch: 100%; two: 50/50). Credits are exact
    * truncating e6 divisions (the q273 convention — floors, so a
    * conversion's credits may sum slightly under 10⁶; the remainder is
    * the rounding dust, not a lost touch). Emits one row PER TOUCH
    * (position, n_touches, credit) — organic conversions have no
    * touches and appear only in [[linearAttribution]]'s per-conversion
    * sheet.
    *
    * Shape at scale: the same conversion⋈touch in-window join as
    * [[linearAttribution]], one per-conversion window (bounded by
    * in-window touches per conversion). */
  def positionAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, touchType: String,
      convType: String, windowNanos: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u__"), col(idCol).as("conv_id"),
        col(tsCol).as("ct__"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("u__"), col(idCol).as("touch_event_id"),
        col(tsCol).as("tt__"))
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("tt__"), col("touch_event_id"))
    val p = Window.partitionBy(col("conv_id"))
    conv.join(touch, Seq("u__"))
      .filter(col("tt__") < col("ct__") &&
        col("ct__") - col("tt__") <= windowNanos)
      .withColumn("position", row_number().over(w).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(p).cast("long"))
      .select(col("conv_id"), col("touch_event_id"), col("position"),
        col("n_touches"),
        when(col("n_touches") === 1L, lit(1000000L))
          .when(col("n_touches") === 2L, lit(500000L))
          .when(col("position") === 1L ||
            col("position") === col("n_touches"), lit(400000L))
          .otherwise(call_function("div", lit(200000L),
            col("n_touches") - 2L)).as("credit_e6"))
  }

  /** MANN-KENDALL trend test per event type — over the daily-count
    * series, S = Σ_{i<j} sign(y_j − y_i) and Kendall's tau-a
    * S / (n·(n−1)/2) as the signed exact e6 (tau-b's tie-corrected
    * denominator needs a square root, so the integer-exact tau-a is
    * the shipped form; read S and the pair counts for tie context):
    * the non-parametric "is this series monotonically drifting?"
    * alarm next to [[rollingSlope]]'s local fit — robust to spikes a
    * least-squares slope chases.
    *
    * Shape at scale: the pair join is |days|² per type — bounded by
    * the CALENDAR (a 10-year horizon is ~3.7k days → ~7M pairs/type),
    * not by data volume; one daily-aggregate shuffle feeds it. */
  def mannKendall(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    import graft.functions.ExactRound
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y__"))
    val a = daily.select(col("event_type"), col("day").as("di__"),
      col("y__").as("yi__"))
    val b = daily.select(col("event_type"), col("day").as("dj__"),
      col("y__").as("yj__"))
    a.join(b, Seq("event_type"))
      .filter(col("di__") < col("dj__"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("yj__") > col("yi__"), 1L)
          .when(col("yj__") < col("yi__"), -1L).otherwise(0L))
          .cast("long").as("s_stat"))
      .select(col("event_type"), col("n_pairs"), col("s_stat"),
        ExactRound.ratioScaledSigned(col("s_stat"), col("n_pairs"), 6)
          .as("tau_a_e6"))
  }

  /** FANO FACTOR (index of dispersion) of daily counts per event
    * type — variance-to-mean as the single exact rational
    * F = (n·Σy² − (Σy)²) / (n·Σy), population variance over OBSERVED
    * days (the [[rollingDailyMetrics]] convention — quiet calendar
    * gaps are [[densifyDaily]]'s job): ≈10⁶ reads Poisson-like, ≫10⁶
    * reads bursty/clumped, ≪10⁶ reads throttled/regular — the
    * one-number burstiness summary next to [[burstHours]]'s hourly
    * drill-down. Numerator is ≥ 0 by Cauchy–Schwarz; a single
    * observed day reads 0 variance.
    *
    * Shape at scale: one daily tally shuffle + one per-type aggregate
    * with Σy² in DECIMAL(38,0) (daily counts square past long at
    * corpus scale). */
  def fanoFactor(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    import graft.functions.ExactRound
    val dec = "decimal(38,0)"
    events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y__"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("y__")).cast("long").as("n_events"),
        sum(col("y__").cast(dec) * col("y__")).as("syy__"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        ExactRound.ratioScaledBig(
          col("n_days").cast(dec) * col("syy__") -
            col("n_events").cast(dec) * col("n_events"),
          col("n_days").cast(dec) * col("n_events"), 6).as("fano_e6"))
  }

  /** NEW vs RETURNING daily active users — per day, actives split by
    * "is this the user's FIRST observed day?", with the e6 returning
    * share: the growth-accounting card next to [[churnLabels]]'
    * forward-looking flag and [[rollingActiveUsers]]' window count
    * (cohort-day-0 volume and stickiness in one table).
    *
    * Shape at scale: one distinct (user, day) shuffle, one per-user
    * min-day aggregate (map-side combinable), a key join back, and
    * the daily tally. No windows. */
  def newVsReturning(events: DataFrame, userCol: String,
      tsNanosCol: String): DataFrame = {
    import graft.functions.ExactRound
    val ud = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("u__"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .distinct()
    val first = ud.groupBy(col("u__"))
      .agg(min(col("day")).as("d0__"))
    ud.join(first, Seq("u__"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("d0__"), 1L).otherwise(0L))
          .cast("long").as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        ExactRound.ratioScaled(col("n_active") - col("n_new"),
          col("n_active"), 6).as("returning_share_e6"))
  }

  /** LEAD–LAG scan between two event types' daily series — for every
    * lag in [−maxLag, maxLag], the signed squared Pearson correlation
    * of (x_d, y_{d+lag}) over the zero-filled calendar overlap, as an
    * exact integer: sign(num) · num²·10⁶ / (denx·deny) through the
    * q275 two-stage ladder (Cauchy–Schwarz bounds the intermediate at
    * 10³·deny, so DECIMAL(38,0) never overflows where a single num²
    * would at corpus scale). The "does views LEAD purchases, and by
    * how many days?" card — read the argmax row.
    *
    * Shape at scale: two daily tallies densified over the bounded
    * calendar (sequence-explode off a 1-row horizon), one
    * (2·maxLag+1)-row lag frame cross-joined and equi-joined on the
    * shifted day, one aggregate per lag. Everything is calendar-
    * bounded. */
  def leadLagScan(events: DataFrame, typeCol: String,
      tsNanosCol: String, typeX: String, typeY: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val base = events
      .select(col(typeCol).as("t__"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .filter(col("t__").isin(typeX, typeY))
      .groupBy(col("t__"), col("day"))
      .agg(count(lit(1)).as("c__"))
    val horizon = base.agg(min(col("day")).as("d0__"),
      max(col("day")).as("d1__"))
    val cal = horizon
      .select(explode(sequence(col("d0__"), col("d1__"))).as("day"))
    def dense(t: String, out: String) = cal
      .join(base.filter(col("t__") === t).select(col("day"),
        col("c__")), Seq("day"), "left")
      .select(col("day"), coalesce(col("c__"), lit(0L)).as(out))
    val x = dense(typeX, "x__")
    val y = dense(typeY, "y__")
    val lags = horizon
      .select(explode(sequence(lit(-maxLag), lit(maxLag))).as("l0__"))
      .select(col("l0__").cast("long").as("lag"))
    val shifted = lags.crossJoin(y)
      .select(col("lag"), (col("day") - col("lag")).as("day"),
        col("y__"))
    val j = shifted.join(x, Seq("day"))
    val ag = j.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x__")).cast("long").as("sx__"),
        sum(col("y__")).cast("long").as("sy__"),
        sum(dec(col("x__")) * col("y__")).as("sxy__"),
        sum(dec(col("x__")) * col("x__")).as("sxx__"),
        sum(dec(col("y__")) * col("y__")).as("syy__"))
    val num = dec(col("n_days")) * col("sxy__") -
      dec(col("sx__")) * col("sy__")
    val denx = dec(col("n_days")) * col("sxx__") -
      dec(col("sx__")) * col("sx__")
    val deny = dec(col("n_days")) * col("syy__") -
      dec(col("sy__")) * col("sy__")
    ag.select(col("lag"), col("n_days"),
        num.as("num__"), denx.as("dx__"), deny.as("dy__"))
      .select(col("lag"), col("n_days"),
        when(col("dx__") > 0 && col("dy__") > 0,
          when(col("num__") < 0, lit(-1L)).otherwise(lit(1L)) *
            call_function("div",
              call_function("div", abs(col("num__")) * lit(1000L),
                col("dx__")) * abs(col("num__")) * lit(1000L),
              col("dy__")).cast("long"))
          .otherwise(lit(0L)).as("r2_signed_e6"))
  }

  /** DAILY AUTOCORRELATION function per event type — [[leadLagScan]]
    * turned on itself: for every type and lag 1..`maxLag`, the
    * signed squared Pearson (e6, the q310 two-stage quotient ladder —
    * sign(r)·r², sqrt-free) between the zero-filled daily count
    * series and its own lag-shifted copy. Strong positive ACF at lag
    * 7 = weekly seasonality; at lag 1 = day-to-day momentum — the
    * "does this stream have structure?" card a forecasting choice
    * starts from.
    *
    * Shape at scale: one daily tally, a per-type calendar densify
    * off the 1-row global horizon, a lag × days equi-join per type —
    * everything after the first aggregate is calendar-bounded. */
  def acfDaily(events: DataFrame, typeCol: String,
      tsNanosCol: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val base = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c__"))
    val horizon = base.agg(min(col("day")).as("d0__"),
      max(col("day")).as("d1__"))
    val cal = base.select(col("event_type")).distinct()
      .crossJoin(broadcast(horizon))
      .select(col("event_type"),
        explode(sequence(col("d0__"), col("d1__"))).as("day"))
    val dense = cal.join(base, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("c__"), lit(0L)).as("x__"))
    val lags = horizon
      .select(explode(sequence(lit(1), lit(maxLag))).as("l0__"))
      .select(col("l0__").cast("long").as("lag"))
    val shifted = dense.crossJoin(broadcast(lags))
      .select(col("event_type"), col("lag"),
        (col("day") - col("lag")).as("day"), col("x__").as("y__"))
    val j = shifted.join(dense, Seq("event_type", "day"))
    val ag = j.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x__")).cast("long").as("sx__"),
        sum(col("y__")).cast("long").as("sy__"),
        sum(dec(col("x__")) * col("y__")).as("sxy__"),
        sum(dec(col("x__")) * col("x__")).as("sxx__"),
        sum(dec(col("y__")) * col("y__")).as("syy__"))
    val num = dec(col("n_days")) * col("sxy__") -
      dec(col("sx__")) * col("sy__")
    val denx = dec(col("n_days")) * col("sxx__") -
      dec(col("sx__")) * col("sx__")
    val deny = dec(col("n_days")) * col("syy__") -
      dec(col("sy__")) * col("sy__")
    ag.select(col("event_type"), col("lag"), col("n_days"),
        num.as("num__"), denx.as("dx__"), deny.as("dy__"))
      .select(col("event_type"), col("lag"), col("n_days"),
        when(col("dx__") > 0 && col("dy__") > 0,
          when(col("num__") < 0, lit(-1L)).otherwise(lit(1L)) *
            call_function("div",
              call_function("div", abs(col("num__")) * lit(1000L),
                col("dx__")) * abs(col("num__")) * lit(1000L),
              col("dy__")).cast("long"))
          .otherwise(lit(0L)).as("r2_signed_e6"))
  }

  /** SEASONAL-NAIVE backtest per event type — predict each calendar
    * day's count with the count 7 days earlier (the forecasting
    * baseline every fancier model must beat), over the zero-filled
    * horizon: absolute-error sum, exact e4 MAE, and e6 WAPE
    * (Σ|err|/Σactual — the denominator-robust form; per-day MAPE
    * divides by zero on quiet days and is deliberately absent).
    * Evaluation starts on the horizon's 8th day so every scored day
    * has a 7-back reference.
    *
    * Shape at scale: one daily tally, a calendar densify off the
    * 1-row horizon, one self-join on (type, day−7), one aggregate. */
  def seasonalNaiveBacktest(events: DataFrame, typeCol: String,
      tsNanosCol: String, period: Int = 7): DataFrame = {
    require(period >= 1, "period must be >= 1")
    import graft.functions.ExactRound
    val base = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c__"))
    val horizon = base.agg(min(col("day")).as("d0__"),
      max(col("day")).as("d1__"))
    val cal = base.select(col("event_type")).distinct()
      .crossJoin(broadcast(horizon))
      .select(col("event_type"),
        explode(sequence(col("d0__"), col("d1__"))).as("day"),
        col("d0__"))
    val dense = cal
      .join(base, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("d0__"),
        coalesce(col("c__"), lit(0L)).as("y__"))
    dense.alias("a")
      .join(dense.alias("p"),
        col("a.event_type") === col("p.event_type") &&
          col("p.day") === col("a.day") - period)
      .filter(col("a.day") >= col("a.d0__") + period)
      .groupBy(col("a.event_type").as("event_type"))
      .agg(count(lit(1)).as("n_days_eval"),
        sum(abs(col("a.y__") - col("p.y__"))).cast("long")
          .as("sum_abs_err"),
        sum(col("a.y__")).cast("long").as("sum_actual"))
      .select(col("event_type"), col("n_days_eval"),
        col("sum_abs_err"), col("sum_actual"),
        ExactRound.ratioScaled(col("sum_abs_err"), col("n_days_eval"),
          4).as("mae_e4"),
        ExactRound.ratioScaled(col("sum_abs_err"), col("sum_actual"),
          6).as("wape_e6"))
  }

  /** WEEK-OVER-WEEK trend card per event type — last 7 observed days
    * vs the prior 7, relative to the corpus horizon (data-derived,
    * rerun-stable): counts plus the exact e6 ratio (the "what spiked
    * since last week" monitoring sheet next to [[burstHours]]'s
    * hourly bursts and [[cusumDaily]]'s drift alarms; a type absent
    * last week reads ratio 0 by the zero-denominator convention —
    * look at the counts).
    *
    * Shape at scale: one 1-row broadcast horizon + one conditional
    * map-side-combinable aggregate; no windows. */
  def weekOverWeek(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    import graft.functions.ExactRound
    val dayNs = 86400L * 1000000000L
    val days = events.select(col(typeCol).as("t__"),
      col(tsNanosCol).div_(dayNs).as("d__"))
    val hor = days.agg(max(col("d__")).as("h__"))
    days.crossJoin(broadcast(hor))
      .groupBy(col("t__"))
      .agg(
        sum(when(col("d__") > col("h__") - 7L, 1L).otherwise(0L))
          .cast("long").as("n_recent"),
        sum(when(col("d__") <= col("h__") - 7L &&
            col("d__") > col("h__") - 14L, 1L).otherwise(0L))
          .cast("long").as("n_prior"))
      .select(col("t__").as(typeCol), col("n_recent"), col("n_prior"),
        ExactRound.ratioScaled(col("n_recent"), col("n_prior"), 6)
          .as("wow_e6"))
  }

  /** TEMPORAL co-occurrence — unordered event-type pairs that fire
    * within `windowNanos` of each other for the same user ("which
    * actions cluster in time?" — the session-free complement of
    * [[CoOccurrence.basketPairs]]' all-time baskets and
    * [[transitionMatrix]]'s adjacent steps): per unordered type pair,
    * the co-firing event-pair count and the distinct users involved.
    * Each EVENT pair counts once (the join requires id_a < id_b, a
    * unique total order), and same-type pairs are excluded.
    *
    * Shape at scale: one equi-join on USER with the window predicate
    * (per-user multiplicity is activity-bounded — the q237/q273
    * allowance; a time-bucketed decomposition is the escalation path
    * if per-user volumes explode), then two map-side-combinable
    * rollups. */
  def temporalCooccurrence(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      windowNanos: Long): DataFrame = {
    val a = events.select(col(userCol).as("u__"), col(tsCol).as("ta__"),
      col(idCol).as("ia__"), col(typeCol).as("xa__"))
    val b = events.select(col(userCol).as("u__"), col(tsCol).as("tb__"),
      col(idCol).as("ib__"), col(typeCol).as("xb__"))
    val pairs = a.join(b, Seq("u__"))
      .filter(col("ia__") < col("ib__") &&
        col("xa__") =!= col("xb__") &&
        abs(col("ta__") - col("tb__")) <= windowNanos)
      .select(col("u__"),
        least(col("xa__"), col("xb__")).as("type_x"),
        greatest(col("xa__"), col("xb__")).as("type_y"))
    val np = pairs.groupBy(col("type_x"), col("type_y"))
      .agg(count(lit(1)).as("n_pairs"))
    val nu = pairs.select(col("type_x"), col("type_y"), col("u__"))
      .distinct()
      .groupBy(col("type_x"), col("type_y"))
      .agg(count(lit(1)).as("n_users"))
    np.join(nu, Seq("type_x", "type_y"))
  }

  /** ROLLING OLS trend slope per event type — the windowed sibling of
    * [[graft.operators.GroupStats.olsTrend]]'s whole-series fit and of
    * [[rollingDailyMetrics]]' moving average: over the last
    * `windowRows` OBSERVED days (rows frame, the [[burstHours]]
    * convention), the least-squares slope of daily count on day,
    * signed exact e6 via Cramer's rule on integer window sums —
    * events/day of drift, the "is this source decaying right now?"
    * monitor that a whole-series fit smears out.
    *
    * Denominator n·Σx² − (Σx)² is ≥ 0 by Cauchy–Schwarz and 0 only
    * for a 1-row window, which reads slope 0 by the zero-denominator
    * convention. Shape at scale: one daily aggregate shuffle, one
    * bounded per-type window (cardinality days×types); the sums stay
    * in long (|Σxy| ≤ rows·day·count ≪ 2^63), the Cramer products in
    * DECIMAL(38,0). */
  def rollingSlope(events: DataFrame, typeCol: String,
      tsNanosCol: String, windowRows: Int = 7): DataFrame = {
    require(windowRows >= 2, "windowRows must be >= 2")
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column) = c.cast("decimal(38,0)")
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y__"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    daily
      .withColumn("n__", count(lit(1)).over(w))
      .withColumn("sx__", sum(col("day")).over(w))
      .withColumn("sy__", sum(col("y__")).over(w))
      .withColumn("sxy__", sum(col("day") * col("y__")).over(w))
      .withColumn("sxx__", sum(col("day") * col("day")).over(w))
      .select(col("event_type"), col("day"), col("y__").as("n_events"),
        col("n__").cast("long").as("win_rows"),
        graft.functions.ExactRound.ratioScaledSigned(
          dec(col("n__")) * col("sxy__") - dec(col("sx__")) * col("sy__"),
          dec(col("n__")) * col("sxx__") - dec(col("sx__")) * col("sx__"),
          6).as("slope_e6"))
  }

  /** Calendar DENSIFY + forward-fill per event type — the gap-filling
    * pass a daily-series consumer (rolling windows, EWMA, WoW cards)
    * needs before trusting "7 rows = 7 days": every type × every
    * calendar day of the corpus horizon, zero-filled counts, the
    * observed flag, days since the last observed day (−1 before the
    * first), and the forward-carried last observed daily max of
    * `valueCol` (a selection, not a sum — bit-exact across engines).
    *
    * Shape at scale: the calendar is |types| × |days| — days bounded
    * by the horizon (years, not data volume), so the sequence-explode
    * off a broadcast 1-row horizon is safe by construction; one daily
    * aggregate shuffle plus one per-type ordered window. */
  def densifyDaily(events: DataFrame, typeCol: String,
      tsNanosCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"),
        col(valueCol).as("v__"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n__"), max(col("v__")).as("vmax__"))
    val horizon = daily.agg(min(col("day")).as("d0__"),
      max(col("day")).as("d1__"))
    val cal = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(horizon))
      .select(col("event_type"),
        explode(sequence(col("d0__"), col("d1__"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("anchor__",
        last(when(col("n__").isNotNull, col("day")), ignoreNulls = true)
          .over(w))
      .select(col("event_type"), col("day"),
        coalesce(col("n__"), lit(0L)).as("n_events"),
        col("n__").isNotNull.as("observed"),
        coalesce(col("day") - col("anchor__"), lit(-1L))
          .as("days_since_obs"),
        last(col("vmax__"), ignoreNulls = true).over(w).as("carry_max"))
  }

  /** Markov NEXT-EVENT BACKTEST — does yesterday's transition matrix
    * predict tomorrow's events? Transitions (q122's lead pairs) are
    * split at the corpus-horizon midpoint by the day of the TARGET
    * event (train: strictly before; test: at/after — the predictor
    * never sees a test-day event as a target). The per-from_type
    * argmax successor from the TRAIN half (ties to the
    * lexicographically smallest to_type — the argmax-tie discipline)
    * is scored on the TEST half: top-1 accuracy per from_type. A
    * from_type unseen in training predicts NULL and scores 0 on its
    * test rows — reported, not dropped (the honest cold-start rate).
    *
    * Shape at scale: the per-user lead window (bounded per-user
    * partitions), one (from, to, split)-keyed aggregate, and
    * type²-bounded tables after that; the argmax window runs over
    * |types| rows per partition. */
  def markovBacktest(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val trans = events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"),
        col(tsCol).div_(86400L * 1000000000L).as("day__"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .withColumn("to_day", lead(col("day__"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("from_type"), col("to_type"), col("to_day"))
    val horizon = trans.agg(min(col("to_day")).as("d0__"),
      max(col("to_day")).as("d1__"))
    val tagged = trans.crossJoin(broadcast(horizon))
      .withColumn("is_test",
        col("to_day") >= graft.functions.TimeFns.floorDiv(
          col("d0__") + col("d1__"), 2L) + 1L)
    val trainCounts = tagged.filter(!col("is_test"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n__"))
    val pw = Window.partitionBy(col("from_type"))
      .orderBy(col("n__").desc, col("to_type").asc)
    val predictor = trainCounts
      .withColumn("rn__", row_number().over(pw))
      .filter(col("rn__") === 1)
      .select(col("from_type"), col("to_type").as("predicted"))
    tagged.filter(col("is_test"))
      .join(broadcast(predictor), Seq("from_type"), "left")
      .groupBy(col("from_type"), col("predicted"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("from_type"), col("predicted"), col("n_test"),
        col("n_correct"),
        graft.functions.ExactRound.ratioScaled(col("n_correct"),
          col("n_test"), 6).as("acc_e6"))
  }

  /** Discrete-time CHURN HAZARD table — retention analytics done
    * exactly: per day-offset k since a user's first activity,
    * at_risk(k) = users observable at offset k (first_day + k ≤
    * horizon) whose lifetime (last−first) has not ended before k,
    * churned(k) = users whose activity ENDED exactly at offset k and
    * who are not right-censored (last_day < horizon — a user still
    * active at the corpus edge never counts as churn), and
    * hazard_e6 = churned/at_risk. The per-step-ratio form sidesteps
    * the inexact survival product (Kaplan–Meier's Π(1−h) needs
    * floating point; the hazard column IS the exact statistic).
    *
    * Shape at scale: one per-user aggregate, a 1-row broadcast
    * horizon, then each user explodes to its ≤ (horizon − first_day)
    * observable offsets — calendar-bounded (the q286 densify
    * discipline), so rows = users × O(days), linear with a bounded
    * constant, map-side-combinable tallies after. */
  def churnHazard(events: DataFrame, userCol: String,
      tsNanosCol: String): DataFrame = {
    val day = col(tsNanosCol).div_(86400L * 1000000000L)
    val perUser = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol), day.as("day__"))
      .groupBy(col(userCol))
      .agg(min(col("day__")).as("f__"), max(col("day__")).as("l__"))
    val horizon = perUser.agg(max(col("l__")).as("h__"))
    val spans = perUser.crossJoin(broadcast(horizon))
      .select((col("l__") - col("f__")).as("life__"),
        (col("h__") - col("f__")).as("obs__"),
        (col("l__") < col("h__")).as("ended__"))
    val atRisk = spans
      .select(explode(sequence(lit(0L),
        least(col("life__"), col("obs__")))).as("offset"))
      .groupBy(col("offset")).agg(count(lit(1)).as("at_risk"))
    val churned = spans
      .filter(col("ended__"))
      .groupBy(col("life__").as("offset"))
      .agg(count(lit(1)).as("churned"))
    atRisk.join(churned, Seq("offset"), "left")
      .select(col("offset"), col("at_risk"),
        coalesce(col("churned"), lit(0L)).as("churned"),
        graft.functions.ExactRound.ratioScaled(
          coalesce(col("churned"), lit(0L)), col("at_risk"), 6)
          .as("hazard_e6"))
  }

  /** THEIL–SEN robust trend per event type — the median of all
    * pairwise day-slopes of the daily count series (Sen 1968), the
    * outlier-proof twin of [[rollingSlope]]'s OLS: one corrupt day
    * moves OLS, not the pairwise median.
    *
    * Exactness: each pair's slope ships as the e6 quotient
    * `(yj−yi)·1e6 / (dj−di)` TRUNCATED TOWARD ZERO — Spark's integer
    * `div` and DuckDB's integer `//` share exactly that convention
    * on negatives (DuckDB's `//` floors only never: measured, it
    * truncates ints and plain-divides doubles); the median is the
    * lower-median row_number pick over (slope_e6, dy, dx) — a total
    * deterministic order, so engine and oracle select the same pair
    * even where two distinct rationals share a truncated key (the
    * reported statistic is DEFINED on the truncated keys).
    *
    * Shape at scale: the pair join is per-type over DAILY rows —
    * O(D²) pairs where D = the type's distinct-day count, never
    * events²; the median window partitions by type over those bounded
    * pairs. D is bounded by the calendar horizon (10 years ≈ 3,652
    * days ≈ 6.7M pairs/type — one task's work), and `maxDays` makes
    * the bound explicit the way [[CoOccurrence.basketPairs]]'
    * `maxBasketSize` does: any type whose series exceeds it fails
    * loudly (lazy `raise_error` on the load-bearing day column, so
    * Catalyst cannot prune the guard) instead of silently queuing a
    * quadratic blowup — re-aggregate to weeks or raise the knob. */
  def theilSen(events: DataFrame, typeCol: String,
      tsNanosCol: String, maxDays: Int = 4096): DataFrame = {
    require(maxDays > 1, "maxDays must exceed 1")
    val dWin = Window.partitionBy(col("event_type"))
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("n_days__", count(lit(1)).over(dWin))
      .withColumn("day", when(col("n_days__") > maxDays,
        raise_error(concat(lit("theilSen: event_type '"),
          col("event_type").cast("string"),
          lit(s"' exceeds maxDays=$maxDays daily points — the O(D²) " +
            "pair join would blow up; aggregate coarser or raise maxDays"))))
        .otherwise(col("day")))
      .drop("n_days__")
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        (col("b.y") - col("a.y")).as("dy__"),
        (col("b.day") - col("a.day")).as("dx__"))
      .withColumn("slope_e6",
        call_function("div", col("dy__") * 1000000L, col("dx__")))
    val mw = Window.partitionBy(col("event_type"))
      .orderBy(col("slope_e6"), col("dy__"), col("dx__"))
    val cw = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rn__", row_number().over(mw))
      .withColumn("n_pairs", count(lit(1)).over(cw))
      .filter(col("rn__") ===
        graft.functions.TimeFns.floorDiv(col("n_pairs") + 1L, 2L))
      .select(col("event_type"), col("n_pairs"), col("slope_e6"))
  }

  /** KENDALL CONCORDANCE (tau-a) between every pair of event types'
    * daily count series — "do logins and purchases move together
    * day-over-day?" as a RANK statistic: over the days both types were
    * observed, count day pairs where the two series move in the same
    * direction (concordant), opposite (discordant), or tie in either
    * series; tau_a = (nc − nd) / C(D,2). Rank concordance survives the
    * outliers and level shifts that wreck Pearson on count data
    * ([[GroupStats.pearson]]'s caveat), and every quantity here is an
    * exact integer — tau ships as the toward-zero-truncated e6
    * quotient (Spark integral `div` == DuckDB `//` on ints, the
    * [[theilSen]] convention).
    *
    * Shape at scale: the day-pair join is per TYPE-PAIR over daily
    * aggregates — O(T²·D²) with D calendar-bounded and guarded by the
    * same `maxDays` raise_error discipline as [[theilSen]]; never
    * events². */
  def kendallDailyPairs(events: DataFrame, typeCol: String,
      tsNanosCol: String, maxDays: Int = 4096): DataFrame = {
    require(maxDays > 1, "maxDays must exceed 1")
    val dWin = Window.partitionBy(col("t__"))
    val daily = events
      .select(col(typeCol).as("t__"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("t__"), col("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("n_days__", count(lit(1)).over(dWin))
      .withColumn("day", when(col("n_days__") > maxDays,
        raise_error(concat(lit("kendallDailyPairs: event_type '"),
          col("t__").cast("string"),
          lit(s"' exceeds maxDays=$maxDays daily points — the O(D²) " +
            "pair join would blow up; aggregate coarser or raise maxDays"))))
        .otherwise(col("day")))
      .drop("n_days__")
    val aligned = daily.as("a").join(daily.as("b"),
        col("a.day") === col("b.day") && col("a.t__") < col("b.t__"))
      .select(col("a.t__").as("type_a"), col("b.t__").as("type_b"),
        col("a.day").as("day"), col("a.y").as("xa"), col("b.y").as("xb"))
    val dayPairs = aligned.as("i").join(aligned.as("j"),
        col("i.type_a") === col("j.type_a") &&
          col("i.type_b") === col("j.type_b") &&
          col("i.day") < col("j.day"))
      .select(col("i.type_a").as("type_a"), col("i.type_b").as("type_b"),
        ((col("j.xa") - col("i.xa")) * (col("j.xb") - col("i.xb")))
          .as("prod__"))
    dayPairs.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("prod__") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_concordant"),
        sum(when(col("prod__") < 0, 1L).otherwise(0L)).cast("long")
          .as("n_discordant"),
        sum(when(col("prod__") === 0, 1L).otherwise(0L)).cast("long")
          .as("n_ties"))
      .withColumn("tau_a_e6", call_function("div",
        (col("n_concordant") - col("n_discordant")) * 1000000L,
        col("n_pairs")))
  }

  /** DAY-OF-WEEK SEASONAL PROFILE per event type — the classic
    * seasonal-naive baseline: per (type, epoch-day mod 7) the LOWER
    * MEDIAN of the daily counts (the [[theilSen]] row_number pick —
    * a real observed value, deterministic under ties) plus the worst
    * deviation any single day shows against its weekday's median.
    * The profile is what a volume-anomaly monitor alerts against
    * ("Tuesday looks like a Sunday"), and median beats mean here for
    * the same robustness reason Theil–Sen beats OLS.
    *
    * All-integer surface: counts, lower-median counts, |y − median|.
    * Shape at scale: daily aggregate → one bounded window per
    * (type, dow) over ≤ calendar/7 rows → join back + re-aggregate;
    * never events-sized windows. */
  def dowSeasonality(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("dow", pmod(col("day"), lit(7L)))
    val mw = Window.partitionBy(col("event_type"), col("dow"))
      .orderBy(col("y").asc, col("day").asc)
    val cw = Window.partitionBy(col("event_type"), col("dow"))
    val medians = daily
      .withColumn("rn__", row_number().over(mw))
      .withColumn("n_days", count(lit(1)).over(cw))
      .filter(col("rn__") ===
        graft.functions.TimeFns.floorDiv(col("n_days") + 1L, 2L))
      .select(col("event_type"), col("dow"), col("n_days"),
        col("y").as("median_y"))
    daily.join(medians, Seq("event_type", "dow"))
      .groupBy(col("event_type"), col("dow"), col("n_days"),
        col("median_y"))
      .agg(max(abs(col("y") - col("median_y"))).as("max_abs_resid"))
  }

  /** WALD–WOLFOWITZ RUNS TEST on each type's daily count series —
    * "is the series random around its median, or does it trend/
    * oscillate?": days are signed above/below the per-type lower
    * median (ties WITH the median are discarded, the standard
    * treatment), runs = maximal same-sign streaks counted in day
    * order, and the expected run count under randomness ships as the
    * exact rational `1 + 2·n₁·n₂/(n₁+n₂)` at e6. Fewer runs than
    * expected ⇒ trending; more ⇒ oscillating. (The z-score needs a
    * sqrt — the run count vs its exact expectation is the log-free
    * gate surface, the q127 TVD-over-PSI discipline.)
    *
    * Shape at scale: all windows partition by type over DAILY rows —
    * calendar-bounded, never event-bounded. */
  def runsTest(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
    val medw = Window.partitionBy(col("event_type"))
      .orderBy(col("y"), col("day"))
    val cw = Window.partitionBy(col("event_type"))
    val med = daily
      .withColumn("rn__", row_number().over(medw))
      .withColumn("n__", count(lit(1)).over(cw))
      .filter(col("rn__") ===
        graft.functions.TimeFns.floorDiv(col("n__") + 1L, 2L))
      .select(col("event_type"), col("y").as("med__"))
    val signed = daily.join(med, "event_type")
      .filter(col("y") =!= col("med__"))
      .select(col("event_type"), col("day"),
        when(col("y") > col("med__"), 1L).otherwise(-1L).as("s__"))
    val ow = Window.partitionBy(col("event_type")).orderBy(col("day"))
    signed
      .withColumn("brk__",
        when(lag(col("s__"), 1).over(ow).isNull ||
          lag(col("s__"), 1).over(ow) =!= col("s__"), 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(sum(when(col("s__") === 1L, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("s__") === -1L, 1L).otherwise(0L)).as("n_below"),
        sum(col("brk__")).as("runs"))
      .select(col("event_type"), col("n_above"), col("n_below"),
        col("runs"),
        (lit(1000000L) + graft.functions.ExactRound.ratioScaled(
          lit(2L) * col("n_above") * col("n_below"),
          col("n_above") + col("n_below"), 6)).as("expected_runs_e6"))
  }

  /** LINEAR INTERPOLATION over the zero-gap calendar —
    * [[densifyDaily]]'s numeric sibling: observed days carry their
    * count exactly (×1e6); a missing day between two observed
    * anchors carries the exact linear blend
    * `prev + (next − prev)·(d − d_prev)/(d_next − d_prev)` as a
    * truncated e6 integer (integer div ↔ `//`, the q320 convention —
    * counts are non-negative but the SLOPE may not be, so truncation
    * is the shared rule); days before the first or after the last
    * observation stay NULL (no extrapolation — the honest edge).
    *
    * Shape at scale: one daily tally, the q286 calendar densify off
    * the 1-row horizon, two IGNORE NULLS anchor carries (one window
    * each direction) over calendar-bounded partitions. */
  def interpolateDaily(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n__"))
    val horizon = daily.agg(min(col("day")).as("d0__"),
      max(col("day")).as("d1__"))
    val cal = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(horizon))
      .select(col("event_type"),
        explode(sequence(col("d0__"), col("d1__"))).as("day"))
    val wb = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val anchored = cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("pd__",
        last(when(col("n__").isNotNull, col("day")),
          ignoreNulls = true).over(wb))
      .withColumn("pv__",
        last(col("n__"), ignoreNulls = true).over(wb))
      .withColumn("nd__",
        first(when(col("n__").isNotNull, col("day")),
          ignoreNulls = true).over(wf))
      .withColumn("nv__",
        first(col("n__"), ignoreNulls = true).over(wf))
    anchored.select(col("event_type"), col("day"),
      col("n__").isNotNull.as("observed"),
      when(col("n__").isNotNull, col("n__") * 1000000L)
        .otherwise(when(col("pd__").isNotNull && col("nd__").isNotNull,
          col("pv__") * 1000000L + call_function("div",
            (col("nv__") - col("pv__")) * 1000000L *
              (col("day") - col("pd__")),
            col("nd__") - col("pd__"))))
        .as("value_e6"))
  }

  /** DIFFERENCE-IN-DIFFERENCES card — the canonical quasi-experiment
    * readout: users split into a deterministic treatment/control arm
    * (`pmod(user, 2)` — a stand-in for the experiment-assignment
    * column a real pipeline would carry), the horizon split into
    * pre/post at the midpoint day `(d_min + d_max + 1) floordiv 2`,
    * the metric = `convType` events per user per period. One row:
    * per-arm user counts, the four cell means (half-up e6 via
    * [[graft.functions.ExactRound.ratioScaled]] — denominator is the
    * arm's user count, so inactive users count as zeros), and
    * `did_e6 = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)` computed
    * on the already-rounded cell means (documented convention — both
    * engines subtract the same longs).
    *
    * Shape at scale: one distinct over users, one (user, period)
    * pre-aggregate of the conversion events (map-side combinable),
    * one left join user←cells, two tiny aggregates; the horizon is a
    * 1-row broadcast. Nothing is per-event past the first tally. */
  def diffInDiff(events: DataFrame, userCol: String, tsNanosCol: String,
      typeCol: String, convType: String): DataFrame = {
    import graft.functions.ExactRound
    val day = col(tsNanosCol).div_(86400L * 1000000000L)
    val split = events.select(day.as("day__"))
      .agg(graft.functions.TimeFns.floorDiv(
        min(col("day__")) + max(col("day__")) + 1, 2).as("split__"))
    val users = events.select(col(userCol).cast("long").as("u__"))
      .distinct()
      .select(col("u__"), pmod(col("u__"), lit(2L)).as("arm__"))
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).cast("long").as("u__"), day.as("cd__"))
      .crossJoin(broadcast(split))
      .select(col("u__"), (col("cd__") >= col("split__")).as("post__"))
      .groupBy(col("u__"), col("post__")).agg(count(lit(1)).as("n__"))
    val perArm = users.join(conv, Seq("u__"), "left")
      .groupBy(col("u__"), col("arm__"))
      .agg(sum(when(!col("post__"), col("n__"))).as("pre__"),
        sum(when(col("post__"), col("n__"))).as("post2__"))
      .groupBy(col("arm__"))
      .agg(count(lit(1)).as("nu__"),
        sum(coalesce(col("pre__"), lit(0L))).as("spre__"),
        sum(coalesce(col("post2__"), lit(0L))).as("spost__"))
    def cell(arm: Int, c: String) =
      sum(when(col("arm__") === arm, col(c))).cast("long")
    perArm.agg(
        coalesce(cell(1, "nu__"), lit(0L)).as("n_treat"),
        coalesce(cell(0, "nu__"), lit(0L)).as("n_ctrl"),
        coalesce(cell(1, "spre__"), lit(0L)).as("tpre__"),
        coalesce(cell(1, "spost__"), lit(0L)).as("tpost__"),
        coalesce(cell(0, "spre__"), lit(0L)).as("cpre__"),
        coalesce(cell(0, "spost__"), lit(0L)).as("cpost__"))
      .select(col("n_treat"), col("n_ctrl"),
        ExactRound.ratioScaled(col("tpre__"), col("n_treat"), 6)
          .as("treat_pre_e6"),
        ExactRound.ratioScaled(col("tpost__"), col("n_treat"), 6)
          .as("treat_post_e6"),
        ExactRound.ratioScaled(col("cpre__"), col("n_ctrl"), 6)
          .as("ctrl_pre_e6"),
        ExactRound.ratioScaled(col("cpost__"), col("n_ctrl"), 6)
          .as("ctrl_post_e6"))
      .withColumn("did_e6",
        (col("treat_post_e6") - col("treat_pre_e6")) -
          (col("ctrl_post_e6") - col("ctrl_pre_e6")))
  }

  /** ONE-SPLIT CHANGEPOINT (binary segmentation, first step) over each
    * type's daily-count series: the boundary between observed days
    * maximizing the between-segment sum-of-squares
    * `gain = S_L²/n_L + S_R²/n_R − S²/n` (the variance-reduction
    * objective; Scott–Knott / CART's split criterion). Exact integer
    * surface: each term ships as `(S²·10⁶) div n` with DECIMAL(38,0)
    * headroom — a shared truncating convention, so gain_e6 can sit ±1
    * off the rounded real value but is bit-identical across engines;
    * argmax is gain desc, day asc (max(struct) ↔ the oracle's
    * row_number, the house tie rule). `split_day` = last day of the
    * left segment. Types with a single observed day emit nothing (no
    * split exists). Long headroom: S²·10⁶/n_side caps at ~9.2e18 —
    * fine until a single type's total count nears 3e6·√days.
    *
    * Shape at scale: one daily tally (map-side combinable), one
    * cumulative window per type over DAYS (calendar-bounded, not
    * data-bounded), one argmax aggregate. */
  def changepointDaily(events: DataFrame, typeCol: String,
      tsNanosCol: String): DataFrame = {
    val daily = events.select(col(typeCol).as("event_type"),
        col(tsNanosCol).div_(86400L * 1000000000L).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x__"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val all = Window.partitionBy(col("event_type"))
    def term(s: Column, n: Column) = call_function("div",
      s.cast("decimal(38,0)") * s * lit(1000000L),
      n.cast("decimal(38,0)")).cast("long")
    val scored = daily
      .withColumn("cs__", sum(col("x__"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn__", row_number().over(w).cast("long"))
      .withColumn("s__", sum(col("x__")).over(all))
      .withColumn("n__", count(lit(1)).over(all))
      .filter(col("rn__") < col("n__"))
      .select(col("event_type"), col("day"),
        col("rn__").as("n_left"),
        (col("n__") - col("rn__")).as("n_right"),
        (term(col("cs__"), col("rn__")) +
          term(col("s__") - col("cs__"), col("n__") - col("rn__")) -
          term(col("s__"), col("n__"))).as("gain_e6"))
    scored.groupBy(col("event_type"))
      .agg(max(struct(col("gain_e6"), (-col("day")).as("negday__"),
        col("n_left"), col("n_right"))).as("b__"))
      .select(col("event_type"), (-col("b__.negday__")).as("split_day"),
        col("b__.n_left").as("n_left"), col("b__.n_right").as("n_right"),
        col("b__.gain_e6").as("gain_e6"))
  }

  /** True FLOOR division as a Column op (delegates to
    * [[graft.functions.TimeFns.floorDiv]]) — Spark's bare `div`
    * truncates toward zero, which disagrees with the oracle's `//` on
    * pre-1970 timestamps. */
  private implicit class LongDiv(private val c: Column) {
    def div_(d: Long): Column = graft.functions.TimeFns.floorDiv(c, d)
  }
}
