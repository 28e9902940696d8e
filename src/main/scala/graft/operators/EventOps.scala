package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over event streams — the funnel,
  * cohort-retention, and inter-event-gap reports that sit next to a
  * training-data pipeline's activity logs (reference scope: the events
  * topology of `FlinkSkyline.java` ingests exactly this shape of
  * per-user timestamped stream; these are the standard OLAP readouts
  * over it).
  *
  * Everything is INTEGER-exact (microsecond epochs, day indexes via
  * positive floor division) so the DuckDB oracles replay each operator
  * bit-for-bit — no cross-engine timestamp encodings or float time
  * arithmetic anywhere.
  */
object EventOps {

  private val UsPerDay = 86400000000L

  /** Ordered conversion funnel over `steps` event types. A user reaches
    * stage i when an event of type `steps(i-1)` exists STRICTLY after
    * their stage-(i−1) reach time (reach time = earliest such event);
    * stage 1 is the earliest `steps(0)` event. Strict ordering means an
    * equal-timestamp pair does not convert — deterministic, and exactly
    * replayable in SQL.
    *
    * Output: one row per stage — (step, step_name, n_users).
    *
    * Scale shape: one filtered scan of the event table feeds every
    * stage; each stage is a per-user min aggregation (shuffle keyed on
    * the user column, map-side partial min) followed by a user-keyed
    * equi-join against the previous stage's one-row-per-user frontier.
    * State per stage is |converted users| × two longs — never event
    * rows — and each stage's frontier is cached since both the stage
    * count and the next stage consume it. Nothing here is quadratic in
    * events; at 100 TB the event scan dominates and it happens once.
    */
  def funnel(events: DataFrame, userCol: String, usCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // One narrow projection of only the funnel-relevant events, shared
    // by every stage (persisted: |steps| consumers).
    val ev = graft.core.Caches.persistTracked(
      events.select(col(userCol).as("u"), col(usCol).cast("long").as("us"),
          col(typeCol).as("et"))
        .filter(col("et").isin(steps: _*)))
    var frontier = graft.core.Caches.persistTracked(
      ev.filter(col("et") === steps.head)
        .groupBy("u").agg(min(col("us")).as("t")))
    var out = frontier.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("step"), lit(steps.head).as("step_name"),
        col("n_users"))
    var i = 1
    while (i < steps.length) {
      val prev = frontier.select(col("u"), col("t").as("t_prev"))
      frontier = graft.core.Caches.persistTracked(
        ev.filter(col("et") === steps(i))
          .join(prev, "u")
          .filter(col("us") > col("t_prev"))
          .groupBy("u").agg(min(col("us")).as("t")))
      out = out.unionAll(
        frontier.agg(count(lit(1)).as("n_users"))
          .select(lit((i + 1).toLong).as("step"),
            lit(steps(i)).as("step_name"), col("n_users")))
      i += 1
    }
    out
  }

  /** Per-user reach times of every funnel stage, for users who complete
    * ALL stages — the [[funnel]] frontier chain with the per-stage times
    * kept instead of counted. Output: (u, t1 … t|steps|). Same state
    * bounds as [[funnel]]; the k-way assembly joins one-row-per-user
    * frontiers on the user key. */
  def funnelReachTimes(events: DataFrame, userCol: String, usCol: String,
                       typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = graft.core.Caches.persistTracked(
      events.select(col(userCol).as("u"), col(usCol).cast("long").as("us"),
          col(typeCol).as("et"))
        .filter(col("et").isin(steps: _*)))
    var frontier = graft.core.Caches.persistTracked(
      ev.filter(col("et") === steps.head)
        .groupBy("u").agg(min(col("us")).as("t1")))
    var acc = frontier
    var i = 1
    while (i < steps.length) {
      val prev = frontier.select(col("u"), col(s"t$i").as("t_prev"))
      frontier = graft.core.Caches.persistTracked(
        ev.filter(col("et") === steps(i))
          .join(prev, "u")
          .filter(col("us") > col("t_prev"))
          .groupBy("u").agg(min(col("us")).as(s"t${i + 1}")))
      acc = acc.join(frontier.select(col("u"), col(s"t${i + 1}")), "u")
      i += 1
    }
    acc
  }

  /** Cohort retention: cohort = the user's first active day (us div
    * day), activity = the distinct (user, day) set; one row per
    * (cohort_day, day_off ≥ 0) with the number of cohort users active
    * that many days after their first day. `day_off = 0` rows recover
    * cohort sizes, so retention ratios are a client-side division.
    *
    * Scale shape: a distinct over (user, day) — the event table's only
    * shuffle, with map-side partial dedup — then a per-user min (same
    * key, so AQE coalesces into the existing partitioning), a user-keyed
    * join of the day set against the one-row-per-user cohort table, and
    * a (cohort, offset)-keyed count whose cardinality is bounded by
    * days², independent of user count. No event-row state survives the
    * first distinct.
    */
  def retention(events: DataFrame, userCol: String, usCol: String): DataFrame = {
    val days = graft.core.Caches.persistTracked(
      events.select(col(userCol).as("u"),
          expr(s"CAST(${usCol} AS BIGINT) div $UsPerDay").as("day"))
        .distinct())
    val cohort = days.groupBy("u").agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "u")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_off"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Inter-event gap statistics per group: orders the per-key event
    * sequence (day index, id tiebreak), takes consecutive-day gaps via
    * `lag`, and aggregates count / sum / max of the gaps per group
    * column from a dimension join — the purchase-cadence report.
    *
    * Scale shape: one window shuffle keyed on the entity column (the
    * sort is per-key, sized by that key's row count — no global sort),
    * a broadcastable dimension join (AQE decides; the dim side is
    * |entities| rows), and a low-cardinality group aggregate. Skewed
    * entities would bound the window task, but an entity's own event
    * count is the natural ceiling here, not corpus size.
    */
  def gapStats(fact: DataFrame, keyCol: String, dayCol: Column,
               ordCol: String, dim: DataFrame, dimKeyCol: String,
               groupCol: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("day"), col(ordCol))
    val gaps = fact
      .select(col(keyCol).as("k"), dayCol.cast("long").as("day"), col(ordCol))
      .withColumn("gap", col("day") - lag("day", 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.join(dim.select(col(dimKeyCol).as("k"), col(groupCol).as("grp")), "k")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("sum_gap_days"),
        max("gap").as("max_gap_days"))
  }

  /** Daily activity series with GAP FILLING: per group, one row for EVERY
    * calendar day from the group's first to its last active day,
    * zero-filled where no events landed — the resampling step any
    * time-series readout over sparse activity (rates, moving averages,
    * anomaly baselines) needs first, because "no row" and "zero" are
    * different facts and window functions only see rows.
    *
    * Scale shape: events aggregate FIRST (one partial-combined shuffle to
    * (group, active-day) rows); the fill explodes one `sequence(d0, d1)`
    * per GROUP, so the output and the join back are sized by
    * groups × span-days — never event rows. A group whose span is huge
    * relative to its activity fans out proportionally; that is the
    * output's own size, not an intermediate blow-up. Output:
    * (groupCols…, day, n_events). */
  def dailyFill(events: DataFrame, groupCols: Seq[String],
                usCol: String): DataFrame = {
    require(groupCols.nonEmpty, "dailyFill needs at least one group column")
    val gs = groupCols.map(col)
    val days = events
      .select(gs :+ expr(s"$usCol div $UsPerDay").as("day"): _*)
      .groupBy(groupCols.head, (groupCols.tail :+ "day"): _*)
      .agg(count(lit(1)).as("n"))
    val spans = days.groupBy(groupCols.head, groupCols.tail: _*)
      .agg(min("day").as("d0"), max("day").as("d1"))
    spans
      .select(gs :+ explode(sequence(col("d0"), col("d1"))).as("day"): _*)
      .join(days, groupCols :+ "day", "left")
      .select(gs :+ col("day") :+
        coalesce(col("n"), lit(0L)).as("n_events"): _*)
  }

  /** Rolling `k`-day sum over a GAP-FILLED daily series ([[dailyFill]]
    * output — the fill is what makes a ROWS frame mean "days"; on a
    * sparse series ROWS BETWEEN k−1 PRECEDING would silently span months).
    * The moving-baseline readout under rate monitors and spike detectors;
    * integer sum, engine-exact.
    *
    * Scale shape: one window pass partitioned by group, ordered by day —
    * partitions are bounded by each group's span, the sort rides the
    * fill's own (group, day) shuffle when composed directly. */
  def rollingDailySum(daily: DataFrame, groupCols: Seq[String],
                      dayCol: String, valCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty && k >= 1, s"bad groups/k: $groupCols/$k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(dayCol)).rowsBetween(-(k - 1), 0)
    daily.withColumn(s"sum_${k}d", sum(col(valCol)).over(w))
  }

  /** Exact integer EWMA over a gap-filled daily series: the truncated
    * exponentially-weighted moving average with decay 7/8, window `w` days,
    * held as the SCALED NUMERATOR so there is no floating point anywhere —
    *
    *   ewma_num(d) = Σ_{j=0}^{w−1} x(d−j) · 7ʲ · 8^{w−1−j}
    *
    * (the true EWMA is ewma_num / 8ʷ; with w = 14 the dropped tail carries
    * weight (7/8)¹⁴ < 16%, and the skyline of weights stays < 2⁴², so any
    * realistic daily count fits BIGINT). Days with fewer than w
    * predecessors use the terms that exist — deterministic truncation at
    * the span start, which a SQL oracle replays with the same LAG chain.
    *
    * Scale shape: the w LAG terms all ride ONE window pass (one shuffle
    * keyed on the group, sorted by day) — a w-way self-join would pay w
    * shuffles for the same answer. */
  def ewmaDaily(daily: DataFrame, groupCols: Seq[String],
                dayCol: String, valCol: String, w: Int = 14): DataFrame = {
    require(groupCols.nonEmpty && w >= 1 && w <= 20, s"bad groups/w: $groupCols/$w")
    val win = Window.partitionBy(groupCols.map(col): _*).orderBy(col(dayCol))
    val terms = (0 until w).map { j =>
      val weight = BigInt(7).pow(j) * BigInt(8).pow(w - 1 - j)
      lag(col(valCol), j, 0).over(win) * lit(weight.toLong)
    }
    daily.withColumn("ewma_num", terms.reduce(_ + _))
  }

  /** Integer z-score spike detector over a gap-filled daily series: flags
    * day d when its value exceeds the trailing `w`-day baseline (the w
    * days BEFORE d, excluding d itself) by more than 3 standard
    * deviations. With S = Σ baseline, Q = Σ baseline², the test
    *
    *   (x − μ)² > 9σ²  ⇔  (w·x − S)² > 9·(w·Q − S²)
    *
    * cross-multiplies to pure integers (both sides exact in BIGINT for
    * daily counts), so Spark and a SQL oracle agree bit-for-bit — no
    * floating-point mean/stddev anywhere. Only UPWARD spikes flag
    * (x·w > S), and only days with a full w-day history are judged
    * (is_spike is null-safe 0 otherwise).
    *
    * Scale shape: S, Q, and the history count are three aggregates over
    * ONE window frame — one shuffle keyed on the group. */
  def spikeDays(daily: DataFrame, groupCols: Seq[String],
                dayCol: String, valCol: String, w: Int = 7): DataFrame = {
    require(groupCols.nonEmpty && w >= 2, s"bad groups/w: $groupCols/$w")
    val win = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(dayCol)).rowsBetween(-w, -1)
    val x = col(valCol)
    daily
      .withColumn("bl_n", count(x).over(win))
      .withColumn("bl_sum", coalesce(sum(x).over(win), lit(0L)))
      .withColumn("bl_sumsq", coalesce(sum(x * x).over(win), lit(0L)))
      .withColumn("is_spike",
        when(col("bl_n") === w &&
          x * w > col("bl_sum") &&
          (x * w - col("bl_sum")) * (x * w - col("bl_sum")) >
            lit(9L) * (col("bl_sumsq") * w - col("bl_sum") * col("bl_sum")),
          1L).otherwise(0L))
  }
}
