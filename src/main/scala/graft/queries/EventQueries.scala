package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Event-log analytics the reference's users run as chained streaming
  * jobs (mapper extracts (user, type, ts); reducer walks each user's
  * ordered history): funnel conversion, cohort retention, and a
  * salt-keyed join for skewed keys. All three are single-exchange
  * window/agg plans here — the "ordered walk per user" reduce becomes a
  * user-partitioned window, and every aggregate is partial-aggregatable.
  */
object EventQueries {

  /** Step-order funnel (view → click → purchase) per user: the classic
    * sessionized conversion query. Each step's timestamp is a
    * conditional window-min over the user's history that must be
    * strictly after the previous step — three window stages over ONE
    * user_id exchange (same partitioning ⇒ Catalyst reuses the sort and
    * shuffle), then a per-user collapse and a single global row.
    *
    * All outputs are exact integers (counts + a summed seconds lag), so
    * there is no float-parity surface at all.
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val w = Window.partitionBy(col("user_id"))
    val staged = e
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("es"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("es") > col("t_view"),
          col("es"))).over(w))
      .withColumn("t_buy",
        min(when(col("event_type") === "purchase" && col("es") > col("t_click"),
          col("es"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"), max(col("t_click")).as("t_click"),
        max(col("t_buy")).as("t_buy"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_view")).as("u_view"),
        count(col("t_click")).as("u_click"),
        count(col("t_buy")).as("u_purchase"),
        sum(col("t_buy") - col("t_view")).as("sum_funnel_s"))
  }

  val qFunnelSql: String =
    """SELECT count(*) AS n_users,
      |  count(t_view) AS u_view,
      |  count(t_click) AS u_click,
      |  count(t_buy) AS u_purchase,
      |  sum(t_buy - t_view)::BIGINT AS sum_funnel_s
      |FROM (
      |  SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
      |    max(t_buy) AS t_buy
      |  FROM (
      |    SELECT user_id, t_view, t_click,
      |      min(CASE WHEN event_type = 'purchase' AND es > t_click
      |               THEN es END) OVER (PARTITION BY user_id) AS t_buy
      |    FROM (
      |      SELECT user_id, event_type, es, t_view,
      |        min(CASE WHEN event_type = 'click' AND es > t_view
      |                 THEN es END) OVER (PARTITION BY user_id) AS t_click
      |      FROM (
      |        SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es,
      |          min(CASE WHEN event_type = 'view'
      |                   THEN floor(epoch(ts))::BIGINT END)
      |            OVER (PARTITION BY user_id) AS t_view
      |        FROM events)))
      |  GROUP BY user_id)""".stripMargin

  /** Cohort retention: users grouped by first-seen week, activity
    * counted per week offset — the (cohort, age) retention triangle.
    * First-seen is a window-min per user (one exchange), the distinct
    * (cohort, offset, user) collapse shuffles on exactly those keys,
    * and the final count partial-aggregates. `date_trunc('week')` is
    * Monday-start in both engines.
    */
  def qCohort(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val withCohort = e.withColumn("cohort_d",
      min(col("d")).over(Window.partitionBy(col("user_id"))))
    withCohort
      .select(
        to_date(date_trunc("week", col("cohort_d"))).as("cohort_week"),
        floor(datediff(col("d"), col("cohort_d")) / 7).cast("long")
          .as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val qCohortSql: String =
    """SELECT cohort_week, week_offset, count(*) AS n_users
      |FROM (
      |  SELECT DISTINCT
      |    date_trunc('week', cohort_d) AS cohort_week,
      |    (date_diff('day', cohort_d, d) // 7)::BIGINT AS week_offset,
      |    user_id
      |  FROM (
      |    SELECT user_id, ts::DATE AS d,
      |      min(ts::DATE) OVER (PARTITION BY user_id) AS cohort_d
      |    FROM events))
      |GROUP BY cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Salt factor for the skewed join below. */
  val SkewSalts = 8

  /** Skew-immune fact↔dim equi-join. `event_type` has ~5 distinct
    * values over the whole fact table — a plain shuffle join sends each
    * type to ONE reducer (5 working partitions at any cluster size).
    * The salted form replicates the dim side `SkewSalts`× (explode —
    * dims are tiny, replication is free) and splits the fact side by a
    * uniform hash-salt, so the join key (event_type, salt) fans each
    * hot key across `SkewSalts` partitions. The result is byte-identical
    * to the unsalted join — the oracle IS the plain join.
    *
    * The dim here is derived from the fact table itself (per-type
    * earliest event id) to stay self-contained; `merge` hint keeps the
    * demo honest (a broadcast would hide the skew problem entirely —
    * and broadcasting IS the right fix when the dim fits; salting is
    * for when it doesn't).
    */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = e.groupBy(col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"))
      .withColumn("salt", explode(sequence(lit(0), lit(SkewSalts - 1))))
    val fact = e.withColumn("salt",
      pmod(xxhash64(col("event_id")), lit(SkewSalts)).cast("int"))
    fact.join(dim.hint("merge"), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("first_event_id")).as("first_event_id"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val qSkewJoinSql: String =
    """SELECT e.event_type, count(*) AS n_events,
      |  min(d.first_event_id) AS first_event_id,
      |  round(sum(e.value), 2) AS sum_value
      |FROM events e
      |JOIN (SELECT event_type, min(event_id) AS first_event_id
      |      FROM events GROUP BY event_type) d
      |  ON e.event_type = d.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  /** Event-type transition matrix (the first-order Markov view of user
    * behavior): consecutive event pairs per user — one `lead` window
    * over the (user_id)-partitioned, (ts, event_id)-ordered history
    * (ties on ts broken by event_id, so the successor is total-order
    * deterministic) — then a partial-aggregatable count per
    * (from, to) and each row's share of its from-type's outgoing mass.
    * Same single-exchange shape as q_funnel; the share window runs on
    * the ~|types|² aggregate, not the fact table. floor-form rounding
    * for the share (the round() half-case differs across engines).
    */
  def qTransitions(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wFrom = Window.partitionBy(col("from_type"))
    e.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("share",
        floor(col("n_transitions") / sum(col("n_transitions")).over(wFrom)
          * 10000 + 0.5).cast("double") / 10000)
      .orderBy(col("from_type"), col("to_type"))
  }

  val qTransitionsSql: String =
    """SELECT from_type, to_type, n_transitions,
      |  floor(n_transitions /
      |        sum(n_transitions) OVER (PARTITION BY from_type)
      |        * 10000 + 0.5) / 10000 AS share
      |FROM (
      |  SELECT event_type AS from_type, to_type,
      |    count(*) AS n_transitions
      |  FROM (
      |    SELECT user_id, event_type,
      |      lead(event_type) OVER (PARTITION BY user_id
      |                             ORDER BY ts, event_id) AS to_type
      |    FROM events)
      |  WHERE to_type IS NOT NULL
      |  GROUP BY from_type, to_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** SCD2 / change-data-capture history build: collapse each user's
    * event stream into validity intervals of UNCHANGED event_type —
    * the classic gaps-and-islands run-length encoding that turns an
    * event log into a slowly-changing-dimension table (valid_from /
    * valid_to, open interval on the current state). Three stages, all
    * riding ONE user_id-partitioned sort order: lag() flags run starts,
    * a running sum numbers the runs, and a partial-aggregatable groupBy
    * (user, run) collapses them; the final valid_to = next run's
    * valid_from via one more lead() on the already-collapsed (small)
    * interval table. Ties on ts broken by event_id so run membership is
    * total-order deterministic; all outputs are exact integers.
    */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("es"))
    // order on the FULL-precision ts (es truncates to seconds — ordering
    // on it could disagree with the oracle when two events share a second)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runs = e
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull
          || lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs.groupBy(col("user_id"), col("run_id"))
      .agg(max(col("event_type")).as("state"),
        min(col("es")).as("valid_from_s"),
        count(lit(1)).as("n_events"))
    intervals
      .withColumn("valid_to_s",
        lead(col("valid_from_s"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("run_id"))))
      .select(col("user_id"), col("run_id"), col("state"),
        col("valid_from_s"), col("valid_to_s"), col("n_events"))
      .orderBy(col("user_id"), col("run_id"))
  }

  val qScd2Sql: String =
    """SELECT user_id, run_id, state, valid_from_s,
      |  lead(valid_from_s) OVER (PARTITION BY user_id ORDER BY run_id)
      |    AS valid_to_s,
      |  n_events
      |FROM (
      |  SELECT user_id, run_id, max(event_type) AS state,
      |    min(es) AS valid_from_s, count(*) AS n_events
      |  FROM (
      |    SELECT user_id, event_type, es,
      |      sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING)::BIGINT AS run_id
      |    FROM (
      |      SELECT user_id, event_type, event_id, ts,
      |        floor(epoch(ts))::BIGINT AS es,
      |        CASE WHEN lag(event_type) OVER (PARTITION BY user_id
      |                                        ORDER BY ts, event_id) IS NULL
      |               OR lag(event_type) OVER (PARTITION BY user_id
      |                                        ORDER BY ts, event_id)
      |                  <> event_type
      |             THEN 1 ELSE 0 END AS chg
      |      FROM events))
      |  GROUP BY user_id, run_id)
      |ORDER BY user_id, run_id""".stripMargin

  /** CDC MERGE-apply with tombstones: split the event log at its time
    * midpoint into a BASE snapshot (latest state per user before the
    * split — what a materialized table holds) and a CHANGE stream
    * (everything after), then apply the changes latest-wins with
    * 'error' events as DELETE tombstones — the lakehouse MERGE INTO /
    * CDC-compaction semantics (keep / update / insert / delete all
    * exercised). Both halves are one WindowGroupLimit latest-per-key
    * over the SAME user_id exchange shape as stream_latest; the apply
    * itself is a single full outer join on user_id. The split point
    * rides IN-PLAN as a one-row broadcast aggregate joined into both
    * halves (the q_basket move, Relational.scala's N) — no driver
    * collect, no separate plan-build job re-scanning the corpus.
    */
  def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts"), col("event_id"))
    val mid = e
      .agg(min(unix_timestamp(col("ts"))).as("lo"),
        max(unix_timestamp(col("ts"))).as("hi"))
      .select(expr("lo + (hi - lo) div 2").as("graft_mid"))
    val eb = e.crossJoin(broadcast(mid))
    def latest(df: DataFrame): DataFrame = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"))
    val base = latest(eb.filter(unix_timestamp(col("ts")) <= col("graft_mid")))
      .select(col("user_id"), col("value").as("base_value"))
    val change = latest(eb.filter(unix_timestamp(col("ts")) > col("graft_mid")))
      .select(col("user_id"), col("event_type").as("chg_type"),
        col("value").as("chg_value"))
    base.join(change, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("chg_type").isNull, "keep")
          .when(col("chg_type") === "error", "delete")
          .when(col("base_value").isNull, "insert")
          .otherwise("update").as("action"),
        when(col("chg_type") === "error", lit(null).cast("double"))
          .otherwise(round(coalesce(col("chg_value"), col("base_value")), 2))
          .as("final_value"))
      .orderBy(col("user_id"))
  }

  val qCdcApplySql: String =
    """WITH b AS (
      |  SELECT lo + (hi - lo) // 2 AS mid FROM (
      |    SELECT min(floor(epoch(ts))::BIGINT) AS lo,
      |      max(floor(epoch(ts))::BIGINT) AS hi FROM events)),
      |base AS (
      |  SELECT user_id, value AS base_value FROM (
      |    SELECT user_id, value,
      |      row_number() OVER (PARTITION BY user_id
      |                         ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE floor(epoch(ts))::BIGINT <= (SELECT mid FROM b))
      |  WHERE rn = 1),
      |chg AS (
      |  SELECT user_id, event_type AS chg_type, value AS chg_value FROM (
      |    SELECT user_id, event_type, value,
      |      row_number() OVER (PARTITION BY user_id
      |                         ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE floor(epoch(ts))::BIGINT > (SELECT mid FROM b))
      |  WHERE rn = 1)
      |SELECT coalesce(base.user_id, chg.user_id) AS user_id,
      |  CASE WHEN chg.chg_type IS NULL THEN 'keep'
      |       WHEN chg.chg_type = 'error' THEN 'delete'
      |       WHEN base.user_id IS NULL THEN 'insert'
      |       ELSE 'update' END AS action,
      |  CASE WHEN chg.chg_type = 'error' THEN NULL
      |       ELSE round(coalesce(chg.chg_value, base.base_value), 2)
      |       END AS final_value
      |FROM base FULL OUTER JOIN chg ON base.user_id = chg.user_id
      |ORDER BY user_id""".stripMargin

  /** Batch gap-based sessionization — the batch twin of
    * stream_sessionize (and of the reference's "reducer walks each
    * user's ordered history" jobs): a session breaks when the gap to
    * the previous event exceeds 8 h. The classic two-window plan: a
    * lag() marks the breaks, a running sum() numbers the sessions —
    * both windows share ONE (user_id)-partitioned sort, so Catalyst
    * plans a single exchange + a single sort for the whole derivation,
    * then the per-session rollup reuses the same hash partitioning.
    * Scale: the state per user is its event list within one partition
    * (no cross-partition walk); timestamps are floored to whole
    * seconds so the gap compare and every output are exact integers —
    * the only double (sum(value)) is rounded to cents.
    */
  private val SessionGapS = 28800L

  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_timestamp(col("ts")).as("es"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val prev = lag(col("es"), 1).over(w)
    val marked = e.withColumn("brk",
      when(prev.isNull || col("es") - prev > SessionGapS, 1L).otherwise(0L))
    marked
      .withColumn("session_id", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("es")).as("start_s"), max(col("es")).as("end_s"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val qSessionizeSql: String =
    s"""SELECT user_id, session_id, min(es) AS start_s, max(es) AS end_s,
       |  count(*) AS n_events, round(sum(value), 2) AS sum_value
       |FROM (
       |  SELECT user_id, es, value,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY es, event_id
       |                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
       |  FROM (
       |    SELECT user_id, event_id, value, es,
       |      CASE WHEN lag(es) OVER (PARTITION BY user_id
       |                              ORDER BY es, event_id) IS NULL
       |             OR es - lag(es) OVER (PARTITION BY user_id
       |                                   ORDER BY es, event_id)
       |                > $SessionGapS
       |           THEN 1 ELSE 0 END AS brk
       |    FROM (SELECT user_id, event_id, value,
       |            floor(epoch(ts))::BIGINT AS es FROM events)))
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** Time-series resampling with gap fill: each user's sparse event
    * history becomes a dense DAILY grid from their first to their last
    * event, missing days forward-filled with the last observed value
    * (LOCF — the standard feature-store/training-matrix densification).
    *
    * Plan: per-user bounds (one partial-agg groupBy), `sequence()` +
    * explode to the day grid (map-side fan-out, no shuffle — the grid
    * never exceeds span/day rows per user), left join the per-day
    * latest-value rollup, then ONE user-partitioned window does the
    * forward fill via last(ignoreNulls). The fill and the day rollup
    * key on user_id, so Catalyst reuses a single exchange for join +
    * window. Values are PICKED (latest event of the day by ts,
    * event_id), never summed — no float-order surface at all.
    */
  def qResample(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_id"), col("value"),
        floor(unix_timestamp(col("ts")) / 86400).as("day"),
        col("ts"))
    val daily = e
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .groupBy(col("user_id"), col("day"))
      .agg(max(when(col("rn") === 1, col("value"))).as("day_value"),
        count(lit(1)).as("n_events"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("day_value"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled_value"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("day"))
  }

  val qResampleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, value,
      |    floor(epoch(ts) / 86400)::BIGINT AS day, ts
      |  FROM events),
      |daily AS (
      |  SELECT user_id, day,
      |    max(CASE WHEN rn = 1 THEN value END) AS day_value,
      |    count(*) AS n_events
      |  FROM (
      |    SELECT e.*, row_number() OVER (PARTITION BY user_id, day
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM e)
      |  GROUP BY user_id, day),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(d0, d1)) AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
      |        FROM e GROUP BY user_id))
      |SELECT g.user_id, g.day,
      |  last_value(daily.day_value IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.day
      |    ROWS UNBOUNDED PRECEDING) AS filled_value,
      |  coalesce(daily.n_events, 0) AS n_events
      |FROM grid g LEFT JOIN daily
      |  ON daily.user_id = g.user_id AND daily.day = g.day
      |ORDER BY g.user_id, g.day""".stripMargin

  /** Path analysis: each user's first-8-event journey as an ordered
    * `a>b>c` string, then the frequency table of journeys — the "what
    * do users actually do" query (and the q_transitions aggregate's
    * sequence-level sibling). Order inside collect_list is NOT
    * guaranteed by Spark, so the journey is assembled deterministically:
    * rank each user's events (one window whose rn ≤ 8 compiles to
    * WindowGroupLimit — tasks keep 8 rows per user BEFORE the
    * exchange), collect (rn, type) structs, array_sort by the unique
    * rn, then join. The journey rollup is a uniform-key groupBy.
    */
  private val PathLen = 8

  def qPaths(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PathLen)
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  val qPathsSql: String =
    s"""SELECT path, count(*) AS n_users FROM (
       |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
       |  FROM (
       |    SELECT user_id, event_type,
       |      row_number() OVER (PARTITION BY user_id
       |                         ORDER BY ts, event_id) AS rn
       |    FROM events)
       |  WHERE rn <= $PathLen
       |  GROUP BY user_id)
       |GROUP BY path
       |ORDER BY n_users DESC, path""".stripMargin

  /** Per-user linear trend (simple OLS): slope of event value over
    * time from the four classic sufficient statistics (n, Σx, Σy,
    * Σxy, Σx²) — ONE partial-aggregatable groupBy, closed-form slope,
    * no iteration. Cross-engine exactness is engineered: x is the
    * integer day, y is integer CENTS (round(value·100)), so every
    * aggregate is exact integer arithmetic and only the final
    * slope/intercept division happens in double — identical operand
    * bits ⇒ identical quotient bits in both engines, rounded to 6.
    */
  def qTrend(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events.select(col("user_id"),
      floor(unix_timestamp(col("ts")) / 86400).as("x"),
      round(col("value") * 100).cast("long").as("y"))
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") * col("sxx") =!= col("sx") * col("sx")) // degenerate x
      .select(col("user_id"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope_cents_per_day"))
      .orderBy(col("user_id"))
  }

  val qTrendSql: String =
    """SELECT user_id, n,
      |  round((n * sxy - sx * sy)::DOUBLE /
      |        (n * sxx - sx * sx)::DOUBLE, 6) AS slope_cents_per_day
      |FROM (
      |  SELECT user_id, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM (
      |    SELECT user_id, floor(epoch(ts) / 86400)::BIGINT AS x,
      |      round(value * 100)::BIGINT AS y
      |    FROM events)
      |  GROUP BY user_id)
      |WHERE n * sxx <> sx * sx
      |ORDER BY user_id""".stripMargin

  /** Rolling 7-day active users (WAU) per day — WITHOUT a
    * distinct-per-window: the naive spelling re-counts distinct users
    * for every window (O(days·users) distinct state, the query that
    * melts dashboards at scale). The scalable plan is interval
    * coverage: (a) distinct (user, active-day); (b) per user, merge
    * days ≤ 6 apart into ISLANDS (lag + running-sum, one user_id
    * exchange) — each island covers window-ends [first, last+6]
    * exactly; (c) every island becomes +1/−1 boundary deltas; (d) one
    * running sum over the DAY-level delta table yields WAU for every
    * day. The only global window runs over calendar-bounded day
    * cardinality, not data. The DuckDB oracle deliberately uses the
    * NAIVE count-distinct-per-window spelling — the hash match proves
    * the interval algebra, not a shared implementation.
    */
  private val WauWindow = 7L

  def qWau(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables(s, dir).events
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).as("day"))
      .distinct()
    val b = ud.agg(min(col("day")), max(col("day"))).head()
    val (d0, d1) = (b.getLong(0), b.getLong(1))
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = ud
      .withColumn("brk", when(lag(col("day"), 1).over(wUser).isNull ||
        col("day") - lag(col("day"), 1).over(wUser) > WauWindow - 1, 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("day")).as("cov_from"),
        (max(col("day")) + (WauWindow - 1)).as("cov_to"))
    val deltas = islands.select(col("cov_from").as("d"), lit(1L).as("delta"))
      .union(islands.select((col("cov_to") + 1).as("d"), lit(-1L).as("delta")))
      .groupBy(col("d")).agg(sum(col("delta")).as("delta"))
    val grid = s.range(d0, d1 + 1).select(col("id").as("d"))
    grid.join(deltas, Seq("d"), "left")
      .withColumn("wau", sum(coalesce(col("delta"), lit(0L))).over(
        Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("d"), col("wau"))
      .orderBy(col("d"))
  }

  val qWauSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id,
       |    floor(epoch(ts) / 86400)::BIGINT AS day FROM events),
       |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
       |grid AS (
       |  SELECT unnest(generate_series((SELECT d0 FROM b),
       |                                (SELECT d1 FROM b))) AS d)
       |SELECT d, count(DISTINCT ud.user_id) AS wau
       |FROM grid LEFT JOIN ud ON ud.day BETWEEN d - ${WauWindow - 1} AND d
       |GROUP BY d
       |ORDER BY d""".stripMargin

  /** Sequence-pattern matching over each user's FULL ordered history —
    * the MATCH_RECOGNIZE shape: count conversions
    * view →(no error)→ click →(no error)→ purchase, non-overlapping.
    * Each event becomes one char; the journey string is assembled
    * deterministically (struct array_sort on (ts, event_id) — no
    * window needed, one groupBy); the state machine is the LAZY regex
    * `v[^e]*?c[^e]*?p`. Lazy matters: it ends every match at the
    * EARLIEST completing purchase then resets (the funnel-count
    * semantics, identical leftmost-shortest behavior in Java regex and
    * RE2) — a greedy spelling would swallow later conversions and the
    * two engines could legally disagree. Per-user state is the
    * journey string: bounded by events-per-user, the same shuffle
    * shape as every per-user rollup here.
    */
  def qSequenceMatch(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events.select(col("user_id"),
      unix_timestamp(col("ts")).as("es"), col("event_id"),
      when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "error", "e")
        .otherwise("s").as("ch"))
    e.groupBy(col("user_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("es"), col("event_id"),
          col("ch")))), x => x.getField("ch")), "").as("journey"))
      .select(col("user_id"),
        regexp_count(col("journey"), lit("v[^e]*?c[^e]*?p"))
          .as("n_conversions"),
        length(col("journey")).as("n_events"))
      .orderBy(col("user_id"))
  }

  val qSequenceMatchSql: String =
    """SELECT user_id,
      |  len(regexp_extract_all(journey, 'v[^e]*?c[^e]*?p'))
      |    AS n_conversions,
      |  length(journey) AS n_events
      |FROM (
      |  SELECT user_id, string_agg(ch, '' ORDER BY es, event_id) AS journey
      |  FROM (
      |    SELECT user_id, floor(epoch(ts))::BIGINT AS es, event_id,
      |      CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |        WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
      |        ELSE 's' END AS ch
      |    FROM events)
      |  GROUP BY user_id)
      |ORDER BY user_id""".stripMargin

  /** Last-touch marketing attribution: every purchase is credited to
    * the MOST RECENT prior click by the same user within a 7-day
    * lookback, keyed by the click's campaign (the `k` prop, folded to
    * 10 campaigns); purchases with no qualifying click land in the
    * `-1` unattributed bucket. The reference's users run this as a
    * mapper emitting (user, ts, kind) and a reducer walking each
    * user's ordered history carrying the last click — here the carry
    * is `last(_, ignoreNulls)` over ONE user_id exchange ordered by
    * the unique (es, event_id) key (the q_asof_join / q_resample LOCF
    * shape), and the rollup is a campaign-key partial aggregate.
    * Revenue stays in integer cents end-to-end, so every output is
    * exact. The campaign id is parsed with the same regex both
    * engines run (no JSON extension dependence either side).
    */
  private val AttrLookbackS = 7L * 86400L

  /** The click/purchase projection under q_attribution, factored out so
    * the streaming twin's parity spec consumes the IDENTICAL parsing
    * (campaign regex, cents rounding, epoch truncation).
    */
  def attributionEvents(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"),
        when(col("event_type") === "click",
          pmod(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
            .cast("long"), lit(10L))).as("campaign"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).as("cents"))

  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = attributionEvents(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("es"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = e
      .withColumn("last_click_es",
        last(when(col("event_type") === "click", col("es")),
          ignoreNulls = true).over(w))
      .withColumn("last_campaign",
        last(when(col("event_type") === "click", col("campaign")),
          ignoreNulls = true).over(w))
    carried.filter(col("event_type") === "purchase")
      .select(
        when(col("last_click_es").isNotNull &&
          col("es") - col("last_click_es") <= AttrLookbackS,
          col("last_campaign")).otherwise(lit(-1L)).as("campaign"),
        col("cents"))
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("cents")).as("revenue_cents"))
      .orderBy(col("campaign"))
  }

  val qAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type,
       |    floor(epoch(ts))::BIGINT AS es,
       |    CASE WHEN event_type = 'click' THEN
       |      regexp_extract(props, '"k":\\s*(\\d+)', 1)::BIGINT % 10 END
       |      AS campaign,
       |    CASE WHEN event_type = 'purchase' THEN
       |      round(value * 100)::BIGINT END AS cents
       |  FROM events
       |  WHERE event_type IN ('click', 'purchase')),
       |carried AS (
       |  SELECT e.*,
       |    last_value(CASE WHEN event_type = 'click' THEN es END
       |               IGNORE NULLS) OVER w AS last_click_es,
       |    last_value(CASE WHEN event_type = 'click' THEN campaign END
       |               IGNORE NULLS) OVER w AS last_campaign
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT campaign, count(*) AS n_conversions,
       |  CAST(sum(cents) AS BIGINT) AS revenue_cents
       |FROM (
       |  SELECT CASE WHEN last_click_es IS NOT NULL
       |              AND es - last_click_es <= $AttrLookbackS
       |         THEN last_campaign ELSE -1 END AS campaign, cents
       |  FROM carried WHERE event_type = 'purchase')
       |GROUP BY campaign
       |ORDER BY campaign""".stripMargin

  /** Two-sample experiment readout (Welch's t): users split into
    * variants by `user_id % 2`, metric = per-user total purchase
    * cents (zero for non-purchasers — every user observed in the log
    * is an experiment subject). The five sufficient statistics
    * accumulate as DECIMAL(38,0) over integer cents (the q_corr
    * lesson: Σy² overflows BIGINT at 100 TB, and a float mean drifts
    * with partition order), then ONE double formula computes
    * t = (m̄₁−m̄₂)/√(v₁/n₁+v₂/n₂) with sample variances
    * vᵢ = (nᵢQᵢ−Sᵢ²)/(nᵢ(nᵢ−1)). Two partial-aggregatable exchanges
    * total (user collapse, then a 2-group collapse); the final
    * combine is a 2-row driver-side projection.
    */
  def qAbtest(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perUser = Tables(s, dir).events
      .select(col("user_id"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).as("cents"))
      .groupBy(col("user_id"))
      .agg(coalesce(sum(col("cents")), lit(0L)).as("y"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"), col("y"))
    val sums = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        count(lit(1)).cast(dec).as("n_dec"),
        sum(col("y")).as("s"),
        sum(col("y").cast(dec)).as("s_dec"),
        sum((col("y") * col("y")).cast(dec)).as("q"))
      .withColumn("var_over_n",
        (col("n_dec") * col("q") - col("s_dec") * col("s_dec")).cast("double")
          / (col("n_dec") * (col("n_dec") - 1)).cast("double")
          / col("n").cast("double"))
    val a = sums.filter(col("variant") === 0)
    val b = sums.filter(col("variant") === 1)
    a.crossJoin(b.select(col("n").as("n_b"), col("s").as("s_b"),
        col("var_over_n").as("von_b")))
      .select(col("n").as("n_a"), col("n_b"),
        col("s").as("sum_cents_a"), col("s_b").as("sum_cents_b"),
        round((col("s").cast("double") / col("n").cast("double")
          - col("s_b").cast("double") / col("n_b").cast("double"))
          / sqrt(col("var_over_n") + col("von_b")), 6).as("t_welch"))
  }

  val qAbtestSql: String =
    """WITH pu AS (
      |  SELECT user_id % 2 AS variant,
      |    coalesce(sum(CASE WHEN event_type = 'purchase'
      |                 THEN round(value * 100)::BIGINT END), 0) AS y
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT variant, count(*) AS n, CAST(sum(y) AS BIGINT) AS s,
      |    sum(y * y) AS q,
      |    (count(*) * sum(y * y) - sum(y) * sum(y))::DOUBLE /
      |      (count(*) * (count(*) - 1))::DOUBLE / count(*)::DOUBLE
      |      AS var_over_n
      |  FROM pu GROUP BY variant)
      |SELECT a.n AS n_a, b.n AS n_b,
      |  a.s AS sum_cents_a, b.s AS sum_cents_b,
      |  round((a.s::DOUBLE / a.n::DOUBLE - b.s::DOUBLE / b.n::DOUBLE) /
      |        sqrt(a.var_over_n + b.var_over_n), 6) AS t_welch
      |FROM (SELECT * FROM g WHERE variant = 0) a,
      |     (SELECT * FROM g WHERE variant = 1) b""".stripMargin

  /** Rolling z-score spike detection over the per-(event_type, day)
    * count series: each day is scored against the TRAILING 7 fully
    * observed days (rows 7 preceding .. 1 preceding — the day under
    * test never contaminates its own baseline). The anomaly DECISION
    * is pure integer algebra so it cannot drift with partition order
    * or float rounding: x−μ > 2σ ⟺ (nx−S) > 0 ∧ (nx−S)² > 4(nQ−S²),
    * with all moments in DECIMAL(38,0) (daily counts square past
    * BIGINT at 100 TB). The reported z = (nx−S)/√(nQ−S²) is one
    * double division, round-6, null when the baseline is flat. One
    * exchange on event_type; the window runs over day cardinality,
    * not events.
    */
  def qAnomaly(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = Tables(s, dir).events
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    val scored = daily
      .withColumn("n", count(lit(1)).over(w).cast(dec))
      .withColumn("s", sum(col("x").cast(dec)).over(w))
      .withColumn("q", sum((col("x") * col("x")).cast(dec)).over(w))
      .filter(col("n") === 7)
      .withColumn("num", col("n") * col("x").cast(dec) - col("s"))
      .withColumn("den2", col("n") * col("q") - col("s") * col("s"))
    scored.select(col("event_type"), col("day"), col("x"),
        when(col("den2") > 0,
          round(col("num").cast("double") / sqrt(col("den2").cast("double")),
            6)).as("z"),
        (col("num") > 0 &&
          col("num") * col("num") > col("den2") * 4).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  val qAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, floor(epoch(ts) / 86400)::BIGINT AS day,
      |    count(*) AS x
      |  FROM events GROUP BY event_type, day),
      |scored AS (
      |  SELECT event_type, day, x,
      |    count(*) OVER w AS n, sum(x) OVER w AS s,
      |    sum(x * x) OVER w AS q
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |m AS (
      |  SELECT event_type, day, x,
      |    n * x - s AS num, n * q - s * s AS den2
      |  FROM scored WHERE n = 7)
      |SELECT event_type, day, x,
      |  CASE WHEN den2 > 0
      |       THEN round(num::DOUBLE / sqrt(den2::DOUBLE), 6) END AS z,
      |  num > 0 AND num * num > 4 * den2 AS is_anomaly
      |FROM m
      |ORDER BY event_type, day""".stripMargin

  /** Daily OHLC bars per event type — the classic time-series rollup
    * (finance candles, metric snapshots): open/close = first/last
    * value in the bar by the total (es, event_id) event order, high/
    * low = extrema, plus volume. `min_by`/`max_by` on a (es, event_id)
    * struct keep open/close inside ONE partial-aggregatable exchange —
    * each map task forwards a single (ord, value) candidate pair per
    * bar, so no window, no second shuffle, and the plan is a plain
    * two-phase hash aggregate at any scale. Values in integer cents.
    * The oracle spells first/last as window functions instead (DuckDB's
    * arg_min can't take a composite ordering) — same total order.
    */
  def qOhlc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events.select(
      col("event_type"),
      floor(unix_timestamp(col("ts")) / 86400).as("day"),
      unix_timestamp(col("ts")).as("es"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
    e.groupBy(col("event_type"), col("day"))
      .agg(
        min_by(col("cents"), struct(col("es"), col("event_id"))).as("open"),
        max(col("cents")).as("high"),
        min(col("cents")).as("low"),
        max_by(col("cents"), struct(col("es"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  val qOhlcSql: String =
    """WITH e AS (
      |  SELECT event_type, floor(epoch(ts) / 86400)::BIGINT AS day,
      |    floor(epoch(ts))::BIGINT AS es, event_id,
      |    round(value * 100)::BIGINT AS cents
      |  FROM events),
      |w AS (
      |  SELECT event_type, day, cents,
      |    first_value(cents) OVER win AS open,
      |    last_value(cents) OVER win AS close
      |  FROM e
      |  WINDOW win AS (PARTITION BY event_type, day ORDER BY es, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING
      |                          AND UNBOUNDED FOLLOWING))
      |SELECT event_type, day, min(open) AS open, max(cents) AS high,
      |  min(cents) AS low, min(close) AS close, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM w GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin

  /** Max concurrent sessions per hour — the occupancy/concurrency
    * metric (peak simultaneous users, connection-pool sizing) over the
    * 30-min-gap sessions. The naive answer is one GLOBAL running sum
    * over every boundary event — a single-partition window over the
    * corpus, dead at scale. This plan decomposes it: (1) session
    * intervals become ±1 deltas, collapsed per active second (partial
    * agg; per-second nets also make same-second tie order moot),
    * (2) a per-HOUR keyed window computes each hour's internal running
    * prefix and its max (skew bounded by per-hour activity), (3) the
    * hour-start carry is a running sum over the AGGREGATED hour series
    * — time cardinality, the aggregate-first-window-the-small-series
    * rule — and max_concurrent = carry + max(0, in-hour max). Closed
    * intervals: −1 lands at end+1. Hours with no boundary events are
    * omitted (their concurrency is the carry, constant all hour).
    * The oracle computes the same metric the NAIVE way (global cumsum,
    * arg_max carry), so the hash match PROVES the decomposition.
    */
  def qConcurrency(s: SparkSession, dir: String): DataFrame = {
    // the union's two projections would each re-run the whole
    // sessionization (the CC edge-list lesson) — share the narrow
    // (start_s, end_s) interval table instead
    val sessions = graft.streaming.Streams
      .sessionizeBatch(Tables(s, dir).events, 30)
      .select(col("start_s"), col("end_s"))
      .localCheckpoint(false)
    try {
      val deltas = sessions.select(col("start_s").as("sec"), lit(1L).as("d"))
        .unionAll(sessions.select((col("end_s") + 1).as("sec"),
          lit(-1L).as("d")))
      val perSec = deltas.groupBy(col("sec")).agg(sum(col("d")).as("net"))
        .withColumn("hour", floor(col("sec") / 3600))
      val wHour = Window.partitionBy(col("hour")).orderBy(col("sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hourly = perSec.withColumn("run", sum(col("net")).over(wHour))
        .groupBy(col("hour"))
        .agg(sum(col("net")).as("net"), max(col("run")).as("hmax"))
      val wSeries = Window.orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, -1)
      hourly
        .withColumn("carry", coalesce(sum(col("net")).over(wSeries), lit(0L)))
        .select(col("hour"),
          (col("carry") + greatest(lit(0L), col("hmax"))).as("max_concurrent"))
        .orderBy(col("hour"))
        .localCheckpoint(true)
    } finally graft.util.Caches.release(sessions)
  }

  val qConcurrencySql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
      |  FROM e),
      |sess AS (
      |  SELECT floor(epoch(min(ts)))::BIGINT AS start_s,
      |    floor(epoch(max(ts)))::BIGINT AS end_s
      |  FROM s GROUP BY user_id, session_id),
      |d AS (
      |  SELECT start_s AS sec, 1 AS dd FROM sess
      |  UNION ALL
      |  SELECT end_s + 1, -1 FROM sess),
      |ps AS (SELECT sec, CAST(sum(dd) AS BIGINT) AS net FROM d GROUP BY sec),
      |r AS (
      |  SELECT sec, net,
      |    sum(net) OVER (ORDER BY sec ROWS UNBOUNDED PRECEDING)::BIGINT AS run
      |  FROM ps),
      |hh AS (
      |  SELECT sec // 3600 AS hour, max(run) AS mrun,
      |    arg_max(run, sec) AS lrun
      |  FROM r GROUP BY hour)
      |SELECT hour,
      |  greatest(mrun, coalesce(lag(lrun) OVER (ORDER BY hour), 0))::BIGINT
      |    AS max_concurrent
      |FROM hh
      |ORDER BY hour""".stripMargin

  /** Concentration audit: the Gini coefficient of per-user event
    * counts — the "is this corpus power-law?" number a sampling or
    * rate-limiting decision needs before a crawl/training run. Formula:
    * G = 2·Σ r·c ∕ (n·Σc) − (n+1)∕n over ascending ranks r; within a
    * tie group of equal counts any rank permutation leaves Σ r·c
    * unchanged, so the value is tie-order-independent. The rank is the
    * scale hazard (a global sort), decomposed as in
    * mix_curriculum_bounds: rank = (users with a smaller count — a
    * cumulative over the TINY distinct-count histogram, broadcast back)
    * + (row_number within this count value — a window parallel across
    * values). Σ r·c accumulates in DECIMAL(38,0) (q_corr's escrow):
    * r·c summed over 10⁹ users overflows BIGINT exactly when the
    * answer matters.
    */
  def qGini(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir).events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
    val hist = counts.groupBy(col("c"))
      .agg(count(lit(1)).as("nv"))
      .withColumn("cum_below", coalesce(
        sum(col("nv")).over(Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("c").as("h_c"), col("cum_below"))
    counts.join(broadcast(hist), col("c") === col("h_c"))
      .withColumn("r", col("cum_below") + row_number().over(
        Window.partitionBy(col("c")).orderBy(col("user_id"))))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("total"),
        sum(col("r").cast("decimal(38,0)") * col("c")).as("src"))
      .select(col("n").as("n_users"), col("total").as("n_events"),
        round(lit(2.0) * col("src").cast("double") /
            (col("n").cast("double") * col("total").cast("double")) -
          (col("n") + 1).cast("double") / col("n").cast("double"), 6)
          .as("gini"))
  }

  val qGiniSql: String =
    """WITH c AS (
      |  SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
      |r AS (
      |  SELECT c, row_number() OVER (ORDER BY c, user_id) AS r FROM c)
      |SELECT count(*) AS n_users, sum(c)::BIGINT AS n_events,
      |  round(2.0 * sum(r * c)::DOUBLE
      |      / (count(*)::DOUBLE * sum(c)::DOUBLE)
      |    - (count(*) + 1)::DOUBLE / count(*)::DOUBLE, 6) AS gini
      |FROM r""".stripMargin

  /** Point-in-time-correct temporal join — the feature-leakage guard of
    * ML feature generation: every purchase is attributed to the user's
    * state VALID AT ITS EVENT TIME (q_scd2's gaps-and-islands intervals
    * over the non-purchase events, [from, to) half-open), never to a
    * later state. The join is an equi-join on user_id with the range
    * predicate as a join filter (each user's interval list is small and
    * non-overlapping, so a purchase matches at most one; purchases
    * before the user's first state row keep a NULL state → 'unknown').
    * Same-second state flips produce zero-length [x, x) intervals that
    * match nothing — deterministic in both engines at the es
    * second-resolution contract q_scd2 already documents. Revenue in
    * integer cents (q_mom's escrow).
    */
  def qStateAtEvent(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val stEv = e.filter(col("event_type") =!= "purchase")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runs = stEv
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull
          || lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs.groupBy(col("user_id").as("i_user"), col("run_id"))
      .agg(max(col("event_type")).as("state"), min(col("es")).as("from_s"))
      .withColumn("to_s", lead(col("from_s"), 1).over(
        Window.partitionBy(col("i_user")).orderBy(col("run_id"))))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("es"),
        round(col("value") * 100).cast("long").as("cents"))
    purchases.join(intervals,
        purchases("user_id") === intervals("i_user") &&
          col("es") >= col("from_s") &&
          (col("to_s").isNull || col("es") < col("to_s")), "left")
      .groupBy(coalesce(col("state"), lit("unknown")).as("state"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("rev_cents"))
      .orderBy(col("state"))
  }

  val qStateAtEventSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id, ts,
      |    floor(epoch(ts))::BIGINT AS es, value
      |  FROM events),
      |runs AS (
      |  SELECT user_id, event_type, es,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING)::BIGINT AS run_id
      |  FROM (
      |    SELECT *,
      |      CASE WHEN lag(event_type) OVER w IS NULL
      |             OR lag(event_type) OVER w <> event_type
      |           THEN 1 ELSE 0 END AS chg
      |    FROM e WHERE event_type <> 'purchase'
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))),
      |iv AS (
      |  SELECT user_id AS i_user, state, from_s,
      |    lead(from_s) OVER (PARTITION BY user_id ORDER BY run_id) AS to_s
      |  FROM (
      |    SELECT user_id, run_id, max(event_type) AS state,
      |      min(es) AS from_s
      |    FROM runs GROUP BY user_id, run_id)),
      |p AS (
      |  SELECT user_id, es, round(value * 100)::BIGINT AS cents
      |  FROM e WHERE event_type = 'purchase')
      |SELECT coalesce(iv.state, 'unknown') AS state,
      |  count(*) AS n_purchases, sum(p.cents)::BIGINT AS rev_cents
      |FROM p LEFT JOIN iv
      |  ON p.user_id = iv.i_user AND p.es >= iv.from_s
      |     AND (iv.to_s IS NULL OR p.es < iv.to_s)
      |GROUP BY 1
      |ORDER BY state""".stripMargin

  /** Multi-touch (linear) attribution — the credit model last-touch
    * q_attribution can't express: every click in the purchase's 7-day
    * lookback shares the revenue EQUALLY. Fractional credit is where
    * float would drift, so credit is integer MICRO-CENTS: each touch
    * gets (cents·10⁶) div n, and the division remainder goes whole to
    * the MOST RECENT touch (deterministic, revenue-conserving — the
    * per-purchase credits sum back to cents·10⁶ exactly; "remainder to
    * last" is the standard allocation fix-up). Purchases with no
    * in-window click credit campaign −1 in full. Revenue sums escrow
    * in DECIMAL(38,0) INTERNALLY (micro-cents reach ~10²⁰ at 10⁹
    * purchases) but the reported column is BIGINT: a raw
    * decimal128(38,0) output column is hashed differently from plain
    * ints by the driver's arrow-level compare (the one red row of
    * round 8 — rows+schema matched, hash didn't, and this was the only
    * decimal-typed output on the whole surface). At bench SFs
    * micro-cents top out ~10¹² — far inside BIGINT; a deployment where
    * campaign totals could cross 9.2·10¹⁸ micro-cents should report
    * cents (divide the escrow by 10⁶ before the cast), not micro.
    *
    * Scale (100 TB): purchase×click pairs ride ONE user_id equi-join
    * with the range predicate as a join filter; fan-out is the user's
    * in-window click count (bounded by behavior, not corpus size); the
    * per-purchase window partitions on p_id — keys at purchase
    * cardinality, no skew pile-up.
    */
  def qAttributionMulti(s: SparkSession, dir: String): DataFrame = {
    val e = attributionEvents(s, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("es").as("p_es"), col("cents"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("es").as("c_es"), col("campaign"))
    val pairs = p.join(c,
      col("user_id") === col("c_user") && col("c_es") <= col("p_es") &&
        col("p_es") - col("c_es") <= AttrLookbackS, "left")
    val w = Window.partitionBy(col("p_id"))
    val latestFirst = Window.partitionBy(col("p_id"))
      .orderBy(col("c_es").desc, col("c_id").desc)
    pairs
      .withColumn("n", count(col("c_id")).over(w))
      .withColumn("rk", row_number().over(latestFirst))
      .withColumn("credit_micro",
        // `div`, not `/`: Spark's `/` on BIGINT is true (double)
        // division; div keeps the arithmetic integer end-to-end
        when(col("c_id").isNull, col("cents") * 1000000L)
          .otherwise(expr("(cents * 1000000) div n") +
            when(col("rk") === 1,
              pmod(col("cents") * 1000000L, col("n"))).otherwise(0L)))
      .select(coalesce(col("campaign"), lit(-1L)).as("campaign"),
        col("credit_micro"), col("c_id"))
      .groupBy(col("campaign"))
      .agg(count(col("c_id")).as("n_touches"),
        sum(col("credit_micro").cast("decimal(38,0)")).cast("bigint")
          .as("revenue_micro"))
      .orderBy(col("campaign"))
  }

  val qAttributionMultiSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type,
       |    floor(epoch(ts))::BIGINT AS es,
       |    CASE WHEN event_type = 'click' THEN
       |      regexp_extract(props, '"k":\\s*(\\d+)', 1)::BIGINT % 10 END
       |      AS campaign,
       |    CASE WHEN event_type = 'purchase' THEN
       |      round(value * 100)::BIGINT END AS cents
       |  FROM events
       |  WHERE event_type IN ('click', 'purchase')),
       |p AS (SELECT user_id, event_id AS p_id, es AS p_es, cents
       |      FROM e WHERE event_type = 'purchase'),
       |c AS (SELECT user_id AS c_user, event_id AS c_id, es AS c_es, campaign
       |      FROM e WHERE event_type = 'click'),
       |pairs AS (
       |  SELECT p.*, c.c_id, c.c_es, c.campaign
       |  FROM p LEFT JOIN c
       |    ON p.user_id = c.c_user AND c.c_es <= p.p_es
       |       AND p.p_es - c.c_es <= $AttrLookbackS),
       |credited AS (
       |  SELECT coalesce(campaign, -1) AS campaign, c_id,
       |    CASE WHEN c_id IS NULL THEN cents * 1000000
       |         ELSE (cents * 1000000) // count(c_id) OVER w
       |              + CASE WHEN row_number() OVER
       |                  (PARTITION BY p_id ORDER BY c_es DESC, c_id DESC) = 1
       |                THEN (cents * 1000000) % (count(c_id) OVER w)
       |                ELSE 0 END
       |    END AS credit_micro
       |  FROM pairs
       |  WINDOW w AS (PARTITION BY p_id))
       |SELECT campaign, count(c_id) AS n_touches,
       |  sum(credit_micro)::DECIMAL(38,0)::BIGINT AS revenue_micro
       |FROM credited
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** Skew report — the diagnostic run BEFORE q_skew_join's salting is
    * tuned: the top-10 heaviest join/groupBy keys with their absolute
    * count, parts-per-million share (integer division — exact), and
    * the salt factor that key needs (⌈count ∕ mean-per-key⌉ — how many
    * subtasks the hot key must split into for its partitions to look
    * average). One key-cardinality aggregate + a one-row broadcast of
    * the totals + TakeOrdered — at 100 TB this is a minutes-long scan
    * that saves the hours-long skewed shuffle it diagnoses; AQE's
    * skew-join handles the JOIN side at runtime, but groupBy hotspots
    * and the salt factor still need the offline number.
    */
  def qSkewReport(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.join(broadcast(totals)) // one-row totals: broadcast, never a shuffle
      .select(col("user_id"), col("cnt"),
        expr("(cnt * 1000000) div total").as("ppm"),
        // ⌈cnt·n_keys ∕ total⌉ as INTEGER ceiling division with the
        // product escrowed in DECIMAL(38,0): cnt·n_keys can overflow
        // BIGINT at extreme key counts, and a double divide loses
        // integer precision past 2⁵³ — exactly the scales this
        // diagnostic targets (the q_corr escrow move)
        expr("(CAST(cnt AS DECIMAL(38,0)) * n_keys + total - 1) div total")
          .as("salt_factor"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(10)
  }

  val qSkewReportSql: String =
    """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      |t AS (SELECT sum(cnt)::BIGINT AS total, count(*) AS n_keys FROM c)
      |SELECT user_id, cnt, (cnt * 1000000) // total AS ppm,
      |  ((cnt::HUGEINT * n_keys + total - 1) // total)::BIGINT
      |    AS salt_factor
      |FROM c, t
      |ORDER BY cnt DESC, user_id
      |LIMIT 10""".stripMargin

  /** Day-of-week seasonality profile — the decomposition read BEFORE
    * trusting q_anomaly's rolling z-scores (a Monday spike that
    * happens every Monday is seasonality, not anomaly): per
    * (event_type, dow): count, integer-ppm share within the type, and
    * the signed ppm deviation from the uniform 1∕7 — all integer
    * arithmetic off one (type, dow)-keyed partial agg + a
    * type-cardinality broadcast, so the profile is partition-exact.
    * ISO day numbering (1 = Monday) on both engines.
    */
  def qSeasonality(s: SparkSession, dir: String): DataFrame = {
    val byDow = Tables(s, dir).events
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow_sun1"))
      .agg(count(lit(1)).as("n_events"))
      // Spark dayofweek is 1=Sunday; fold to ISO 1=Monday..7=Sunday
      .withColumn("dow", (pmod(col("dow_sun1") + 5, lit(7)) + 1).cast("int"))
      .drop("dow_sun1")
    val totals = byDow.groupBy(col("event_type").as("t_type"))
      .agg(sum(col("n_events")).as("n_total"))
    byDow.join(broadcast(totals), col("event_type") === col("t_type"))
      .select(col("event_type"), col("dow"), col("n_events"),
        expr("(n_events * 1000000) div n_total").as("share_ppm"),
        (expr("(n_events * 1000000) div n_total") -
          lit(1000000L / 7)).as("dev_ppm"))
      .orderBy(col("event_type"), col("dow"))
  }

  val qSeasonalitySql: String =
    """WITH d AS (
      |  SELECT event_type, isodow(ts)::INT AS dow, count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, sum(n_events)::BIGINT AS n_total
      |      FROM d GROUP BY 1)
      |SELECT d.event_type, d.dow, d.n_events,
      |  (d.n_events * 1000000) // t.n_total AS share_ppm,
      |  ((d.n_events * 1000000) // t.n_total - 142857) AS dev_ppm
      |FROM d JOIN t ON d.event_type = t.event_type
      |ORDER BY 1, 2""".stripMargin

  /** The Pareto cut — "what fraction of users drive 80% of events":
    * user counts fold to a (cnt → n_users) HISTOGRAM (bounded by the
    * max per-user activity, not user cardinality — the q_gini
    * decomposition), heaviest-first running shares accumulate over the
    * histogram only, and the answer is the smallest user-ppm whose
    * event share reaches each threshold {50, 80, 90, 99}%. No global
    * sort over users anywhere; everything after the first aggregate is
    * histogram-scale. Integer ppm end-to-end.
    */
  def qPareto(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables(s, dir).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("n_users"))
    val w = Window.orderBy(col("cnt").desc) // histogram-scale window
    val cum = hist
      .withColumn("cum_events", sum(col("cnt") * col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_users", sum(col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = cum.agg(max(col("cum_events")).as("tot_e"),
      max(col("cum_users")).as("tot_u"))
    val shares = cum.crossJoin(broadcast(totals))
      .select(expr("(cum_events * 1000000) div tot_e").as("event_ppm"),
        expr("(cum_users * 1000000) div tot_u").as("user_ppm"))
    // all four thresholds ride ONE pass: a 4-row broadcast against the
    // histogram-scale share table, never a re-run of the base aggregate
    import s.implicits._
    val thresholds = Seq(500000L, 800000L, 900000L, 990000L).toDF("thr")
    shares.join(broadcast(thresholds), col("event_ppm") >= col("thr"))
      .groupBy((col("thr") / 10000L).cast("long").as("event_pct"))
      .agg(min(col("user_ppm")).as("user_ppm"))
      .orderBy(col("event_pct"))
  }

  val qParetoSql: String =
    """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      |h AS (SELECT cnt, count(*) AS n_users FROM c GROUP BY 1),
      |cum AS (
      |  SELECT cnt,
      |    sum(cnt * n_users) OVER (ORDER BY cnt DESC
      |      ROWS UNBOUNDED PRECEDING) AS cum_events,
      |    sum(n_users) OVER (ORDER BY cnt DESC
      |      ROWS UNBOUNDED PRECEDING) AS cum_users
      |  FROM h),
      |t AS (SELECT max(cum_events) AS tot_e, max(cum_users) AS tot_u FROM cum),
      |s AS (
      |  SELECT ((cum_events * 1000000) // tot_e)::BIGINT AS event_ppm,
      |         ((cum_users * 1000000) // tot_u)::BIGINT AS user_ppm
      |  FROM cum, t)
      |SELECT (thr // 10000)::BIGINT AS event_pct,
      |  (SELECT min(user_ppm) FROM s WHERE event_ppm >= thr) AS user_ppm
      |FROM (SELECT unnest([500000, 800000, 900000, 990000]) AS thr)
      |ORDER BY 1""".stripMargin

  /** Gap for [[qIntervalJoin]]'s session intervals (30 min — tighter
    * than [[SessionGapS]] on purpose: interval-join fan-out is bounded
    * by interval LENGTH / bucket size, so the demo keeps sessions
    * short the way a production impact analysis would).
    */
  private val IntervalGapS = 1800L

  /** Half-width of an incident's impact window (± 5 min). */
  private val IncidentPadS = 300L

  /** Bucket size of the interval-overlap equi-join (1 h). Sizing rule
    * at 100 TB: a bucket ≫ the TYPICAL interval length (each interval
    * then explodes to ~1-2 buckets) and small enough that one bucket's
    * pair cross-product fits a task — tune per workload like shuffle
    * partition counts.
    */
  private val IntervalBucketS = 3600L

  /** Interval-overlap join — the batch operator behind blast-radius /
    * impact analysis: which user SESSIONS were in flight during each
    * error INCIDENT's ±5 min window. Spark has no interval-join
    * operator, and the naive `ON s.start <= i.end AND i.start <= s.end`
    * theta-join compiles to BroadcastNestedLoopJoin — O(|S|·|I|)
    * comparisons, the plan that dies first at 100 TB. This face is the
    * standard bucketed rewrite that turns overlap into an EQUI-join:
    *
    *  1. explode each interval to the 1-h buckets it covers (map-side;
    *     fan-out = interval span / bucket, ~1-2 here);
    *  2. shuffle-hash join on the bucket id — co-partitioned, scales
    *     with data like any groupBy;
    *  3. re-check true overlap (the bucket join is a superset);
    *  4. emit each surviving pair ONCE without a distinct: keep only
    *     the join row whose bucket contains the overlap's START
    *     (`floor(greatest(starts)/B)` — that bucket is covered by both
    *     sides by construction, so exactly one copy survives and the
    *     dedup shuffle disappears).
    *
    * Sessions are the gaps-and-islands fold (one user_id exchange);
    * incidents are a map-only filter on the same scan. All outputs are
    * exact integers. The oracle runs the naive overlap join — result
    * equality IS the proof the bucketed rewrite loses nothing.
    */
  def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir).events
    val base = e.select(col("user_id"), col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val prev = lag(col("es"), 1).over(w)
    val sess = base
      .withColumn("brk",
        when(prev.isNull || col("es") - prev > IntervalGapS, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("es")).as("start_s"), max(col("es")).as("end_s"))
    val inc = base.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        (col("es") - IncidentPadS).as("i_start"),
        (col("es") + IncidentPadS).as("i_end"))
    val b = lit(IntervalBucketS)
    val sessB = sess.withColumn("bucket",
      explode(sequence(floor(col("start_s") / b), floor(col("end_s") / b))))
    val incB = inc.withColumn("bucket",
      explode(sequence(floor(col("i_start") / b), floor(col("i_end") / b))))
    incB.join(sessB, Seq("bucket"))
      .filter(col("start_s") <= col("i_end") && col("i_start") <= col("end_s"))
      // one canonical copy per pair: the bucket holding the overlap start
      .filter(col("bucket") === floor(greatest(col("start_s"), col("i_start")) / b))
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(least(col("end_s"), col("i_end")) -
          greatest(col("start_s"), col("i_start"))).as("overlap_s"))
      .orderBy(col("incident_id"))
  }

  val qIntervalJoinSql: String =
    s"""WITH sess AS (
       |  SELECT user_id, session_id, min(es) AS start_s, max(es) AS end_s
       |  FROM (
       |    SELECT user_id, es,
       |      sum(brk) OVER (PARTITION BY user_id ORDER BY es, event_id
       |                     ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
       |    FROM (
       |      SELECT user_id, event_id, es,
       |        CASE WHEN lag(es) OVER (PARTITION BY user_id
       |                                ORDER BY es, event_id) IS NULL
       |               OR es - lag(es) OVER (PARTITION BY user_id
       |                                     ORDER BY es, event_id)
       |                  > $IntervalGapS
       |             THEN 1 ELSE 0 END AS brk
       |      FROM (SELECT user_id, event_id,
       |              floor(epoch(ts))::BIGINT AS es FROM events)))
       |  GROUP BY user_id, session_id),
       |inc AS (
       |  SELECT event_id AS incident_id,
       |    floor(epoch(ts))::BIGINT - $IncidentPadS AS i_start,
       |    floor(epoch(ts))::BIGINT + $IncidentPadS AS i_end
       |  FROM events WHERE event_type = 'error')
       |SELECT i.incident_id, count(*) AS n_sessions,
       |  count(DISTINCT s.user_id) AS n_users,
       |  sum(least(s.end_s, i.i_end) - greatest(s.start_s, i.i_start))
       |    ::BIGINT AS overlap_s
       |FROM inc i JOIN sess s
       |  ON s.start_s <= i.i_end AND i.i_start <= s.end_s
       |GROUP BY i.incident_id
       |ORDER BY i.incident_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interval_join" -> (qIntervalJoin _),
    "q_seasonality" -> (qSeasonality _),
    "q_pareto" -> (qPareto _),
    "q_skew_report" -> (qSkewReport _),
    "q_attribution_multi" -> (qAttributionMulti _),
    "q_state_at_event" -> (qStateAtEvent _),
    "q_gini" -> (qGini _),
    "q_concurrency" -> (qConcurrency _),
    "q_ohlc" -> (qOhlc _),
    "q_attribution" -> (qAttribution _),
    "q_abtest" -> (qAbtest _),
    "q_anomaly" -> (qAnomaly _),
    "q_sequence_match" -> (qSequenceMatch _),
    "q_wau" -> (qWau _),
    "q_trend" -> (qTrend _),
    "q_paths" -> (qPaths _),
    "q_resample" -> (qResample _),
    "q_sessionize" -> (qSessionize _),
    "q_cdc_apply" -> (qCdcApply _),
    "q_scd2" -> (qScd2 _),
    "q_funnel" -> (qFunnel _),
    "q_cohort" -> (qCohort _),
    "q_transitions" -> (qTransitions _),
    "q_skew_join" -> (qSkewJoin _))

  val oracleSql: Map[String, String] = Map(
    "q_interval_join" -> qIntervalJoinSql,
    "q_seasonality" -> qSeasonalitySql,
    "q_pareto" -> qParetoSql,
    "q_skew_report" -> qSkewReportSql,
    "q_attribution_multi" -> qAttributionMultiSql,
    "q_state_at_event" -> qStateAtEventSql,
    "q_gini" -> qGiniSql,
    "q_concurrency" -> qConcurrencySql,
    "q_ohlc" -> qOhlcSql,
    "q_attribution" -> qAttributionSql,
    "q_abtest" -> qAbtestSql,
    "q_anomaly" -> qAnomalySql,
    "q_sequence_match" -> qSequenceMatchSql,
    "q_wau" -> qWauSql,
    "q_trend" -> qTrendSql,
    "q_paths" -> qPathsSql,
    "q_resample" -> qResampleSql,
    "q_sessionize" -> qSessionizeSql,
    "q_cdc_apply" -> qCdcApplySql,
    "q_scd2" -> qScd2Sql,
    "q_funnel" -> qFunnelSql,
    "q_cohort" -> qCohortSql,
    "q_transitions" -> qTransitionsSql,
    "q_skew_join" -> qSkewJoinSql)
}
