package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, PipeQueries}
import graft.streaming.Streams
import graft.streaming.Streams.Ev

/** Fixture-level checks for the event-log analytics that the DuckDB
  * oracle can only see in aggregate: SCD2 interval structure, hopping-
  * window fan-out arithmetic, and bitmap-set-algebra overlap counts
  * against their exact distinct-join twins.
  */
class EventSpec extends SparkSpec {

  private def ev(id: Long, minute: Long, user: Long, typ: String): Ev =
    Ev(id, new Timestamp(1700000000000L + minute * 60000L), user, typ, 1.0)

  /** Write a canonical events.parquet under a temp dir so the query
    * entry points (which read via Tables) can run on a fixture.
    */
  private def fixtureDir(events: Seq[Ev]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_eventspec").toString
    events.toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("q_scd2: run-length intervals with closed/open validity and ties") {
    val dir = fixtureDir(Seq(
      // user 1: a a b a  → three intervals, last one open
      ev(1, 0, 1, "a"), ev(2, 10, 1, "a"), ev(3, 20, 1, "b"),
      ev(4, 30, 1, "a"),
      // user 2: single state → one open interval
      ev(5, 0, 2, "x"),
      // user 3: same-ts tie → event_id breaks the order (6 before 7)
      ev(6, 5, 3, "p"), ev(7, 5, 3, "q")))
    val out = EventQueries.qScd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
    val t0 = 1700000000L
    assert(out.toSeq === Seq(
      (1L, 1L, "a", t0, t0 + 1200, 2L),
      (1L, 2L, "b", t0 + 1200, t0 + 1800, 1L),
      (1L, 3L, "a", t0 + 1800, -1L, 1L),
      (2L, 1L, "x", t0, -1L, 1L),
      (3L, 1L, "p", t0 + 300, t0 + 300, 1L),
      (3L, 2L, "q", t0 + 300, -1L, 1L)))
  }

  test("q_scd2: intervals tile each user's history exactly") {
    val df = EventQueries.qScd2(spark, sf)
    // per user: run_ids are 1..n, interval event counts sum to the
    // user's events, and every closed interval's end = next start
    val byUser = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_runs"), max(col("run_id")).as("max_run"),
        sum(col("n_events")).as("n_events"),
        sum(when(col("valid_to_s").isNull, 1).otherwise(0)).as("n_open"))
      .collect()
    byUser.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), "run ids must be dense 1..n")
      assert(r.getLong(4) === 1L, "exactly one open (current) interval")
    }
    val totalEvents = graft.util.Tables(spark, sf).events.count()
    assert(byUser.map(_.getLong(3)).sum === totalEvents)
  }

  test("q_sessionize: exact session boundaries on a crafted history") {
    // gap threshold is 8 h = 480 min; minutes 0,10,20 | 500 | 1000,1010
    val dir = fixtureDir(Seq(
      ev(1, 0, 1, "view"), ev(2, 10, 1, "view"), ev(3, 20, 1, "click"),
      ev(4, 500, 1, "view"),             // 480 min after minute 20 → SAME session (== gap is not >)
      ev(5, 1000, 1, "view"), ev(6, 1010, 1, "purchase"),
      ev(7, 0, 2, "view")))              // single-event user
    val out = EventQueries.qSessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val t0 = 1700000000L
    assert(out.toSeq === Seq(
      (1L, 1L, t0, t0 + 500 * 60, 4L),   // minute 500 - minute 20 == 28800 s exactly: NOT a break
      (1L, 2L, t0 + 1000 * 60, t0 + 1010 * 60, 2L),
      (2L, 1L, t0, t0, 1L)))
  }

  test("q_sessionize: sessions tile each user's history, gaps respect the threshold") {
    val sess = EventQueries.qSessionize(spark, sf)
    val byUser = sess.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sess"), max(col("session_id")).as("max_sess"),
        sum(col("n_events")).as("n_events"))
      .collect()
    byUser.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), "session ids must be dense 1..n")
    }
    assert(byUser.map(_.getLong(3)).sum ===
      graft.util.Tables(spark, sf).events.count())
    // consecutive sessions of the same user must be > gap apart
    val rows = sess.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2))
    rows.sliding(2).foreach {
      case Array((u1, _, _, end1), (u2, _, start2, _)) if u1 == u2 =>
        assert(start2 - end1 > 28800L,
          s"user $u1 sessions separated by ${start2 - end1} s <= gap")
      case _ =>
    }
  }

  test("q_sequence_match: lazy reset semantics on crafted journeys") {
    // user 1: v c p v c p → LAZY counts 2 (greedy would swallow into 1)
    // user 2: v c e p     → error between click and purchase: 0
    // user 3: v v c p p   → earliest completion: 1
    val types = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
      'e' -> "error", 's' -> "signup")
    def journey(user: Long, s: String, base: Long) =
      s.zipWithIndex.map { case (ch, i) =>
        ev(base + i, i.toLong, user, types(ch)) }
    val dir = fixtureDir(journey(1, "vcpvcp", 100) ++
      journey(2, "vcep", 200) ++ journey(3, "vvcpp", 300))
    val out = EventQueries.qSequenceMatch(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 2, 2L -> 0, 3L -> 1))
  }

  test("q_wau: interval coverage equals naive per-day distinct on a crafted history") {
    import graft.streaming.Streams.Ev
    def at(day: Long, id: Long, user: Long) =
      Ev(id, new Timestamp(1700006400000L + day * 86400000L), user, "v", 1.0)
    // user 1 active days 0,5,20 (island 0–5 covers ends 0..11; island 20
    // covers 20..26); user 2 active day 8 only (covers 8..14)
    val dir = fixtureDir(Seq(at(0, 1, 1), at(5, 2, 1), at(20, 3, 1),
      at(8, 4, 2)))
    val out = EventQueries.qWau(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d0 = out.keys.min
    val naive = (0L to 20L).map { d =>
      val active = Seq((1L, Seq(0L, 5L, 20L)), (2L, Seq(8L)))
        .count { case (_, days) => days.exists(a => a >= d - 6 && a <= d) }
      d -> active.toLong
    }.toMap
    (0L to 20L).foreach { d =>
      assert(out(d0 + d) === naive(d), s"day $d: ${out(d0 + d)} vs ${naive(d)}")
    }
    assert(out.size === 21, "grid spans min..max active day")
  }

  test("q_trend: hand-computed slope on planted ramps") {
    import graft.streaming.Streams.Ev
    // user 1: value rises exactly 2.0/day over days 0..3 → slope 200 c/d
    // user 2: constant value → slope 0; user 3: one event → dropped (x degenerate)
    val evs = (0 to 3).map(d => Ev(1L + d, new Timestamp(1700000000000L +
        d * 86400000L), 1L, "v", 1.0 + 2.0 * d)) ++
      Seq(Ev(10, new Timestamp(1700000000000L), 2L, "v", 5.0),
        Ev(11, new Timestamp(1700000000000L + 86400000L), 2L, "v", 5.0),
        Ev(12, new Timestamp(1700000000000L), 3L, "v", 9.0))
    val dir = fixtureDir(evs)
    val out = EventQueries.qTrend(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map(1L -> ((4L, 200.0)), 2L -> ((2L, 0.0))))
  }

  test("q_paths: journeys assemble in (ts, event_id) order, truncated at 8") {
    val dir = fixtureDir(Seq(
      // user 1: same-ts tie at minute 5 → event_id order (2 before 3)
      ev(1, 0, 1, "view"), ev(2, 5, 1, "click"), ev(3, 5, 1, "view")) ++
      // user 2: 10 events — journey truncates to the first 8
      (1 to 10).map(i => ev(100 + i, 10 * i, 2, if (i % 2 == 0) "b" else "a")))
    val out = EventQueries.qPaths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "view>click>view" -> 1L,
      "a>b>a>b>a>b>a>b" -> 1L))
  }

  test("q_resample: dense grid, LOCF fill, zero-count gap days") {
    // minutes → days: 1440 min = 1 day; user 1 events on day 0 and day 3
    val dir = fixtureDir(Seq(
      ev(1, 0, 1, "view"),            // day 0
      ev(2, 3 * 1440, 1, "view"),     // day 3
      ev(3, 3 * 1440 + 10, 1, "buy"), // day 3, later → that day's value
      ev(4, 0, 2, "view")))           // single-day user
    val out = EventQueries.qResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val d0 = 1700000000L / 86400     // fixture epoch day
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq === (d0 to d0 + 3).toSeq, "dense daily grid")
    assert(u1.map(_._4).toSeq === Seq(1L, 0L, 0L, 2L), "gap days count 0")
    // all fixture values are 1.0 — LOCF must carry it across the gap
    assert(u1.forall(_._3 == 1.0))
    assert(out.filter(_._1 == 2L).map(_._2).toSeq === Seq(d0))
  }

  test("hoppingAgg: one event lands in exactly size/slide epoch-aligned windows") {
    import spark.implicits._
    val t = 1700003123L // arbitrary, NOT hop-aligned
    val one = Seq(Ev(1, new Timestamp(t * 1000L), 1, "click", 2.0)).toDF()
    val rows = Streams.hoppingAgg(one).orderBy("ws").collect()
    assert(rows.length === 4)
    val starts = rows.map(_.getLong(0))
    val expectedLast = t / 900 * 900
    assert(starts.toSeq === Seq(expectedLast - 2700, expectedLast - 1800,
      expectedLast - 900, expectedLast))
    assert(rows.forall(r => r.getLong(2) === 1L))
    // every window actually contains the event
    starts.foreach(w => assert(w <= t && t < w + 3600))
  }

  test("hoppingAgg totals are size/slide times the tumbling totals") {
    val hop = Streams.hoppingAgg(graft.util.Tables(spark, sf).events,
      "1 hour", "15 minutes")
    val n = hop.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val total = graft.util.Tables(spark, sf).events.count()
    assert(n === 4 * total)
  }

  test("q_cdc_apply: action semantics and tombstone nulls") {
    val dir = fixtureDir(Seq(
      // span 100 min; split at minute 50
      ev(1, 0, 1, "view"), ev(2, 60, 1, "click"), // update
      ev(3, 0, 2, "view"), // keep (no change)
      ev(4, 70, 3, "click"), // insert (only after split)
      ev(5, 0, 4, "view"), ev(6, 80, 4, "error"), // delete
      ev(7, 100, 9, "view"))) // insert (pins hi bound)
    val out = EventQueries.qCdcApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(out === Seq(
      (1L, "update", Some(1.0)), (2L, "keep", Some(1.0)),
      (3L, "insert", Some(1.0)), (4L, "delete", None),
      (9L, "insert", Some(1.0))))
  }

  test("q_cdc_apply on corpus: one row per user, deletes are the only nulls") {
    val out = EventQueries.qCdcApply(spark, sf)
    val users = graft.util.Tables(spark, sf).events
      .select(col("user_id")).distinct().count()
    assert(out.count() === users)
    assert(out.filter(col("final_value").isNull
      && col("action") =!= "delete").count() === 0)
    assert(out.filter(col("final_value").isNotNull
      && col("action") === "delete").count() === 0)
  }

  test("agg_bitmap_ops matches the exact distinct-join overlap") {
    val got = PipeQueries.aggBitmapOps(spark, sf)
      .select("type_a", "type_b", "users_a", "users_b", "users_both")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val au = graft.util.Tables(spark, sf).events
      .select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint(false)
    val totals = au.groupBy("event_type").agg(count(lit(1)).as("nu"))
    val inter = au.as("a").join(au.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("nb"))
    val expected = totals.as("x").join(totals.as("y"),
        col("x.event_type") < col("y.event_type"))
      .join(inter, col("x.event_type") === col("ta")
        && col("y.event_type") === col("tb"), "left")
      .select(col("x.event_type"), col("y.event_type"),
        col("x.nu"), col("y.nu"), coalesce(col("nb"), lit(0L)))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      .sortBy(p => (p._1, p._2))
    assert(got === expected)
    assert(got.nonEmpty && got.forall(p => p._5 <= math.min(p._3, p._4)))
  }

  import EventSpec.EvP

  private def evp(id: Long, minute: Long, user: Long, typ: String,
      value: Double, k: Long = 0L): EvP =
    EvP(id, new Timestamp(1700000000000L + minute * 60000L), user, typ,
      value, s"""{"k": $k}""")

  private def fixtureDirP(events: Seq[EvP]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_eventspec").toString
    events.toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("q_attribution: last-touch, lookback expiry, tie and unattributed") {
    val dayMin = 1440L
    val dir = fixtureDirP(Seq(
      // user 1: click(k=3) then two purchases → both credit campaign 3
      evp(1, 0, 1, "click", 0.0, k = 3),
      evp(2, 10, 1, "purchase", 5.0),
      evp(3, 20, 1, "purchase", 1.0),
      // user 2: purchase before any click → unattributed; then a click
      // whose purchase lands 8 days later → outside lookback → -1
      evp(4, 0, 2, "purchase", 2.0),
      evp(5, 30, 2, "click", 0.0, k = 15), // campaign 15 % 10 = 5
      evp(6, 30 + 8 * dayMin, 2, "purchase", 3.0),
      // user 3: two clicks then purchase → LAST touch (k=17 → 7) wins
      evp(7, 0, 3, "click", 0.0, k = 4),
      evp(8, 5, 3, "click", 0.0, k = 17),
      evp(9, 6, 3, "purchase", 4.0),
      // user 4: click and purchase at the SAME timestamp — event_id
      // order puts the click first, so it still attributes
      evp(10, 50, 4, "click", 0.0, k = 2),
      evp(11, 50, 4, "purchase", 6.0)))
    val got = EventQueries.qAttribution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (-1L, 2L, 500L),  // user2's two orphaned purchases: 200 + 300
      (2L, 1L, 600L),
      (3L, 2L, 600L),
      (7L, 1L, 400L)))
  }

  test("q_abtest: Welch t matches the hand-computed value") {
    // variant 0 (even users): cents {200, 400}; variant 1: {300, 0}
    val dir = fixtureDirP(Seq(
      evp(1, 0, 1, "purchase", 1.0), evp(2, 5, 1, "purchase", 2.0),
      evp(3, 0, 3, "view", 0.0), // purchaseless user still counts as 0
      evp(4, 0, 2, "purchase", 2.0),
      evp(5, 0, 4, "purchase", 4.0)))
    val r = EventQueries.qAbtest(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 600L, 300L)))
    // m_a=300 m_b=150, var_over_n: a=(2*200000-360000)/2/2=10000,
    // b=(2*90000-90000)/2/2=22500 → t = 150/sqrt(32500)
    assert(math.abs(r.getDouble(4) - 0.83205) < 1e-9)
  }

  test("q_ohlc: open/close follow the (es, event_id) total order, ties included") {
    val dir = fixtureDirP(Seq(
      // one bar, ties at both ends: open = min event_id at the earliest
      // second, close = max event_id at the latest second
      evp(2, 90, 1, "a", 2.0), evp(9, 90, 2, "a", 9.0),
      evp(5, 100, 3, "a", 5.0), evp(7, 100, 4, "a", 7.0),
      // a second type, single event: open = close = high = low
      evp(11, 90, 1, "b", 1.0)))
    val day = (1700000000L + 90L * 60L) / 86400L
    val got = EventQueries.qOhlc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === Seq(
      ("a", day, 200L, 900L, 200L, 700L, 4L, 2300L),
      ("b", day, 100L, 100L, 100L, 100L, 1L, 100L)))
  }

  test("q_concurrency: hand-computed peaks, hour-boundary carry, " +
      "negative in-hour runnings") {
    val dir = fixtureDirP(Seq(
      // u1 session [0s, 600s]; u2 single-event session [300s, 300s]
      // → peak 2 in the first hour
      evp(1, 0, 1, "view", 0.0), evp(2, 10, 1, "view", 0.0),
      evp(3, 5, 2, "view", 0.0),
      // u4 session [2400s, 3900s] SPANS the hour boundary (hour ends
      // at offset 2800): its −1 lands in hour 2 before u3's burst, so
      // hour 2's running net goes negative and the carry must rescue
      evp(4, 40, 4, "view", 0.0), evp(5, 65, 4, "view", 0.0),
      // u3 single-event session [4200s, 4200s] in hour 2
      evp(6, 70, 3, "view", 0.0)))
    val h0 = 1700000000L / 3600L
    val got = EventQueries.qConcurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // hour 1: runnings 1,2,1,0,1 → peak 2; carry into hour 2 is 1
    // (u4 still open); hour 2 runnings −1,0,−1 → peak = carry = 1
    assert(got === Seq((h0, 2L), (h0 + 1, 1L)))
  }

  test("q_anomaly: integer decision flags spikes, flat baseline gives null z") {
    val dayMin = 1440L
    def burst(idBase: Long, day: Long, user: Long, typ: String, n: Int) =
      (0 until n).map(i => evp(idBase + i, day * dayMin + i, user, typ, 1.0))
    val evs =
      // type "view": days 0..6 flat at 1/day, day 7 spikes to 5
      (0L to 6L).flatMap(d => burst(100 * d, d, 1, "view", 1)) ++
        burst(800, 7, 1, "view", 5) ++
        // type "click": alternating 1,3 baseline, day 7 spikes to 10
        (0L to 6L).flatMap(d =>
          burst(1000 + 100 * d, d, 2, "click", if (d % 2 == 1) 3 else 1)) ++
        burst(1800, 7, 2, "click", 10)
    val dir = fixtureDirP(evs)
    val got = EventQueries.qAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got.size === 2, "only day 7 has a full 7-day baseline")
    val view = got.find(_._1 == "view").get
    assert(view._3 === 5L && view._4.isNaN && view._5,
      "flat baseline: null z but the integer decision still fires")
    val click = got.find(_._1 == "click").get
    // num = 7*10-13 = 57, den2 = 7*31-169 = 48 → z = 57/sqrt(48)
    assert(click._3 === 10L && click._5)
    assert(math.abs(click._4 - BigDecimal(57.0 / math.sqrt(48.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("q_state_at_event: purchases take the state valid AT event time " +
      "(no future leakage); pre-state purchases are 'unknown'; conserved") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sae").toString
    // user 1: view at t=10, click at t=30; purchases at t=5 (unknown —
    // before any state), t=20 (view — the LATER click must not leak
    // back), t=40 (click)
    Seq(
      Ev(1, ts(10), 1, "view", 1.0), Ev(2, ts(30), 1, "click", 1.0),
      Ev(3, ts(5), 1, "purchase", 2.0), Ev(4, ts(20), 1, "purchase", 3.0),
      Ev(5, ts(40), 1, "purchase", 4.0),
      // user 2: no state events at all → purchase stays unknown
      Ev(6, ts(15), 2, "purchase", 5.0))
      .toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = EventQueries.qStateAtEvent(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "unknown" -> ((2L, 700L)),   // t=5 (200c) + user 2 (500c)
      "view" -> ((1L, 300L)),
      "click" -> ((1L, 400L))))
    // conservation on the real corpus: every purchase lands exactly once
    val real = EventQueries.qStateAtEvent(spark, sf).collect()
    val nPurch = graft.util.Tables(spark, sf).events
      .filter(col("event_type") === "purchase").count()
    assert(real.map(_.getLong(1)).sum === nPurch)
  }

  private def ts(minute: Long): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  test("q_gini: zero for equal shares, hand-computed for a skewed " +
      "fixture, tie-order independent by construction") {
    // equal shares: users 1..4, two events each → gini exactly 0
    val equal = fixtureDir((1 to 4).flatMap(u =>
      Seq(ev(u * 10L, u.toLong, u.toLong, "a"),
        ev(u * 10L + 1, u + 10L, u.toLong, "a"))))
    val g0 = EventQueries.qGini(spark, equal).head()
    assert(g0.getLong(0) === 4L && g0.getLong(1) === 8L)
    assert(g0.getDouble(2) === 0.0)
    // skewed: counts [1,1,1,7] asc → S = 1+2+3+4·7 = 34, T = 10, n = 4
    // G = 2·34/(4·10) − 5/4 = 0.45
    val skew = fixtureDir(
      (1 to 7).map(i => ev(100L + i, i.toLong, 1L, "a")) ++
        Seq(ev(201, 1, 2L, "a"), ev(202, 1, 3L, "a"), ev(203, 1, 4L, "a")))
    val g1 = EventQueries.qGini(spark, skew).head()
    assert(g1.getLong(0) === 4L && g1.getLong(1) === 10L)
    assert(g1.getDouble(2) === 0.45)
  }

  test("q_seasonality: ISO dow mapping pinned; per-type shares fill 1e6 ppm " +
    "up to floor rounding") {
    // 1700000000000 ms = 2023-11-14 (Tuesday) UTC; +1d = Wednesday
    val dir = fixtureDir(Seq(
      ev(1, 0, 1, "click"), ev(2, 0, 2, "click"), // Tue
      ev(3, 1440, 1, "click"), // Wed
      ev(4, 2 * 1440, 1, "view"))) // Thu
    val got = EventQueries.qSeasonality(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("click", 2)) === ((2L, 666666L))) // Tuesday = ISO 2
    assert(got(("click", 3)) === ((1L, 333333L)))
    assert(got(("view", 4)) === ((1L, 1000000L)))
    // real corpus: every type's shares fill the million up to floor loss
    val real = EventQueries.qSeasonality(spark, sf).collect()
      .groupBy(_.getString(0))
    real.foreach { case (t, rows) =>
      val s = rows.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - 7, s"$t shares sum $s")
      rows.foreach(r => assert(r.getLong(4) === r.getLong(3) - 142857L))
    }
  }

  test("q_pareto: driver-side replay of the histogram-decomposed " +
    "heaviest-first curve") {
    import org.apache.spark.sql.functions._
    val counts = graft.util.Tables(spark, sf).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(_.getLong(1)).sorted.reverse
    val totE = counts.sum
    val totU = counts.length.toLong
    // replay over the (cnt -> n_users) histogram, heaviest first
    val hist = counts.groupBy(identity).map { case (c, xs) =>
      (c, xs.length.toLong) }.toSeq.sortBy(-_._1)
    var cumE = 0L; var cumU = 0L
    val shares = hist.map { case (c, n) =>
      cumE += c * n; cumU += n
      (cumE * 1000000L / totE, cumU * 1000000L / totU) }
    def cut(thr: Long): Long =
      shares.filter(_._1 >= thr).map(_._2).min
    val got = EventQueries.qPareto(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(50L -> cut(500000L), 80L -> cut(800000L),
      90L -> cut(900000L), 99L -> cut(990000L)))
    // monotone: more events need at least as many users
    assert(got(50L) <= got(80L) && got(80L) <= got(90L) &&
      got(90L) <= got(99L))
  }

  test("q_attribution_multi: equal split in integer micro-cents, " +
    "remainder to the latest touch, revenue conserved") {
    val dir = fixtureDirP(Seq(
      // user 1: three clicks (k=3,4,5) then a 1.00 purchase →
      // 100e6 micro / 3 = 33,333,333 each, remainder 1 to the LATEST
      // click (k=5)
      evp(1, 0, 1, "click", 0.0, k = 3),
      evp(2, 5, 1, "click", 0.0, k = 4),
      evp(3, 10, 1, "click", 0.0, k = 5),
      evp(4, 20, 1, "purchase", 1.0),
      // user 2: no click → -1 gets the full 2.00
      evp(5, 0, 2, "purchase", 2.0)))
    // revenue_micro reports as BIGINT (r9: the decimal escrow stays
    // internal — a raw decimal output column hashes differently in the
    // driver's arrow compare)
    val got = EventQueries.qAttributionMulti(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (-1L, 0L, 200000000L),
      (3L, 1L, 33333333L),
      (4L, 1L, 33333333L),
      (5L, 1L, 33333334L)))
    // conservation on the real corpus: credits sum back to the exact
    // purchase revenue in micro-cents — the property integer division
    // plus remainder-to-latest was chosen to guarantee
    import org.apache.spark.sql.functions._
    val micro = EventQueries.qAttributionMulti(spark, sf)
      .agg(sum(col("revenue_micro"))).head().getLong(0)
    val cents = EventQueries.attributionEvents(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("cents"))).head().getLong(0)
    assert(micro === cents * 1000000L)
  }

  test("q_skew_report: driver-side replay of top keys, ppm and salt factor") {
    import org.apache.spark.sql.functions._
    val counts = graft.util.Tables(spark, sf).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val nKeys = counts.length.toLong
    val want = counts.sortBy { case (u, c) => (-c, u) }.take(10)
      .map { case (u, c) =>
        (u, c, c * 1000000L / total,
          math.ceil(c.toDouble * nKeys / total).toLong) }
    val got = EventQueries.qSkewReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
    assert(got.forall(_._4 >= 1L), "salt factor is at least 1")
  }

  test("q_interval_join: bucketed overlap equi-join equals the naive " +
      "range join; every incident keeps its own session") {
    val got = EventQueries.qIntervalJoin(spark, sf).collect()
    // the error event itself lies inside one of its user's sessions,
    // so every incident overlaps >= 1 session and the inner join keeps
    // every error event as an output row
    val nErrors = graft.util.Tables(spark, sf).events
      .filter(col("event_type") === "error").count()
    assert(got.length === nErrors.toInt)
    assert(got.forall(r => r.getLong(1) >= 1L))
    // users never exceed sessions; overlap of a +/-300 s window is
    // bounded by n_sessions * 600 s
    assert(got.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(got.forall(r => r.getLong(3) >= 0L &&
      r.getLong(3) <= r.getLong(1) * 600L))
    // naive parity: rebuild sessions/incidents, overlap-join with the
    // raw theta predicate (fine at sf0.001), compare aggregate-exact
    val e = graft.util.Tables(spark, sf).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val prev = lag(col("es"), 1).over(w)
    val sess = e
      .withColumn("brk",
        when(prev.isNull || col("es") - prev > 1800L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("es")).as("start_s"), max(col("es")).as("end_s"))
    val inc = e.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        (col("es") - 300L).as("i_start"), (col("es") + 300L).as("i_end"))
    val naive = inc.join(sess,
        col("start_s") <= col("i_end") && col("i_start") <= col("end_s"))
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(least(col("end_s"), col("i_end")) -
          greatest(col("start_s"), col("i_start"))).as("overlap_s"))
      .orderBy(col("incident_id"))
      .collect()
    assert(naive.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq ===
      got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
  }
}

object EventSpec {
  /** Event with a props payload, for the attribution fixture. */
  final case class EvP(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)
}
