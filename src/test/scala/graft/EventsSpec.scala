package graft

import graft.queries.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))

  test("funnel: steps must occur strictly in order; partial funnels keep NULLs") {
    val events = ev(
      // user 1: full funnel in order
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"), (3L, 3000L, 1L, "purchase"),
      // user 2: click BEFORE the first view — not a funnel step
      (4L, 1000L, 2L, "click"), (5L, 2000L, 2L, "view"),
      // user 3: view then purchase with no click between — depth 1
      (6L, 1000L, 3L, "view"), (7L, 2000L, 3L, "purchase"),
      // user 4: never viewed — excluded entirely
      (8L, 1000L, 4L, "purchase"))
    val out = Events.qFunnel(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("depth")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("pattern funnel extracts concrete matches; an error between blocks, before doesn't") {
    val events = ev(
      // user 1: view, 2 clicks, purchase — one match with n_clicks = 2
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "click"), (4L, 4000L, 1L, "purchase"),
      // user 2: error BETWEEN the view and the purchase — blocked
      (5L, 1000L, 2L, "view"), (6L, 2000L, 2L, "click"),
      (7L, 3000L, 2L, "error"), (8L, 4000L, 2L, "purchase"),
      // user 3: error BEFORE the view — does not block; 1 click
      (9L, 1000L, 3L, "error"), (10L, 2000L, 3L, "view"),
      (11L, 3000L, 3L, "click"), (12L, 4000L, 3L, "purchase"),
      // user 4: view then purchase with NO click — no match (click+ required)
      (13L, 1000L, 4L, "view"), (14L, 2000L, 4L, "purchase"),
      // user 5: two views; the MOST RECENT qualifying view anchors
      (15L, 1000L, 5L, "view"), (16L, 2000L, 5L, "click"),
      (17L, 3000L, 5L, "view"), (18L, 4000L, 5L, "click"),
      (19L, 5000L, 5L, "purchase"))
    val out = Events.qPatternFunnel(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 4L, 2L),   // user 1: view 1 → purchase 4, 2 clicks
      (3L, 10L, 12L, 1L), // user 3: prior error ignored
      (5L, 17L, 19L, 1L)  // user 5: anchored at the LATEST view; 1 click after it
    ))
  }

  test("funnel picks the FIRST valid completion of each step") {
    val events = ev(
      (1L, 1000L, 1L, "view"), (2L, 5000L, 1L, "click"),
      (3L, 9000L, 1L, "click"), // later click ignored
      (4L, 7000L, 1L, "purchase")) // after first click → counts
    val r = Events.qFunnel(events).collect().head
    assert(r.getAs[java.sql.Timestamp]("t_click").getTime == 0L + 5L) // 5000 µs = 5 ms
    assert(r.getAs[Long]("depth") == 3L)
  }

  test("pivot: fixed event-type columns, zero-filled for absent combos") {
    val events = ev(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "view"), (3L, 3000L, 1L, "click"),
      (4L, 1000L, 2L, "error"))
    val out = Events.qPivot(events).collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L))
    val u1 = out.head
    assert(u1.getAs[Long]("n_view") == 2L && u1.getAs[Long]("n_click") == 1L)
    assert(u1.getAs[Long]("n_purchase") == 0L) // absent combo → 0, not null
    assert(out(1).getAs[Long]("n_error") == 1L && out(1).getAs[Long]("n_view") == 0L)
  }

  test("moving window: 4-row trailing frame sums and means") {
    val events = Seq(
      (1L, 1000L, 1L, "view", 1.0), (2L, 2000L, 1L, "view", 2.0),
      (3L, 3000L, 1L, "view", 3.0), (4L, 4000L, 1L, "view", 4.0),
      (5L, 5000L, 1L, "view", 5.0))
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
    val out = Events.qMovingAvg(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("mov_sum"), r.getAs[Long]("mov_n"), r.getAs[Double]("mov_avg"))).toMap
    assert(out(1L) == (1.0, 1L, 1.0))
    assert(out(4L) == (10.0, 4L, 2.5))   // full frame 1+2+3+4
    assert(out(5L) == (14.0, 4L, 3.5))   // frame slides: 2+3+4+5
  }

  test("retention counts distinct users per cohort-day offset") {
    val day = 86400000000L
    val events = ev(
      // user 1 signs up day 0, active day 0 and day 2
      (1L, 0L, 1L, "signup"), (2L, 2 * day + 5L, 1L, "click"),
      // user 2 signs up day 0, active day 2 as well
      (3L, 10L, 2L, "signup"), (4L, 2 * day + 9L, 2L, "view"),
      // user 3 signs up day 1 only
      (5L, day + 3L, 3L, "signup"),
      // user 4 never signs up → not in any cohort
      (6L, 7L, 4L, "view"))
    val out = Events.qRetention(events).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 2L) -> 2L, (1L, 0L) -> 1L))
  }

  private val H = 3600000000L // one hour in µs

  test("resample: gaps fill with zeros, LOCF carries the last mean, NULL before first obs") {
    val events = ev(
      // type a: observations in hours 0 and 2 of a 0..2 span; hour 1 is a gap
      (1L, 0L, 1L, "a"), (2L, 1000L, 1L, "a"), (3L, 2 * H, 1L, "a"),
      // type b: only hour 1 — hours 0 and 2 are gaps (NULL locf before first)
      (4L, H + 5L, 2L, "b"))
    val out = Events.qResample(events).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime / 3600000L,
        r.getLong(2), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    val a = out.filter(_._1 == "a").map(t => (t._2, t._3, t._4)).toSeq
    val b = out.filter(_._1 == "b").map(t => (t._2, t._3, t._4)).toSeq
    assert(a == Seq((0L, 2L, 1.0), (1L, 0L, 1.0), (2L, 1L, 1.0)))
    assert(b(0)._2 == 0L && b(0)._3.isNaN)        // gap BEFORE first obs: no carry
    assert(b(1) == (1L, 1L, 1.0))
    assert(b(2)._2 == 0L && b(2)._3 == 1.0)       // gap after: carried forward
  }

  test("anomaly: a planted spike is flagged; a flat series is not") {
    // type flat: one event per hour for 12 hours; type spiky: same but
    // hour 6 has 40 events — far beyond 3 sigma
    val flat = (0 until 12).map(h => (100L + h, h * H, 1L, "flat"))
    val spiky = (0 until 12).map(h => (200L + h, h * H, 2L, "spiky")) ++
      (0 until 39).map(i => (300L + i, 6 * H + i, 2L, "spiky"))
    val out = Events.qAnomaly(ev((flat ++ spiky).map(t => (t._1, t._2, t._3, t._4)): _*))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L))
    assert(out.toSeq == Seq(("spiky", 6L)))
  }

  test("streaming anomaly: foreachBatch-merged hourly counts flag identically to batch") {
    // same spike scenario, arriving as two micro-batches split by id
    // parity — hourly counts are associative, so the merged state must
    // flag exactly what one batch pass over everything flags
    val rows = (0 until 12).map(h => (100L + h, h * H, 1L, "flat")) ++
      (0 until 12).map(h => (200L + h, h * H, 2L, "spiky")) ++
      (0 until 39).map(i => (300L + i, 6 * H + i, 2L, "spiky"))
    val all = ev(rows: _*)
    val dir = java.nio.file.Files.createTempDirectory("graft-anom-stream")
    all.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/b0.parquet")
    all.filter(col("event_id") % 2 === 1).write.parquet(s"$dir/b1.parquet")

    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*.parquet")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val h = Events.hourlyCounts(batch)
        state = Some(state.fold(h)(prev =>
          prev.unionByName(h).groupBy("hb", "event_type")
            .agg(sum(col("x")).as("x"))))
        state.foreach(s => { s.persist().count(); () }) // bound lineage per batch
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = Events.anomalyFromHourly(state.get).collect().toSeq
    val batch = Events.qAnomaly(all).collect().toSeq
    assert(streamed == batch)
    assert(streamed.map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L)) ==
      Seq(("spiky", 6L)))

    // the smoother shares the mergeable-hourly seam: the same merged
    // state must smooth identically to one batch pass
    val smoothedStream = Events.ewmaFromHourly(state.get).collect().toSeq
    val smoothedBatch = Events.qEwma(all).collect().toSeq
    assert(smoothedStream == smoothedBatch)

    // and so does the seasonal-adjusted detector — third consumer of
    // the same mergeable hourly seam
    val seasonalStream = Events.seasonalAnomalyFromHourly(state.get).collect().toSeq
    val seasonalBatch = Events.qSeasonalAnomaly(all).collect().toSeq
    assert(seasonalStream == seasonalBatch)
  }

  test("concurrency sweep: overlaps counted, touching sessions are NOT concurrent") {
    val m = 60L * 1000000L // one minute in µs
    // user 1: session [0, 10m]; user 2: [5m, 15m] (overlaps 1);
    // user 3: [15m, 20m] (starts exactly when 2 ends — not concurrent);
    // sessions are single-user runs of events < 30 min apart
    val events = ev(
      (1L, 0L, 1L, "view"), (2L, 10 * m, 1L, "view"),
      (3L, 5 * m, 2L, "view"), (4L, 15 * m, 2L, "view"),
      (5L, 15 * m, 3L, "view"), (6L, 20 * m, 3L, "view"))
    val r = Events.qConcurrency(events).collect().head
    assert(r.getAs[Long]("peak_concurrency") == 2L)
    assert(r.getAs[Long]("t_peak_us") == 5 * m) // the first overlapping instant
    assert(r.getAs[Long]("n_sessions") == 3L)
  }

  test("ewma: dyadic weights, partial-horizon normalization, exact integer lattice") {
    val h = 3600L * 1000000L // one hour in µs
    // type "a": counts 1, 3, 5 in consecutive hours
    val events = ev(
      (1L, 0L, 1L, "a"),
      (2L, h, 1L, "a"), (3L, h + 1L, 1L, "a"), (4L, h + 2L, 1L, "a"),
      (5L, 2 * h, 1L, "a"), (6L, 2 * h + 1L, 1L, "a"), (7L, 2 * h + 2L, 1L, "a"),
      (8L, 2 * h + 3L, 1L, "a"), (9L, 2 * h + 4L, 1L, "a"))
    val out = Events.qEwma(events).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("ewma_num"),
        r.getAs[Long]("ewma_den"), r.getAs[Double]("ewma")))
    // weights 256, 128, 64 over the available lags
    assert(out(0) == ((1L, 256L, 256L, 1.0)))
    assert(out(1) == ((3L, 3 * 256L + 128L, 384L, 896.0 / 384.0)))
    assert(out(2) == ((5L, 5 * 256L + 3 * 128L + 64L, 448L, 1728.0 / 448.0)))
  }

  test("seasonal profile: planted peak hour ranks first; gap hours drag the mean") {
    val h = 3600L * 1000000L
    // two days: hour-of-day 2 gets 3 events/day, hod 0 gets 1, hod 1 none
    val rows = Seq(0, 24).flatMap { d =>
      Seq((d * 10L + 1, d * h, 1L, "a")) ++
        (0 until 3).map(i => (d * 10L + 2 + i, (d + 2) * h + i, 1L, "a"))
    }
    // span both days fully so each hod has 2 observed hours
    val events = ev((rows :+ ((999L, 47 * h, 1L, "a"))): _*)
    val out = Events.qSeasonal(events).collect()
      .map(r => r.getAs[Long]("hod") -> (r.getAs[Long]("n_hours"), r.getAs[Long]("sx"),
        r.getAs[Long]("mean_micro"), r.getAs[Long]("rank_in_type"))).toMap
    assert(out(2L) == ((2L, 6L, 3000000L, 1L))) // the peak slot
    assert(out(1L)._2 == 0L && out(1L)._3 == 0L) // gap hours are real zeros
    assert(out(0L)._3 == 1000000L)
    assert(out.size == 24)
  }

  test("ewma of a constant series is the constant, at every horizon depth") {
    val h = 3600L * 1000000L
    val events = ev((1 to 12).map(i => (i.toLong, i * h, 1L, "c")): _*)
    val out = Events.qEwma(events).collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[Double]("ewma") == 1.0))
  }

  test("transitions: pair counts per user sequence, exact floor-ppm shares") {
    val events = ev(
      // user 1: view → click → purchase
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"), (3L, 3000L, 1L, "purchase"),
      // user 2: view → view → click
      (4L, 1000L, 2L, "view"), (5L, 2000L, 2L, "view"), (6L, 3000L, 2L, "click"))
    val out = Events.qTransitions(events).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("share_ppm"))).toMap
    assert(out == Map(
      ("view", "click") -> ((2L, 666666L)), // floor ppm, not rounded
      ("view", "view") -> ((1L, 333333L)),
      ("click", "purchase") -> ((1L, 1000000L))))
  }

  test("attribution: first/last preceding touch per purchase; no-touch purchases keep NULLs") {
    val events = ev(
      // user 1: view, click, purchase → first=view, last=click
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"), (3L, 3000L, 1L, "purchase"),
      // user 2: purchase with no preceding touch
      (4L, 1000L, 2L, "purchase"),
      // user 3: click, purchase, view, purchase → 2nd purchase sees last=view
      (5L, 1000L, 3L, "click"), (6L, 2000L, 3L, "purchase"),
      (7L, 3000L, 3L, "view"), (8L, 4000L, 3L, "purchase"))
    val out = Events.qAttribution(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("first_touch"), r.getAs[String]("last_touch"))).toMap
    assert(out == Map(
      3L -> (("view", "click")),
      4L -> ((null, null)),
      6L -> (("click", "click")),
      8L -> (("click", "view"))))
  }

  test("cusum: a sustained mean shift is flagged; flat and pre-shift hours are not") {
    val h = 3600L * 1000000L
    // type "a": 40 quiet hours (x=2) then 20 elevated hours (x=8);
    // type "b": flat x=2 throughout (zero variance → never flags)
    val rows = (0 until 60).flatMap { t =>
      val na = if (t < 40) 2 else 8
      (0 until na).map(i => (t * 100L + i, t * h + i, 1L, "a")) ++
        (0 until 2).map(i => (t * 100L + 50 + i, t * h + i, 2L, "b"))
    }
    val out = Events.qCusum(ev(rows: _*)).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("x")))
    assert(out.nonEmpty, "the planted shift must flag")
    assert(out.forall(_._1 == "a"), s"flat series must stay silent: ${out.toSeq}")
    assert(out.forall(_._2 == 8L), "only elevated hours accumulate past 5 sigma")
  }

  test("windowed funnel: a step outside its 48h window breaks the chain") {
    val h = 3600L * 1000000L
    val events = ev(
      // user 1: view, click +1h, purchase +1h — full depth
      (1L, 0L, 1L, "view"), (2L, h, 1L, "click"), (3L, 2 * h, 1L, "purchase"),
      // user 2: click arrives 49h after the view — depth stays 1
      (4L, 0L, 2L, "view"), (5L, 49 * h, 2L, "click"),
      // user 3: click in-window, purchase 49h after the click — depth 2
      (6L, 0L, 3L, "view"), (7L, h, 3L, "click"), (8L, 50 * h, 3L, "purchase"))
    val out = Events.qFunnelWindowed(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("depth")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("autocorr: an alternating series has acf(1) = -1 and acf(2) = +1 exactly") {
    val h = 3600L * 1000000L
    // hourly counts 1,3,1,3,… over hours 0..24: one event in even
    // hours, three in odd hours
    val rows = (0 to 24).flatMap { t =>
      val n = if (t % 2 == 0) 1 else 3
      (0 until n).map(i => (t * 10L + i, t * h + i, 1L, "a"))
    }
    val out = Events.qAutocorr(ev(rows: _*)).collect()
      .map(r => r.getAs[Long]("lag_k") -> r.getAs[Double]("acf")).toMap
    assert(out(1L) == -1.0) // perfect anti-correlation at odd lag
    assert(out(2L) == 1.0)  // perfect correlation at the period
    assert(out(3L) == -1.0)
  }

  test("ks test: identical cohorts give D = 0, disjoint cohorts give D = 1") {
    def purchases(rows: (Long, Long, Double)*) =
      rows.zipWithIndex.map { case ((uid, us, v), i) => (i.toLong, us, uid, v) }
        .toDF("event_id", "us", "user_id", "value")
        .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
          col("user_id"), lit("purchase").as("event_type"), col("value"),
          lit("{}").as("props"))
    // even/odd users with IDENTICAL spend multisets {1.00, 2.00}
    val same = purchases((0L, 0L, 1.0), (2L, 0L, 2.0), (1L, 0L, 1.0), (3L, 0L, 2.0))
    val r1 = Events.qKsTest(same).collect().head
    assert(r1.getAs[Long]("d_scaled") == 0 && !r1.getAs[Boolean]("reject_95"))
    // disjoint supports: evens spend 1.00, odds spend 100.00 → D = 1
    val apart = purchases(
      (0L, 0L, 1.0), (2L, 0L, 1.0), (4L, 0L, 1.0), (6L, 0L, 1.0),
      (8L, 0L, 1.0), (10L, 0L, 1.0), (12L, 0L, 1.0), (14L, 0L, 1.0),
      (1L, 0L, 100.0), (3L, 0L, 100.0), (5L, 0L, 100.0), (7L, 0L, 100.0),
      (9L, 0L, 100.0), (11L, 0L, 100.0), (13L, 0L, 100.0), (15L, 0L, 100.0))
    val r2 = Events.qKsTest(apart).collect().head
    assert(r2.getAs[Long]("d_ppm") == 1000000L)
    assert(r2.getAs[Long]("d_at_cents") == 100L) // first cents value where the gap peaks
    assert(r2.getAs[Boolean]("reject_95")) // n=8 vs 8, D=1 ≫ 1.358·√(1/4)
  }

  test("anova: hand-computed F and eta², degenerate cases NULL-guarded") {
    def evv(rows: (Long, String, Double)*) =
      rows.zipWithIndex.map { case ((uid, t, v), i) => (i.toLong, uid, t, v) }
        .toDF("event_id", "user_id", "event_type", "value")
        .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
          col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
    // a: {1, 3}, b: {2, 4} → SSB = 1, SSW = 4 (value²) → F = 0.5, eta² = 0.2
    val r = Events.qAnova(evv((1L, "a", 1.0), (2L, "a", 3.0),
      (3L, "b", 2.0), (4L, "b", 4.0))).collect().head
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("f_stat") == 0.5)
    assert(r.getAs[Long]("eta2_ppm") == 200000L)
    // zero within-variance → F undefined (NULL), eta² = 1
    val sep = Events.qAnova(evv((1L, "a", 1.0), (2L, "a", 1.0),
      (3L, "b", 2.0), (4L, "b", 2.0))).collect().head
    assert(sep.isNullAt(2) && sep.getAs[Long]("eta2_ppm") == 1000000L)
    // all values identical → both NULL
    val flat = Events.qAnova(evv((1L, "a", 1.0), (2L, "b", 1.0))).collect().head
    assert(flat.isNullAt(2) && flat.isNullAt(3))
  }

  test("permutation test: identical cohorts give p = 1, extreme separation small p") {
    def purch(rows: (Long, Double)*) =
      rows.zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) }
        .toDF("event_id", "user_id", "value")
        .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
          col("user_id"), lit("purchase").as("event_type"), col("value"),
          lit("{}").as("props"))
    // all users identical → obs diff 0, every null diff ≥ 0 → p = 1
    val same = Events.qPermutation(purch((1L to 40L).map(u => (u, 3.0)): _*))
      .collect().head
    assert(same.getAs[Long]("obs_diff_micro") == 0)
    assert(same.getAs[Long]("p_ppm") == 1000000L)
    // evens spend 100, odds 1 → |obs| huge; random bit-splits mix the
    // two populations so few null diffs reach it → small p (never 0
    // by the add-one convention)
    val apart = Events.qPermutation(
      purch((1L to 40L).map(u => (u, if (u % 2 == 0) 100.0 else 1.0)): _*))
      .collect().head
    val p = apart.getAs[Long]("p_ppm")
    assert(p >= 40000L && p <= 200000L, s"p_ppm $p") // 1/25 floor ≤ p ≤ a few/25
  }

  test("spearman: monotone spend-activity is rho 1, inverted -1, constant NULL") {
    def mk(rows: (Long, Int, Double)*) = // (user, n events, per-event purchase value)
      rows.flatMap { case (u, k, v) => (1 to k).map(i => (u * 100 + i, u, v)) }
        .zipWithIndex.map { case ((eid, u, v), i) => (i.toLong, u, v) }
        .toDF("event_id", "user_id", "value")
        .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
          col("user_id"), lit("purchase").as("event_type"), col("value"),
          lit("{}").as("props"))
    // user u makes u events of 1.00 each → spend rank ≡ activity rank
    val mono = Events.qSpearman(mk((1L, 1, 1.0), (2L, 2, 1.0), (3L, 3, 1.0),
      (4L, 4, 1.0))).collect().head
    assert(mono.getAs[Double]("rho") == 1.0)
    // more active users spend LESS per event so total spend inverts
    val inv = Events.qSpearman(mk((1L, 1, 8.0), (2L, 2, 2.0), (3L, 4, 0.5)))
      .collect().head
    assert(inv.getAs[Double]("rho") == -1.0)
    // identical users → zero rank variance → NULL-guarded
    val flat = Events.qSpearman(mk((1L, 2, 1.0), (2L, 2, 1.0))).collect().head
    assert(flat.isNullAt(1))
  }

  test("winsorize: hand-computed clamp at the 5th/95th order statistics") {
    def evv(rows: (Long, Double)*) =
      rows.zipWithIndex.map { case ((uid, v), i) => (i.toLong, uid, v) }
        .toDF("event_id", "user_id", "value")
        .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
          col("user_id"), lit("x").as("event_type"), col("value"), lit("{}").as("props"))
    // values 0.01 .. 1.00 → cents 1..100; cuts at ranks 5 and 95
    val r = Events.qWinsorize(evv((1 to 100).map(i => (i.toLong, i / 100.0)): _*))
      .collect().head
    assert(r.getAs[Long]("lo_c") == 5 && r.getAs[Long]("hi_c") == 95)
    assert(r.getAs[Long]("n_low") == 4 && r.getAs[Long]("n_high") == 5)
    // wsum = 4·5 + Σ(5..95) + 5·95 = 5045 → mean 50.45 cents
    assert(r.getAs[Long]("wmean_micro") == 504500L)
  }

  test("bootstrap: constant spend collapses every replicate to the point estimate") {
    def purch(uids: Long*) =
      uids.zipWithIndex.map { case (u, i) => (i.toLong, u, 2.0) }
        .toDF("event_id", "user_id", "value")
        .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
          col("user_id"), lit("purchase").as("event_type"), col("value"),
          lit("{}").as("props"))
    val r = Events.qBootstrap(purch(1L to 50L: _*)).collect().head
    assert(r.getAs[Long]("est_micro") == 2000000L)
    assert(r.getAs[Long]("boot_lo_micro") == 2000000L)
    assert(r.getAs[Long]("boot_hi_micro") == 2000000L)
    assert(r.getAs[Long]("n_replicates") == 24)
  }

  test("bootstrap: Binomial(2,1/2) half-width tracks 1/sqrt2 of a true multinomial bootstrap") {
    // the documented Poissonization contract: weight variance 1/2 vs the
    // multinomial bootstrap's ~1 understates CI half-width by ~sqrt(2).
    // Measure it at small n against a seeded true multinomial resample.
    val n = 400
    val cents = (0 until n).map(i => ((i.toLong * 37L) % 1000L) + 1L)
    val rows = cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, i.toLong, c.toDouble / 100.0)
    }.toDF("event_id", "user_id", "value")
      .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
        col("user_id"), lit("purchase").as("event_type"), col("value"),
        lit("{}").as("props"))
    val r = Events.qBootstrap(rows).collect().head
    val est = r.getAs[Long]("est_micro")
    val hashHw = (r.getAs[Long]("boot_hi_micro") - r.getAs[Long]("boot_lo_micro")) / 2.0
    // true multinomial bootstrap, driver-side, fixed seed: B replicate
    // means of n draws with replacement, then the same 5%/95% cut
    val rnd = new scala.util.Random(42)
    val reps = Seq.fill(2000) {
      var s = 0L
      var k = 0
      while (k < n) { s += cents(rnd.nextInt(n)); k += 1 }
      s * 10000L / n
    }.sorted
    val multiHw = (reps(1899) - reps(100)) / 2.0
    val ratio = hashHw / multiHw
    // expected ~0.71; generous-but-binding band (deterministic: hash
    // weights and the seed are both fixed)
    assert(ratio > 0.45 && ratio < 1.0,
      s"half-width ratio $ratio outside the Poissonization contract band " +
        s"(hash=$hashHw multinomial=$multiHw)")
    assert(r.getAs[Long]("boot_lo_micro") <= est && est <= r.getAs[Long]("boot_hi_micro"))
  }

  test("mann-whitney: dominance gives U share 1, ties 1/2, zero variance NULL") {
    def purchases(rows: (Long, Double)*) =
      rows.zipWithIndex.map { case ((uid, v), i) => (i.toLong, uid, v) }
        .toDF("event_id", "user_id", "value")
        .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
          col("user_id"), lit("purchase").as("event_type"), col("value"),
          lit("{}").as("props"))
    // evens spend 2.00, odds 1.00 → every cohort-0 value above cohort-1
    val dom = Events.qMannWhitney(purchases(
      (0L, 2.0), (2L, 2.0), (1L, 1.0), (3L, 1.0))).collect().head
    assert(dom.getAs[Long]("u_x2") == 8 && dom.getAs[Long]("u_share_ppm") == 1000000L)
    // all spend equal → U share 1/2, tie-corrected variance 0 → z NULL
    val tied = Events.qMannWhitney(purchases(
      (0L, 1.0), (2L, 1.0), (1L, 1.0), (3L, 1.0))).collect().head
    assert(tied.getAs[Long]("u_share_ppm") == 500000L && tied.isNullAt(4))
  }

  test("kruskal: hand-computed H without ties, all-tied NULL-guarded") {
    def evv(rows: (Long, String, Double)*) =
      rows.zipWithIndex.map { case ((uid, t, v), i) => (i.toLong, uid, t, v) }
        .toDF("event_id", "user_id", "event_type", "value")
        .select(col("event_id"), expr("timestamp_micros(0)").as("ts"),
          col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
    // a: {1, 2}, b: {3, 4} → ranks {1,2} vs {3,4}, R=3/7 →
    // H = 12/20 · (9/2 + 49/2) − 15 = 2.4 (no ties → correction 1)
    val r = Events.qKruskal(evv((1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "b", 3.0), (4L, "b", 4.0))).collect().head
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("h_stat") == 2.4)
    // every value tied → tie correction 0 → NULL
    val flat = Events.qKruskal(evv((1L, "a", 1.0), (2L, "b", 1.0),
      (3L, "b", 1.0))).collect().head
    assert(flat.isNullAt(2))
  }

  test("survival: hand-built KM curve with one honestly-censored session") {
    val s = 1000000L
    // u1, u2: 10 s sessions; u3: 20 s; u99 ends AT the horizon → its
    // 15 s session is censored (within the 30-min gap of max t_end)
    val events = ev(
      (1L, 0L, 1L, "a"), (2L, 10L * s, 1L, "a"),
      (3L, 0L, 2L, "a"), (4L, 10L * s, 2L, "a"),
      (5L, 0L, 3L, "a"), (6L, 20L * s, 3L, "a"),
      (7L, 4000L * s, 99L, "a"), (8L, 4015L * s, 99L, "a"))
    val rows = Events.qSurvival(events).collect()
    // censoring-only duration 15 emits no row; event times 10 and 20 do
    assert(rows.map(_.getAs[Long]("dur_s")).toSeq == Seq(10L, 20L))
    val at10 = rows(0)
    assert(at10.getAs[Long]("n_risk") == 4 && at10.getAs[Long]("n_events") == 2)
    // S(10) = 1 − 2/4 = 0.5 exactly (one ln term, nano-lattice round-trip)
    assert(math.abs(at10.getAs[Long]("surv_ppm") - 500000L) <= 1)
    val at20 = rows(1)
    // after 2 deaths and the censored 15 s session leave, one at risk
    assert(at20.getAs[Long]("n_risk") == 1 && at20.getAs[Long]("n_censored") == 0)
    assert(at20.getAs[Long]("surv_ppm") == 0) // d = n at the last time → S pinned 0
  }
}
