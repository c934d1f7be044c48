package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Regular-grid resampling + LOCF gap fill and the dual gap report
  * (q161/q162). Step = 10 µs so buckets are readable integers.
  */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts-µs, value): key "a" observes buckets 0, 1, 4 (gap 2–3) with
  // two events in bucket 1 (latest wins); key "b" observes only bucket 2.
  private def events = Seq(
    ("a", 3L, 1.0), ("a", 12L, 2.0), ("a", 17L, 3.0), ("a", 41L, 4.0),
    ("b", 25L, 9.0)
  ).toDF("k", "tus", "v").withColumn("ts", timestamp_micros(col("tus")))

  test("resampleLocf: grid spans min..max, latest-in-bucket wins, gaps carry forward") {
    val out = Timeseries.resampleLocf(events, "k", "ts", "v", stepUs = 10L)
      .orderBy("k", "bkt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    out.toSeq shouldBe Seq(
      ("a", 0L, 0L, 1.0, false),
      ("a", 1L, 10L, 3.0, false), // 17 µs beats 12 µs inside bucket 1
      ("a", 2L, 20L, 3.0, true),  // gap: carried forward
      ("a", 3L, 30L, 3.0, true),
      ("a", 4L, 40L, 4.0, false),
      ("b", 2L, 20L, 9.0, false)) // single-bucket key: 1-cell grid
  }

  test("resampleLocf: tie on ts resolves by value — deterministic") {
    val tied = Seq(("a", 5L, 1.0), ("a", 5L, 7.0))
      .toDF("k", "tus", "v").withColumn("ts", timestamp_micros(col("tus")))
    Timeseries.resampleLocf(tied, "k", "ts", "v", stepUs = 10L)
      .collect().map(_.getDouble(3)).toSeq shouldBe Seq(7.0)
  }

  test("gapReport: run structure of the missing buckets") {
    val out = Timeseries.gapReport(events, "k", "ts", stepUs = 10L)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // a: buckets 0..4 = 5, missing {2,3} = one run of 2; b: dense single
    out.toSeq shouldBe Seq(("a", 5L, 2L, 1L, 2L), ("b", 1L, 0L, 0L, 0L))
  }

  test("rollingMedian: exact frame medians, odd and even window sizes") {
    val series = Seq(("a", 0L, 1.0), ("a", 1L, 100.0), ("a", 2L, 2.0),
      ("a", 3L, 3.0), ("a", 4L, 4.0)).toDF("k", "bkt", "v")
    val got = Timeseries.rollingMedian(series, "k", "bkt", "v", 1)
      .orderBy("bkt").collect().map(_.getDouble(3))
    // frames: [1,100]→50.5, [1,100,2]→2, [100,2,3]→3, [2,3,4]→3, [3,4]→3.5
    got.toSeq shouldBe Seq(50.5, 2.0, 3.0, 3.0, 3.5)
    // the outlier bucket (100) never drags its neighbors' medians
    got.count(_ > 10.0) shouldBe 0 +- 1
  }

  test("ewmaLevel ≡ driver-side left fold, order-insensitive input") {
    val vals = Seq(3.0, 7.5, 1.25, 9.0, 4.5, 2.0)
    // feed shuffled: the collected array sorts by bkt before folding
    val rows = vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
    val df = scala.util.Random.shuffle(rows).toDF("k", "bkt", "v")
    val got = Timeseries.ewmaLevel(df, "k", "bkt", "v", alphaDen = 8)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    val ref = vals.tail.foldLeft(vals.head)((s, x) => s + (x - s) / 8.0)
    got shouldBe ((6L,
      BigDecimal(ref).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("gapReport ≡ resampleLocf's filled flags") {
    val rs = Timeseries.resampleLocf(events, "k", "ts", "v", stepUs = 10L)
    val fromGrid = rs.groupBy("k").agg(
      count(lit(1)).as("n_buckets"),
      sum(when(col("filled"), 1L).otherwise(0L)).as("n_missing"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rep = Timeseries.gapReport(events, "k", "ts", stepUs = 10L)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    fromGrid.toSeq shouldBe rep.toSeq
  }

  test("sequentialFunnel: chained strictly-after stages; order matters past two stages") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    // user 1 completes A→B→C in order; user 2 has C BEFORE B (global
    // first-C precedes first-B — the case a q51-style independent
    // first-occurrence comparison mislabels); user 3 drops after A;
    // user 4 never does A (excluded entirely).
    val ev = Seq(
      (1L, "A", 1000000L), (1L, "B", 2000000L), (1L, "C", 3000000L),
      (2L, "A", 1000000L), (2L, "C", 1500000L), (2L, "B", 2000000L),
      (2L, "C", 2500000L), // a later C AFTER B: stage 3 must pick this
      (3L, "A", 4000000L),
      (4L, "B", 1000000L), (4L, "C", 2000000L))
      .map { case (u, t, us) => (u, t, ts(us)) }
      .toDF("user_id", "event_type", "ts")
    val out = Timeseries.sequentialFunnel(ev, "user_id", "ts",
      "event_type", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((Some(1000000L), Some(2000000L), Some(3000000L), 3L))
    // user 2: the pre-B C is skipped, the post-B C completes the funnel
    out(2L) shouldBe ((Some(1000000L), Some(2000000L), Some(2500000L), 3L))
    out(3L) shouldBe ((Some(4000000L), None, None, 1L))
    // strictness: a stage-2 event exactly AT t1 does not count
    val tie = Seq((9L, "A", ts(1000000L)), (9L, "B", ts(1000000L)))
      .toDF("user_id", "event_type", "ts")
    Timeseries.sequentialFunnel(tie, "user_id", "ts", "event_type",
      Seq("A", "B")).collect().head.getLong(3) shouldBe 1L
  }

  test("kaplanMeier: right-censoring, cohort split, and the running product") {
    val day = 86400000000L
    // u1: view@0, purchase@1.5d → day-1 event.  u2: view@0, never
    // purchases → censored at the global max (8.2d → day 8).  u3:
    // view@0, purchase AT t0 (not strictly after) → censored too.
    // u4: view@8d (NEXT week's cohort), purchase@8.2d (the global max)
    // → day-0 event.  u5: purchase only, no view → excluded.
    val ev = Seq(
      ("u1", "view", 0L), ("u1", "purchase", 129600000000L),
      ("u2", "view", 0L),
      ("u3", "view", 0L), ("u3", "purchase", 0L),
      ("u4", "view", 8L * day), ("u4", "purchase", 708480000000L),
      ("u5", "purchase", day))
      .toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Timeseries.kaplanMeier(ev, "user_id", "ts", "event_type",
      "view", "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // cohorts: 1970-01-01 (Thu) → Mon 1969-12-29 = -3d;
    //          1970-01-09 (Fri) → Mon 1970-01-05 = +4d
    val w0 = -3L * day; val w1 = 4L * day
    out.keySet shouldBe Set((w0, 1L), (w0, 8L), (w1, 0L))
    // day 1: 3 at risk, 1 event → S = 1 - 1/3; day 8: 2 at risk, both
    // censored → S carries (censored users were AT RISK through day 8)
    out((w0, 1L)) shouldBe ((3L, 1L, 0L, 0.666667))
    out((w0, 8L)) shouldBe ((2L, 0L, 2L, 0.666667))
    // u4 converts on its cohort's first observed day → S drops to 0
    out((w1, 0L)) shouldBe ((1L, 1L, 0L, 0.0))
  }
}
