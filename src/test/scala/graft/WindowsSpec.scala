package graft

import org.apache.spark.sql.functions._

import graft.operators.Windows

class WindowsSpec extends SparkSpec {
  import GamingFixture._

  lazy val events = {
    import spark.implicits._
    spark.createDataset(GamingFixture.events).toDF()
  }
  lazy val registrations = events.filter(col("event_type") === "PlayerRegistered")

  test("tumbling 3s counts match the reference fixture expectation") {
    // reference: WindowFunctions.scala:51-52 — [0,3)→1, [3,6)→3, [6,9)→2
    val got = Windows.tumblingCount(registrations, "event_time", "3 seconds")
      .collect().map(r => (r.getLong(0) - base.getEpochSecond, r.getLong(1))).toMap
    assert(got === Map(0L -> 1L, 3L -> 3L, 6L -> 2L))
  }

  test("keyed tumbling count partitions by key") {
    val got = Windows.keyedTumblingCount(events, "event_type", "event_time", "3 seconds")
      .collect().map(r => ((r.getString(0), r.getLong(1) - base.getEpochSecond), r.getLong(2))).toMap
    assert(got(("PlayerRegistered", 3L)) === 3L)
    assert(got(("PlayerOnline", 3L)) === 3L) // online at 3,4,5
    assert(got(("PlayerOnline", 9L)) === 1L) // online at 10
  }

  test("custom Aggregator conditional count equals built-in count(when)") {
    val got = Windows.tumblingCondCount(events, "event_time", "3 seconds", "PlayerRegistered")
      .collect().map(r => (r.getLong(0) - base.getEpochSecond, r.getLong(1))).toMap
    // windows over ALL 12 events; conditional count tracks registrations only
    assert(got === Map(0L -> 1L, 3L -> 3L, 6L -> 2L, 9L -> 0L))
  }

  test("sliding windows: every event lands in exactly size/slide windows") {
    val perWindow = Windows.slidingCount(registrations, "event_time", "3 seconds", "1 second")
    val total = perWindow.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === registrations.count() * 3) // 3s/1s → 3 windows per event
  }

  test("session windows merge events within gap (inclusive at the boundary)") {
    // registrations at 2,3,4,4,6,8 with 2s gap: Spark merges an event at
    // exactly last+gap (4→6 and 6→8 both merge) → one session of 6
    val sessions = Windows.keyedSessionCount(
      registrations.withColumn("k", lit(1)), "k", "event_time", "2 seconds")
      .collect().map(r => r.getLong(3)).sorted
    assert(sessions.toSeq === Seq(6L))
  }

  test("session window boundary: exactly last+gap merges, beyond splits") {
    import spark.implicits._
    val merged = Seq(at(0), at(1.0), at(3.0)).map(Tuple1(_)).toDF("event_time")
    assert(Windows.sessionCount(merged, "event_time", "2 seconds").collect().length === 1)
    val split = Seq(at(0), at(1.0), at(3.5)).map(Tuple1(_)).toDF("event_time")
    assert(Windows.sessionCount(split, "event_time", "2 seconds").collect().length === 2)
  }

  test("count windows bucket in arrival order") {
    import spark.implicits._
    val df = spark.range(25).select(
      (col("id") * 1000).cast("timestamp").as("ts"),
      col("id").as("event_id"),
      lit(1.0).as("value"))
    val got = Windows.countWindow(df, "ts", "event_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 10L, 1L -> 10L, 2L -> 5L))
  }

  test("top window by count finds the densest sliding window") {
    // reference exercise: WindowFunctions.scala:211-226 (2s size / 1s slide)
    val got = Windows.topWindowByCount(registrations, "event_time", "2 seconds", "1 second").collect()
    assert(got.length === 1)
    // offsets 2,3,4,4,6,8: window [3,5) holds 3,4,4 → count 3 is the max
    assert(got(0).getLong(0) - base.getEpochSecond === 3L)
    assert(got(0).getLong(1) === 3L)
  }
}
