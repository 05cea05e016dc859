package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}
import Parity._

/** Window-aggregation suite: all four assigner families the reference
  * exercises (reference: WindowFunctions.scala — tumbling :55,112; sliding
  * :147-151; session :170; global/count :194-197) plus the top-1-window
  * exercise (:211-226).
  *
  * Batch semantics here; streaming twins live in [[graft.streaming]].
  * Every aggregation is a built-in partial+final HashAggregate: the window
  * bucket is computed map-side, combined map-side, and only |windows × keys|
  * rows cross the shuffle — at 100 TB the shuffle volume is bounded by the
  * time-range/key product, not input rows.
  *
  * Window boundaries are emitted as epoch seconds (`unix_timestamp`) or
  * epoch micros (`unix_micros` for session bounds, which inherit event
  * precision) so oracle comparison is integer-exact.
  */
object Windows {

  /** Count per tumbling event-time window
    * (reference: CountByWindowAll, WindowFunctions.scala:58-63; the
    * ProcessAllWindowFunction variant :72-78 has identical semantics — the
    * window-metadata Context ≙ the `window` struct columns).
    */
  def tumblingCount(df: DataFrame, tsCol: String, size: String): DataFrame =
    df.groupBy(window(col(tsCol), size))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("cnt"))

  /** Keyed tumbling count (reference: CountByWindow / CountByWindowV2,
    * WindowFunctions.scala:114-139).
    */
  def keyedTumblingCount(df: DataFrame, keyCol: String, tsCol: String, size: String): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), size))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol), unix_timestamp(col("window.start")).as("ws"), col("cnt"))

  /** Tumbling conditional count through the user-defined
    * [[CondCountAggregator]] (reference: AggregateFunction CountByWindowV3,
    * WindowFunctions.scala:87-100). Proves the incremental-aggregation API
    * surface; Catalyst still plans partial+final aggregation.
    */
  def tumblingCondCount(df: DataFrame, tsCol: String, size: String, matchValue: String): DataFrame = {
    val condCount = udaf(new CondCountAggregator(matchValue))
    df.groupBy(window(col(tsCol), size))
      .agg(condCount(col("event_type")).as("match_cnt"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("match_cnt"))
  }

  /** Count per sliding (hopping) window
    * (reference: slidingAllWindows, WindowFunctions.scala:147-158).
    */
  def slidingCount(df: DataFrame, tsCol: String, size: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), size, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("cnt"))

  /** Count per session window, gap-based merge
    * (reference: sessionWindows, WindowFunctions.scala:169-177).
    * Merge is INCLUSIVE at the boundary: an event at exactly last+gap joins
    * the session (verified against Spark's SessionWindow semantics; the
    * oracle's lag-idiom uses `<=` to match).
    * Global variant: fine at demo scale, single-key at heart — prefer
    * [[keyedSessionCount]] at scale (SURVEY.md §7.5 risk 2).
    */
  def sessionCount(df: DataFrame, tsCol: String, gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_micros(col("session_window.start")).as("ss"),
        unix_micros(col("session_window.end")).as("se"),
        col("cnt"))

  /** Keyed session windows — the scalable form: sessionization is
    * partitioned by key, so state and sort are per-key-group.
    */
  def keyedSessionCount(df: DataFrame, keyCol: String, tsCol: String, gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col(keyCol),
        unix_micros(col("session_window.start")).as("ss"),
        unix_micros(col("session_window.end")).as("se"),
        col("cnt"))

  /** Count windows: fire every `n` elements in arrival order
    * (reference: GlobalWindows + CountTrigger, WindowFunctions.scala:187-202;
    * identical to the PurgingTrigger semantics of Triggers.scala:31-40 —
    * each bucket is an independent purge-fired window).
    *
    * Batch emulation buckets by `row_number()` (SURVEY.md §2.5). The global
    * form is inherently sequential (Flink forces parallelism 1 for
    * GlobalWindows too); [[keyedCountWindow]] is the scale path.
    */
  def countWindow(df: DataFrame, tsCol: String, idCol: String, n: Int): DataFrame = {
    // EXPECTED at runtime: "WindowExec: No Partition Defined ... single
    // partition" — the un-partitioned orderBy is the SEMANTICS here, not an
    // accident: Flink's GlobalWindows is likewise a parallelism-1 operator
    // (one global element sequence). Jobs that need parallelism use
    // [[keyedCountWindow]] below.
    val w = Window.orderBy(col(tsCol), col(idCol))
    df.withColumn("rn", row_number().over(w))
      .groupBy(floor((col("rn") - 1) / n).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"), decSum(col("value")).as("sum_value"))
  }

  /** Keyed count windows: every `n` elements per key — fully parallel. */
  def keyedCountWindow(df: DataFrame, keyCol: String, tsCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("rn", row_number().over(w))
      .groupBy(col(keyCol), floor((col("rn") - 1) / n).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Top-1 window by count: the reference's only sort/limit/top-k
    * (reference: exercise + KeepWindowAndCountFunction,
    * WindowFunctions.scala:211-226 — driver-side `maxBy` becomes
    * TakeOrderedAndProject in the plan, SURVEY.md §3.3). Ties break on
    * window start for cross-engine determinism.
    */
  def topWindowByCount(df: DataFrame, tsCol: String, size: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), size, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("cnt"))
      .orderBy(col("cnt").desc, col("ws").asc)
      .limit(1)

  /** Full-window buffer: the window's elements, ordered — the semantics of
    * the reference's `(All)WindowFunction.apply(…, input: Iterable[T], …)`
    * (reference: WindowFunctions.scala:58-63,114-121), which receives the
    * whole window buffered. `collect_list` + `sort_array` keeps it an
    * aggregation (partial lists merge map-side); memory is bounded by
    * window × key cardinality — the same bound Flink's window state has.
    * The buffer is emitted as a canonical comma-joined string rather than
    * an array column so the result stays hashable for exact comparison.
    */
  def windowElements(df: DataFrame, tsCol: String, size: String, idCol: String): DataFrame =
    df.groupBy(window(col(tsCol), size))
      .agg(concat_ws(",", sort_array(collect_list(col(idCol)))).as("ids"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("ids"))

  /** Processing-time windows: stamp arrival time at ingest and window on
    * it (reference: TumblingProcessingTimeWindows,
    * TimeBasedTransformations.scala:36-47 — which itself documents that
    * "multiple runs generate different results"; the nondeterminism is
    * inherent, so these ops have tests but no oracle).
    *
    * `current_timestamp()` is a per-QUERY constant in Spark, which would
    * collapse every row into one window — the stamp must be a
    * nondeterministic per-row clock read, like Flink's per-record
    * processing time.
    */
  private val wallClock =
    udf(() => new java.sql.Timestamp(System.currentTimeMillis())).asNondeterministic()

  def stampProcessingTime(df: DataFrame, as: String = "proc_ts"): DataFrame =
    df.withColumn(as, wallClock())

  def processingTimeTumblingCount(df: DataFrame, size: String): DataFrame =
    tumblingCount(stampProcessingTime(df), "proc_ts", size)

  // ---- qkey registry -----------------------------------------------------
  // Hour-scale durations fit the test data's event spacing (~26 s – 43 min
  // apart depending on sf); the reference's 3 s windows are exercised on its
  // own 12-event fixture in WindowsSpec (semantics identical — duration is a
  // parameter).

  private def evs(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** DuckDB tumbling bucket in epoch seconds. */
  private def tumbleSql(sec: Long) =
    s"CAST(floor(epoch(ts)/$sec)*$sec AS BIGINT)"

  private val slidingSql =
    """SELECT ws, count(*) AS cnt FROM (
      |  SELECT CAST(floor(epoch(ts)/900)*900 - k*900 AS BIGINT) AS ws
      |  FROM events CROSS JOIN (SELECT unnest(generate_series(0,3)) AS k) t
      |) GROUP BY 1""".stripMargin

  private val slidingSignupSql =
    """SELECT ws, count(*) AS cnt FROM (
      |  SELECT CAST(floor(epoch(ts)/900)*900 - k*900 AS BIGINT) AS ws
      |  FROM events CROSS JOIN (SELECT unnest(generate_series(0,3)) AS k) t
      |  WHERE event_type = 'signup'
      |) GROUP BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "tumbling_count",
      (s, dir) => tumblingCount(evs(s, dir), "ts", "1 hour"),
      Some(s"SELECT ${tumbleSql(3600)} AS ws, count(*) AS cnt FROM events GROUP BY 1")),
    QueryDef(
      "keyed_tumbling_count",
      (s, dir) => keyedTumblingCount(evs(s, dir), "event_type", "ts", "1 hour"),
      Some(s"SELECT event_type, ${tumbleSql(3600)} AS ws, count(*) AS cnt FROM events GROUP BY 1, 2")),
    QueryDef(
      "tumbling_count_agg",
      (s, dir) => tumblingCondCount(evs(s, dir), "ts", "1 hour", "signup"),
      Some(s"SELECT ${tumbleSql(3600)} AS ws, " +
        "count(*) FILTER (WHERE event_type = 'signup') AS match_cnt FROM events GROUP BY 1")),
    QueryDef(
      "sliding_count",
      (s, dir) => slidingCount(evs(s, dir), "ts", "1 hour", "15 minutes"),
      Some(slidingSql)),
    QueryDef(
      "session_count",
      (s, dir) => sessionCount(evs(s, dir), "ts", "30 minutes"),
      Some(
        """WITH o AS (SELECT epoch_us(ts) AS e FROM events),
          |b AS (SELECT e, CASE WHEN e - lag(e) OVER (ORDER BY e) <= 1800000000 THEN 0 ELSE 1 END AS brk FROM o),
          |s AS (SELECT e, sum(brk) OVER (ORDER BY e ROWS UNBOUNDED PRECEDING) AS sid FROM b)
          |SELECT min(e) AS ss, max(e) + 1800000000 AS se, count(*) AS cnt FROM s GROUP BY sid""".stripMargin)),
    QueryDef(
      "session_count_keyed",
      (s, dir) => keyedSessionCount(evs(s, dir), "user_id", "ts", "2 hours"),
      Some(
        """WITH o AS (SELECT user_id, epoch_us(ts) AS e FROM events),
          |b AS (SELECT user_id, e, CASE WHEN e - lag(e) OVER (PARTITION BY user_id ORDER BY e) <= 7200000000 THEN 0 ELSE 1 END AS brk FROM o),
          |s AS (SELECT user_id, e, sum(brk) OVER (PARTITION BY user_id ORDER BY e ROWS UNBOUNDED PRECEDING) AS sid FROM b)
          |SELECT user_id, min(e) AS ss, max(e) + 7200000000 AS se, count(*) AS cnt FROM s GROUP BY user_id, sid""".stripMargin)),
    QueryDef(
      "count_window",
      (s, dir) => countWindow(evs(s, dir), "ts", "event_id", 10),
      Some(
        s"""WITH r AS (SELECT value, row_number() OVER (ORDER BY ts, event_id) AS rn FROM events)
           |SELECT CAST(floor((rn-1)/10) AS BIGINT) AS bucket, count(*) AS cnt,
           |       ${decSumSql("value")} AS sum_value
           |FROM r GROUP BY 1""".stripMargin)),
    QueryDef(
      "count_window_keyed",
      (s, dir) => keyedCountWindow(evs(s, dir), "user_id", "ts", "event_id", 10),
      Some(
        """WITH r AS (SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
          |SELECT user_id, CAST(floor((rn-1)/10) AS BIGINT) AS bucket, count(*) AS cnt
          |FROM r GROUP BY 1, 2""".stripMargin)),
    QueryDef(
      "window_elements",
      (s, dir) => windowElements(evs(s, dir), "ts", "1 hour", "event_id"),
      Some(s"SELECT ${tumbleSql(3600)} AS ws, string_agg(event_id, ',' ORDER BY event_id) AS ids " +
        "FROM events GROUP BY 1")),
    QueryDef(
      "topk_window",
      (s, dir) => topWindowByCount(evs(s, dir).filter(col("event_type") === "signup"), "ts", "1 hour", "15 minutes"),
      Some(s"SELECT ws, cnt FROM ($slidingSignupSql) ORDER BY cnt DESC, ws ASC LIMIT 1")),
  )
}
