package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}

/** Multi-stream operators: union, window join, interval join, connect
  * (reference: MultipleStreams.scala — union :19-33, window join :36-57,
  * interval join :61-103, connect + CoProcessFunction :106-145).
  *
  * Batch semantics here; true stream-stream variants (watermarked
  * symmetric-hash joins, stateful connect) live in [[graft.streaming]].
  *
  * The driver test data has one `events` table; two "streams" are two
  * disjoint `event_type` slices of it (FIXTURES.md). Both slices come from
  * the same scan — Catalyst reuses the exchange where possible.
  */
object MultiStream {

  /** Merge two same-schema streams (reference: MultipleStreams.scala:28-29).
    * No shuffle: union is a pure metadata concatenation of partitions.
    */
  def unionStreams(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)

  /** Equi-join restricted to pairs in the same tumbling window
    * (reference: MultipleStreams.scala:42-53 — join on userId within a
    * TumblingProcessingTimeWindows bucket).
    *
    * The window bucket is materialized as a column so the whole condition is
    * a 2-column equi-join: Catalyst plans a shuffled hash / sort-merge join
    * on (user, bucket) — co-partitioned, skew handled by AQE. Never a
    * theta-join, so it survives 1000 executors.
    */
  def windowJoin(a: DataFrame, b: DataFrame, keyCol: String, tsCol: String,
                 bucketSec: Long, aId: String, bId: String): DataFrame = {
    val bucket = (c: String) => floor(unix_timestamp(col(c)) / bucketSec)
    val l = a.select(col(keyCol), col(aId).as("a_id"), bucket(tsCol).as("bk"))
    val r = b.select(col(keyCol).as("r_key"), col(bId).as("b_id"), bucket(tsCol).as("r_bk"))
    l.join(r, l("bk") === r("r_bk") && col(keyCol) === col("r_key"))
      .select(col(keyCol), (col("bk") * bucketSec).cast("long").as("ws"), col("a_id"), col("b_id"))
  }

  /** Keyed event-time interval join with exclusive bounds
    * (reference: MultipleStreams.scala:85-100 — `between(-2s, +2s)` with
    * `lowerBoundExclusive/upperBoundExclusive`, so strict `<` / `>`).
    *
    * Equi-key plus a time-range predicate: Catalyst plans the equi-join and
    * evaluates the range as a post-join filter on co-partitioned data. The
    * shuffle is on the key only — bounded state per key, same network
    * boundary the reference's keyBy introduces (SURVEY.md §3.2).
    */
  def intervalJoin(a: DataFrame, b: DataFrame, keyCol: String, tsCol: String,
                   interval: String, aId: String, bId: String): DataFrame = {
    val l = a.select(col(keyCol), col(aId).as("a_id"), col(tsCol).as("a_ts"))
    val r = b.select(col(keyCol).as("r_key"), col(bId).as("b_id"), col(tsCol).as("b_ts"))
    l.join(r,
        col(keyCol) === col("r_key") &&
          col("b_ts") > col("a_ts") - expr(s"INTERVAL $interval") &&
          col("b_ts") < col("a_ts") + expr(s"INTERVAL $interval"))
      .select(col(keyCol), col("a_id"), col("b_id"))
  }

  /** connect + CoProcessFunction running ratio — batch form computes the
    * final state: 100.0 * |A| / (|A| + |B|)
    * (reference: MultipleStreams.scala:118-141 — per-side mutable counters,
    * parallelism forced to 1). The streaming twin with true running-emission
    * semantics is [[graft.streaming.StreamingOps.coProcessRatio]].
    * Batch: two conditional counts, one partial+final aggregate — no
    * single-instance bottleneck.
    */
  def coProcessRatio(union: DataFrame, sideCol: String, aValue: String, bValue: String): DataFrame =
    union
      .agg(
        sum(when(col(sideCol) === aValue, 1L).otherwise(0L)).as("a_cnt"),
        sum(when(col(sideCol) === bValue, 1L).otherwise(0L)).as("b_cnt"))
      .select((lit(100.0) * col("a_cnt") / (col("a_cnt") + col("b_cnt"))).as("ratio"))

  // ---- qkey registry -----------------------------------------------------

  private def slice(s: SparkSession, dir: String, types: String*) =
    Tables.events(s, dir).filter(col("event_type").isin(types: _*))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "union_streams",
      (s, dir) => {
        val cols = Seq(col("event_id"), col("user_id"), col("event_type"))
        unionStreams(
          slice(s, dir, "click", "view").select(cols: _*),
          slice(s, dir, "purchase", "signup", "error").select(cols: _*))
      },
      Some(
        "SELECT event_id, user_id, event_type FROM events WHERE event_type IN ('click','view') " +
          "UNION ALL " +
          "SELECT event_id, user_id, event_type FROM events WHERE event_type IN ('purchase','signup','error')")),
    QueryDef(
      "window_join",
      (s, dir) =>
        windowJoin(slice(s, dir, "click"), slice(s, dir, "purchase"),
          "user_id", "ts", 3600L, "event_id", "event_id"),
      Some(
        """SELECT a.user_id AS user_id, CAST(floor(epoch(a.ts)/3600)*3600 AS BIGINT) AS ws,
          |       a.event_id AS a_id, b.event_id AS b_id
          |FROM events a JOIN events b
          |  ON a.user_id = b.user_id AND floor(epoch(a.ts)/3600) = floor(epoch(b.ts)/3600)
          |WHERE a.event_type = 'click' AND b.event_type = 'purchase'""".stripMargin)),
    QueryDef(
      "interval_join",
      (s, dir) =>
        intervalJoin(slice(s, dir, "click"), slice(s, dir, "purchase"),
          "user_id", "ts", "30 MINUTES", "event_id", "event_id"),
      Some(
        """SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id
          |FROM events a JOIN events b
          |  ON a.user_id = b.user_id
          | AND b.ts > a.ts - INTERVAL 30 MINUTE
          | AND b.ts < a.ts + INTERVAL 30 MINUTE
          |WHERE a.event_type = 'click' AND b.event_type = 'purchase'""".stripMargin)),
    QueryDef(
      "coprocess_ratio",
      (s, dir) =>
        coProcessRatio(slice(s, dir, "click", "purchase"), "event_type", "click", "purchase"),
      Some(
        "SELECT CAST(100.0 AS DOUBLE) * a_cnt / (a_cnt + b_cnt) AS ratio FROM (" +
          "SELECT count(*) FILTER (WHERE event_type = 'click') AS a_cnt, " +
          "count(*) FILTER (WHERE event_type = 'purchase') AS b_cnt " +
          "FROM events WHERE event_type IN ('click','purchase'))")),
  )
}
