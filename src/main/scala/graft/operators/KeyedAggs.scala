package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{QueryDef, Tables}

/** Cross-engine-deterministic numeric helpers.
  *
  * Double sums are order-dependent in the last ulp, and shuffle order is not
  * deterministic — so any oracle-checked sum of non-integral doubles goes
  * through an exact DECIMAL(18,6) accumulation and is cast back to double at
  * the end. Decimal aggregation is also what you want at 100 TB: it is
  * partial-aggregatable (map-side combine) and exact regardless of the merge
  * tree shape.
  */
object Parity {
  /** Exact, order-independent sum of a double column. */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")
  /** DuckDB twin of [[decSum]]. */
  def decSumSql(e: String): String = s"CAST(sum(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
}

/** Keyed (non-windowed) aggregation.
  *
  * Capability parity with `keyBy` + keyed `reduce`
  * (reference: Transformations.scala:48-56 — lambda and explicit
  * ReduceFunction forms). The columnar form compiles to a partial+final
  * HashAggregate pair around a single hash exchange: at 100 TB the map-side
  * combine collapses each input split to |keys| rows before the shuffle, so
  * network volume scales with key cardinality, not row count.
  */
object KeyedAggs {
  import Parity._

  /** keyBy(_.userId) + reduce(_ + _) ≙ groupBy + sum. */
  def keyedReduceSum(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(decSum(col(valueCol)).as("sum_value"))

  /** Typed twin of [[keyedReduceSum]] proving the Dataset API shape the
    * reference uses (`KeyedStream.reduce`); used in tests, not the oracle
    * path (closures block Catalyst — SURVEY.md §4).
    */
  def keyedReduceSumTyped(ds: Dataset[(Long, Double)]): Dataset[(Long, Double)] = {
    implicit val enc: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .reduceGroups((a, b) => (a._1, a._2 + b._2))
      .map(_._2)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "keyed_reduce_sum",
      (s, dir) => keyedReduceSum(Tables.events(s, dir), "user_id", "value"),
      Some(s"SELECT user_id, ${decSumSql("value")} AS sum_value FROM events GROUP BY 1")),
    QueryDef(
      "distinct_users",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users")),
      Some("SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1")),
  )
}

/** Incremental conditional count, the Spark `Aggregator` port of the
  * reference's `AggregateFunction[ServerEvent, Long, Long]`
  * (reference: WindowFunctions.scala:87-97 CountByWindowV3 —
  * createAccumulator/add/merge/getResult ≙ zero/reduce/merge/finish).
  * Catalyst runs it as partial+final aggregation, so the merge tree works
  * on any cluster topology.
  */
class CondCountAggregator(matchValue: String) extends Aggregator[String, Long, Long] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: String): Long = if (a == matchValue) b + 1 else b
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
