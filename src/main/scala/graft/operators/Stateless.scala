package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}

/** Stateless row transforms: map / filter / flatMap / projection.
  *
  * Capability parity with the reference's stateless DataStream programs
  * (reference: DataStreams.scala:36-66 FizzBuzz pipeline;
  * Transformations.scala:15-45 map/flatMap/process forms). All operators
  * compile to Column expressions so Catalyst can push filters into the
  * parquet scan, prune columns, and keep the pipeline inside a single
  * WholeStageCodegen span — a Scala-closure `ds.map` would block all three
  * (SURVEY.md §4). At 100 TB these are pure map-side pipelines: no shuffle,
  * no state, linear scaling with input splits.
  */
object Stateless {

  /** FizzBuzz classification as a when/otherwise chain.
    * Reference semantics: DataStreams.scala:44-49 (n%3 / n%5 pattern match).
    */
  def fizzbuzzTag(n: Column): Column =
    when(pmod(n, lit(15)) === 0, "fizzbuzz")
      .when(pmod(n, lit(3)) === 0, "fizz")
      .when(pmod(n, lit(5)) === 0, "buzz")
      .otherwise(n.cast("string"))

  /** Full FizzBuzz pipeline: classify, keep only "fizzbuzz", project n back
    * out (reference: DataStreams.scala:44-51 map → filter → map(_.n)).
    */
  def fizzbuzz(nums: DataFrame, numCol: String): DataFrame =
    nums.select(col(numCol).as("n"))
      .withColumn("output", fizzbuzzTag(col("n")))
      .filter(col("output") === "fizzbuzz")
      .select(col("n"))

  /** map: 1→1 arithmetic transform (reference: Transformations.scala:18,21-24
    * `_ * 2` in lambda and explicit-MapFunction form — one Spark op covers
    * both API shapes).
    */
  def mapDouble(df: DataFrame, numCol: String): DataFrame =
    df.select((col(numCol) * 2).as("doubled"))

  /** filter by predicate (reference: DataStreams.scala:50,
    * WindowFunctions.scala:218 — isInstanceOf predicates become
    * discriminator-column equality per SURVEY.md §1.3).
    */
  def filterEq(df: DataFrame, colName: String, value: String): DataFrame =
    df.filter(col(colName) === value)

  /** flatMap: 1→N expansion (reference: Transformations.scala:27,30-37
    * `n => Range.Long(1, n, 1)` in lambda and Collector form).
    * `explode(sequence(...))` keeps the expansion inside codegen instead of
    * a deserialize→closure→serialize hop.
    */
  def flatMapRange(df: DataFrame, keyCol: String, numCol: String): DataFrame =
    df.filter(col(numCol) >= 2)
      .select(
        col(keyCol),
        col(numCol),
        explode(sequence(lit(1L), (col(numCol) - 1).cast("long"), lit(1L))).as("i"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "fizzbuzz",
      (s, dir) => fizzbuzz(Tables.lineitem(s, dir), "l_orderkey"),
      Some("SELECT l_orderkey AS n FROM lineitem WHERE l_orderkey % 15 = 0")),
    QueryDef(
      "map_double",
      (s, dir) => mapDouble(Tables.lineitem(s, dir), "l_orderkey"),
      Some("SELECT l_orderkey * 2 AS doubled FROM lineitem")),
    QueryDef(
      "filter_eq",
      (s, dir) =>
        filterEq(Tables.events(s, dir), "event_type", "click")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
      Some("SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click'")),
    QueryDef(
      "flatmap_range",
      (s, dir) => flatMapRange(Tables.lineitem(s, dir), "l_orderkey", "l_linenumber"),
      Some(
        "SELECT l_orderkey, l_linenumber, unnest(range(1, CAST(l_linenumber AS BIGINT))) AS i " +
          "FROM lineitem WHERE l_linenumber >= 2")),
  )
}
