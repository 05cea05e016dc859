package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-source surface (SURVEY.md §2.1).
  *
  * Reference mapping:
  *  - `env.fromElements(1,2,3,4)` (DataStreams.scala:15) → [[fromElements]]
  *  - `env.fromSequence(1, 100)` (DataStreams.scala:40) → [[fromSequence]]
  *  - `env.fromCollection(events)` (WindowFunctions.scala:40-41) → [[fromCollection]]
  *  - custom `SourceFunction` generators (Shopping.scala:32-146) →
  *    [[graft.streaming.Generators]] (rate source) / MemoryStream in tests.
  *
  * `fromSequence` delegates to `spark.range`: a parallel, splittable range
  * source (each executor generates its slice) — not a driver-side
  * collection parallelize, so it scales to arbitrarily large sequences.
  */
object Sources {
  def fromElements[T: Encoder](spark: SparkSession)(elems: T*): Dataset[T] =
    spark.createDataset(elems)

  /** Inclusive-start, inclusive-end like Flink's fromSequence. */
  def fromSequence(spark: SparkSession, from: Long, to: Long): Dataset[java.lang.Long] = {
    require(to < Long.MaxValue, "fromSequence: inclusive end Long.MaxValue would overflow range()")
    spark.range(from, to + 1).toDF("value").as[java.lang.Long](
      org.apache.spark.sql.Encoders.LONG)
  }

  def fromCollection[T: Encoder](spark: SparkSession, elems: Seq[T]): Dataset[T] =
    spark.createDataset(elems)
}

/** Sink surface (SURVEY.md §2.2).
  *
  * Reference mapping:
  *  - `.print` (DataStreams.scala:18 et al.) → [[Sinks.printSink]]
  *    (batch `show`; streaming callers use `writeStream.format("console")`)
  *  - `StreamingFileSink.forRowFormat` + parallelism 1
  *    (DataStreams.scala:57-62) → [[Sinks.rowFileStreamSink]] (streaming,
  *    checkpointed append) and [[Sinks.rowFileSink]] (bounded batch twin) —
  *    row-format text, `parallelism` controls output file count via coalesce
  *  - `executeAndCollect` (WindowFunctions.scala:222) → [[Sinks.collectToDriver]]
  *    (bounded results only — the engine never collects inside operators).
  */
object Sinks {
  /** Row-format text sink; `parallelism` ≙ Flink's setParallelism on the
    * sink (output file count). Column values are tab-joined; nulls render
    * as empty fields (concat_ws would otherwise silently DROP null
    * arguments and shift every later field left).
    */
  def rowFileSink(df: DataFrame, path: String, parallelism: Int = 1): Unit = {
    val rendered = renderRows(df)
    // coalesce can only shrink; repartition when the caller wants MORE files
    val sized =
      if (rendered.rdd.getNumPartitions < parallelism) rendered.repartition(parallelism)
      else rendered.coalesce(parallelism)
    sized.write.mode("overwrite").text(path)
  }

  /** Tab-joined row rendering shared by the batch and streaming file sinks;
    * nulls render as empty fields (concat_ws would otherwise silently DROP
    * null arguments and shift every later field left).
    */
  private def renderRows(df: DataFrame): DataFrame =
    df.select(
      concat_ws("\t", df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*).as("value"))

  /** Streaming row-format file sink — the `StreamingFileSink.forRowFormat`
    * + `setParallelism(1)` shape (reference: DataStreams.scala:56-62).
    * Text files accumulate under `path` in append mode (the only mode the
    * file sink supports — exactly Flink's row-format semantics: finalized
    * parts are immutable); `checkpoint` makes output exactly-once across
    * restarts, the role Flink's checkpointing plays for its file sink.
    * `parallelism` ≙ sink parallelism = files per micro-batch.
    *
    * parallelism 1 (the reference's setting) uses coalesce — no shuffle per
    * micro-batch; >1 uses repartition so the file count is exact even when
    * the micro-batch arrives with fewer partitions (coalesce can only
    * shrink — it would silently write fewer files than requested).
    */
  def rowFileStreamSink(df: DataFrame, path: String, checkpoint: String,
                        parallelism: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    val rendered = renderRows(df)
    (if (parallelism <= 1) rendered.coalesce(1) else rendered.repartition(parallelism))
      .writeStream
      .format("text")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
  }

  def parquetSink(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def printSink(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  def collectToDriver[T](ds: Dataset[T]): Seq[T] = ds.collect().toSeq
}
