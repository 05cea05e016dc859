package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.SigIndex
import graft.streaming.StreamingOps

/** The end-to-end TRAINING-DATA pipeline demo (VERDICT r15 item 8): one
  * streaming session that composes the staged stores the way a
  * production ingest runs them —
  *
  *   document stream → per-batch: quality filter → near-dup gate against
  *   the STORED signature index → kept docs → packed training sequences
  *   → parquet sink
  *
  * The per-batch body is [[graft.functions.SigIndex.packIngestBatch]],
  * driven through `foreachBatch`: packing is a batch-shaped operator (a
  * running-sum over the batch's kept docs), and the corpus-side store is
  * staged ONCE before the stream starts — every micro-batch re-reads the
  * same artifacts, which is exactly the store-reuse property the
  * StreamingSpec smoke pins (marker mtime unchanged across batches).
  *
  * The demo batches are corpus documents with REMAPPED ids: even replicas
  * keep their text verbatim (near-dups of the store → the dedup gate
  * drops them), odd replicas reverse their word order (same vocabulary,
  * novel character shingles → kept, packed). So the printed per-batch
  * report demonstrates both gate outcomes without synthetic fixtures.
  *
  * Usage: runMain graft.PipelineDemo [sfDir] [batches] [batchSize]
  */
object PipelineDemo {

  /** A wired (not yet driven) pipeline session: call [[Handle.drive]] to
    * push each prepared batch through and collect per-batch reports.
    */
  final case class Handle(query: org.apache.spark.sql.streaming.StreamingQuery,
                          input: MemoryStream[StreamingOps.TimedDoc],
                          feed: IndexedSeq[Seq[StreamingOps.TimedDoc]],
                          perBatch: scala.collection.mutable.Buffer[(Long, Long)]) {
    /** Feed one prepared batch and block until the engine has processed
      * it — one MICRO-BATCH per call, so `query.lastProgress` and the
      * per-batch report line up 1:1 with the feed.
      */
    def drive(i: Int): Unit = { input.addData(feed(i)); query.processAllAvailable() }
    def driveAll(): Unit = feed.indices.foreach(drive)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val batches = if (args.length > 1) args(1).toInt else 3
    val batchSize = if (args.length > 2) args(2).toInt else 200
    val spark = graft.engine.RunnerSession.build(sfDir, "8", logLevel = "ERROR")
    val outDir = java.nio.file.Files.createTempDirectory("graft_pipeline_demo").toString
    val h = build(spark, sfDir, batches, batchSize, outDir)
    h.driveAll()
    h.query.stop()
    val packed = spark.read.parquet(s"$outDir/packed")
    println(s"[pipeline-demo] packed sequences across $batches batches: " +
      s"${packed.count()} rows, ${packed.agg(sum(col("seq_tokens"))).head.getLong(0)} tokens → $outDir/packed")
    spark.stop()
  }

  /** Stages the store, wires the stream, and returns the [[Handle]] that
    * drives micro-batches one at a time. Shared by main and the
    * StreamingSpec smoke (which asserts per-batch progress and that the
    * store is NOT rebuilt between batches).
    */
  def build(spark: SparkSession, sfDir: String, batches: Int, batchSize: Int,
            outDir: String): Handle = {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // Demo feed: `batches` slices of the corpus, ids remapped out of the
    // store's id space; even replicas verbatim (dup → dropped), odd
    // replicas word-reversed (novel → kept).
    val feed = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(batches * batchSize).collect()
      .zipWithIndex.map { case (r, i) =>
        val text = if (i % 2 == 0) r.getString(1)
        else r.getString(1).split(" ").reverse.mkString(" ")
        StreamingOps.TimedDoc(1000000000L + r.getLong(0), text,
          java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T12:00:00Z")))
      }.grouped(batchSize).map(_.toSeq).toIndexedSeq

    val perBatch = scala.collection.mutable.Buffer.empty[(Long, Long)]
    val input = MemoryStream[StreamingOps.TimedDoc]
    val query = input.toDF()
      .writeStream
      .queryName("pipeline_demo")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // persist: the pipeline reads the batch from several subtrees
        // (quality signals, the id semi-join, signing, the final
        // anti-join) — unpersisted, each would re-pull the source
        batch.persist()
        // persist the batch's packed frame ONCE and both write and
        // aggregate off it — re-reading the whole sink directory and
        // filtering on batch_id would be O(total rows written so far)
        // per batch, a linearly growing per-batch overhead that's
        // invisible at 3 demo batches but wrong as the pattern this
        // demo models (ADVICE r16)
        val packed = SigIndex.packIngestBatch(spark, sfDir, batch)
          .withColumn("batch_id", lit(id))
          .persist()
        packed.write.mode("append").parquet(s"$outDir/packed")
        val stats = packed
          .agg(coalesce(sum(col("n_docs")), lit(0L)).as("kept"),
               coalesce(sum(col("seq_tokens")), lit(0L)).as("toks")).head
        packed.unpersist()
        perBatch += ((stats.getLong(0), stats.getLong(1)))
        println(s"[pipeline-demo] batch $id: in=${batch.count()} " +
          s"kept=${stats.getLong(0)} packed_tokens=${stats.getLong(1)}")
        // the per-batch sign pass persists the batch signatures — release
        // at the batch boundary, same hygiene as the bundled runners
        graft.engine.Scoped.releaseAll(spark)
      }
      .start()
    Handle(query, input, feed, perBatch)
  }
}
