package graft

import org.apache.spark.sql.functions._

/** Throwaway round-20 measurement probe — NOT part of the registry. */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/data/sf100"
    val only = if (args.length > 1) args(1) else "all"
    val spark = graft.engine.RunnerSession.build(dir, "32", "ERROR")
    val docs = graft.engine.Tables.documents(spark, dir)
    graft.functions.VectorExpressions.register(spark)
    if (only == "cc") { ccProbe(spark, docs); spark.stop(); return }
    // 1. bigram occurrence : per-doc-distinct factor (0.1% sample)
    val s = docs.sample(0.001, 42)
    val st = s.select(explode(graft.functions.VectorExpressions.bigramCounts(col("text"))).as("bc"))
      .agg(sum("bc.cnt").as("occ"), count(lit(1)).as("dist")).collect()(0)
    println(s"[probe] bigram occ=${st.getLong(0)} distinct=${st.getLong(1)} factor=${st.getLong(0).toDouble / st.getLong(1)}")
    // 2. bench-side bloom fill
    val posAgg = docs.filter(col("source") === "src0")
      .select(graft.functions.VectorExpressions.bloomDocBits(col("text"), 8, 4, 3, 64).as("w"))
      .agg(array((0 until 64).map { i =>
        coalesce(expr(s"bit_or(element_at(w, ${i + 1}))"), lit(0L))
      }: _*).as("bloom_words")).collect()(0).getSeq[Long](0)
    val setBits = posAgg.map(java.lang.Long.bitCount).sum
    println(s"[probe] bloom fill = $setBits / ${posAgg.length * 64}")
    // 3. distinct bench shingles
    val bsh = docs.filter(col("source") === "src0")
      .select(explode(graft.functions.VectorExpressions.distinctShingles(col("text"), 8, 4)).as("sh"))
      .distinct.count()
    println(s"[probe] distinct bench shingles = $bsh")
    // 4. corpus stats
    val dstat = docs.agg(count(lit(1)), avg(length(col("text")))).collect()(0)
    println(s"[probe] docs=${dstat.getLong(0)} avglen=${dstat.getDouble(1)}")
    ccProbe(spark, docs)
    spark.stop()
  }

  /** dedup_clusters decomposition: pairs vs CC machinery vs final join. */
  private def ccProbe(spark: org.apache.spark.sql.SparkSession,
                      docs: org.apache.spark.sql.DataFrame): Unit = {
    // per-Spark-job wall time: locates which action inside CC pays
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, j.time)
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(j.jobId, j.time)
        println(f"[probe]   job ${j.jobId} ${(j.time - t0) / 1e3}%.1f s")
      }
    })
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val pairs = graft.functions.Dedup.minhashLshPairs(docs, "doc_id", "text").persist()
    val nE = timed("cc: pairs plan + cache")(pairs.count())
    println(s"[probe] cc: nEdges=$nE")
    timed("cc: connectedComponents OVER CACHED pairs (incl singleton join + noop)") {
      graft.functions.Dedup.connectedComponents(docs, pairs, "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    pairs.unpersist()
  }
}
