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
    if (only == "tpch") { tpchSweep(spark, dir); spark.stop(); return }
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

  /** TPC-H heavies AQE config sweep (VERDICT r19 item 7): q9/q16/q21
    * under runtime-settable conf variants, INTERLEAVED in one session so
    * co-tenant noise hits every arm alike (the ShjSweep discipline).
    * Each (variant, query) cell is min-of-2 across two full sweep
    * rounds. Only runtime confs are swept — advisory partition size and
    * scan split size; the corpus-derived shuffle-partition count is the
    * baseline's standing value.
    */
  private def tpchSweep(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val qs = Seq("q9_profit", "q16_supplier_cnt", "q21_waiting")
    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map(),
      "advisory256m" -> Map("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256m"),
      "split512m" -> Map("spark.sql.files.maxPartitionBytes" -> "512m"),
      "both" -> Map(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256m",
        "spark.sql.files.maxPartitionBytes" -> "512m"))
    val defaults = Map(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB",
      "spark.sql.files.maxPartitionBytes" -> "128MB")
    val best = scala.collection.mutable.Map[(String, String), Double]()
    // warm the tables once so round 1 is not charged file-index setup
    qs.foreach(q => SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save())
    for (round <- 1 to 2; (vn, conf) <- variants; q <- qs) {
      defaults.foreach { case (k, v) => spark.conf.set(k, v) }
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[tpch] round$round $vn $q $t%.1f s")
      val key = (vn, q)
      best(key) = math.min(best.getOrElse(key, Double.MaxValue), t)
      graft.engine.Scoped.releaseAll(spark)
    }
    for ((vn, _) <- variants; q <- qs)
      println(f"[tpch] BEST $vn $q ${best((vn, q))}%.1f s")
  }
}