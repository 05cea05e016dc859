package graft

/** Dev-only A/B for the staged ingest serve's candidate-join strategy
  * (VERDICT r15 item 4): `dedup_incremental_staged` is the heaviest
  * staged serve at sf100 (35.7 s) — per-batch signing plus a join of the
  * batch's bands against the full stored band index. The untried lever is
  * rows-into-the-join, not exchange placement: either BROADCAST the batch
  * band table (corpus side never exchanges) or pre-prune the corpus side
  * with a broadcast LEFT SEMI on the batch's distinct band keys. This
  * main interleaves the three [[graft.functions.Dedup.incrementalMatches]]
  * `batchJoin` variants in ONE session, min-of-2 per variant, and
  * verifies output parity (count + sum of hashes) across variants — the
  * same protocol as the ShjSweep/bloom A/Bs in BASELINE.md.
  *
  * Caveat for SCALED dirs (data/sf10+): the registered batch predicate
  * doc_id % 5 = 0 selects whole ScaleUp replicas there (doc_id' =
  * doc_id·copies + r), and a replica's near-dups live in the SAME
  * replica — so the match report is EMPTY by construction and the
  * parity digest degenerates to (0, 0). The sweep still measures the
  * real per-batch cost (signing + band probing); the non-empty-output
  * parity lives at the unscaled gate dirs (sf0.01: 397 rows,
  * hash-green). Measured round 16: no variant wins at sf10 OR sf100 —
  * signing dominated, which led to the MinHashSlices rewrite.
  *
  * Usage: SPARK_GRAFT_SF_DIR=data/sf100 sbt "runMain graft.IncrSweep"
  */
object IncrSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf10")
    val spark = graft.engine.RunnerSession.build(sfDir, "32", logLevel = "ERROR")
    import org.apache.spark.sql.functions._

    graft.functions.SigIndex.stageOnce(spark, sfDir) // amortized state, not timed
    graft.engine.Tables.documents(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warm the scan

    val variants = Seq("shuffle", "broadcast", "semi")
    val times = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val digests = collection.mutable.Map.empty[String, (Long, Long)]
    for (round <- 1 to 2) {
      // Decomposition stage (VERDICT r17 item 6): the per-batch SIGNING
      // cost alone — text scan + compiled MinHashSlices + band derivation
      // over the batch slice, no store join. The full-serve minus this is
      // the candidate-join + scoring + window share; which of the two
      // dominates decides whether the batchJoin lever can matter at all.
      val s0 = System.nanoTime()
      graft.functions.SigIndex.signBatchOnly(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val st = (System.nanoTime() - s0) / 1e9
      graft.engine.Scoped.releaseAll(spark)
      times("sign-only") = st :: times("sign-only")
      println(f"[incr-sweep] round $round sign-only  $st%8.1f s")
      for (v <- variants) {
        val t0 = System.nanoTime()
        val out = graft.functions.SigIndex.dedupIncrementalStaged(spark, sfDir, batchJoin = v)
        // digest instead of noop: parity across variants is the point
        val d = out.agg(count(lit(1)), sum(xxhash64(col("doc_new"), col("n_matches"),
          col("best_match"), col("best_jacc")))).head
        val t = (System.nanoTime() - t0) / 1e9
        graft.engine.Scoped.releaseAll(spark)
        times(v) = t :: times(v)
        digests(v) = (d.getLong(0), if (d.isNullAt(1)) 0L else d.getLong(1))
        println(f"[incr-sweep] round $round $v%-10s $t%8.1f s  digest=${digests(v)}")
      }
    }
    for (v <- "sign-only" +: variants)
      println(f"[incr-sweep] MIN $v%-10s ${times(v).min}%8.1f s  " +
        s"(runs: ${times(v).reverse.map(t => f"$t%.1f").mkString(", ")})")
    require(digests.values.toSet.size == 1,
      s"variant outputs DIVERGED: $digests — strategy must not change results")
    println(s"[incr-sweep] parity OK: ${digests("shuffle")}")
    spark.stop()
  }
}
