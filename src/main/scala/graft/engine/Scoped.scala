package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist/unpersist discipline for multi-consumer frames.
  *
  * Two lifetimes exist in this engine:
  *
  *  1. EAGER scopes — the frame's consumers all run inside one function
  *     (e.g. a parameter sweep, a spec): use [[withPersisted]], which
  *     unpersists on the way out, exception or not.
  *
  *  2. QUERY-LIFETIME persists — a registered query returns a LAZY
  *     DataFrame whose plan reads a persisted intermediate from two
  *     subtrees (q11/q15/q20/q21, the dedup indexes). The function that
  *     created the persist cannot unpersist it (the caller has not
  *     executed anything yet), so the contract is: the RUNNER releases
  *     everything after the query's action completes — [[releaseAll]]
  *     in Verify/Bench/specs, once per query. This also reclaims
  *     `localCheckpoint` blocks (RDD-level persists that
  *     `spark.catalog.clearCache()` alone cannot see), which the
  *     connected-components rounds leave behind by design.
  *
  * A long-lived session embedding this library should do the same:
  * `Scoped.releaseAll(spark)` at query boundaries, exactly like the
  * bundled runners.
  */
object Scoped {

  /** Persist `dfs`, run `f` (which must CONSUME them — materialization
    * happens at f's own actions), then unpersist, exception-safe.
    */
  def withPersisted[T](dfs: DataFrame*)(f: => T): T = {
    dfs.foreach(_.persist())
    try f
    finally dfs.foreach(_.unpersist(blocking = false))
  }

  /** Release every cached/persisted block in the session: cached plans
    * (CacheManager) AND raw RDD blocks, which covers `localCheckpoint`
    * data. Safe at query boundaries — re-executing a checkpointed frame
    * released here would fail, so call it only after the query's result
    * has been fully consumed.
    */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  /** Drop the persisted RDD backing a `localCheckpoint`ed frame. The
    * checkpoint caches its materialized rows behind a `LogicalRDD`; plain
    * `unpersist()` does not reach it (the Dataset was never `.persist()`ed),
    * so the RDD is unpersisted directly. The per-round hygiene of every
    * iterative operator (connected components, the BPE merge loops):
    * round N materializes, round N−1's blocks are dead weight.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Rebuild a `localCheckpoint`ed frame from its materialized rows with
    * FRESH plan metadata. `localCheckpoint` severs the execution lineage
    * but `LogicalRDD.fromDataset` carries the origin plan's STATISTICS
    * and CONSTRAINTS forward — so in an iterative operator whose round
    * plan references the previous checkpoint k >= 2 times (connected
    * components: the pointer-jump self-join), the inherited sizeInBytes
    * is a BigInt whose DIGIT COUNT multiplies by ~k every round.
    * Catalyst's size-only estimator then multiplies million-digit
    * BigIntegers at every join node: the sf100 dedup_pipeline — the
    * first corpus whose pair count pushes connectedComponents onto the
    * iterative path — spent 40+ min of pure driver CPU inside
    * `BigInteger.multiplyToomCook3` before the round-13 session killed
    * it. Single-reference loops (pagerank, the BPE merge loop) only grow
    * digits LINEARLY per round and do not need this.
    *
    * The round-trip through `createDataFrame(df.rdd, schema)` plans a
    * LogicalRDD with `originStats = None` (sizeInBytes falls back to
    * `spark.sql.defaultSizeInBytes`, constant-size), at the cost of an
    * InternalRow <-> Row conversion per consumption — noise next to the
    * round's joins. The result frame does NOT answer
    * [[unpersistCheckpoint]] for the underlying blocks (its LogicalRDD
    * wraps a derived RDD): keep the checkpointed frame for release and
    * hand this one to the next round's plan.
    */
  def severPlanMetadata(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
}
