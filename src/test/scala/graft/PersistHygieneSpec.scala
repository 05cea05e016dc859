package graft

/** Persist/unpersist discipline over the WHOLE registry: after a query
  * builds, executes, and the runner boundary (engine.Scoped.releaseAll)
  * runs, no persisted RDD blocks may remain — neither CacheManager
  * entries (df.persist) nor raw RDD persists (localCheckpoint). This is
  * the long-lived-session guarantee: a service embedding this library
  * and calling releaseAll at query boundaries, exactly as Verify/Bench
  * do, never accumulates executor storage.
  *
  * Also doubles as a registry-wide smoke test at sf0.001: every
  * registered query must build and execute.
  */
class PersistHygieneSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("no persisted RDDs survive a query + releaseAll boundary, for every registered query") {
    // earlier suites in this JVM may have left persisted frames behind —
    // start from a clean slate so leaks are attributable per query
    graft.engine.Scoped.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    val leaks = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.engine.Scoped.releaseAll(spark)
      val left = spark.sparkContext.getPersistentRDDs
      if (left.nonEmpty) {
        leaks += s"$name -> ${left.values.map(_.toString).mkString("; ")}"
        left.values.foreach(_.unpersist(blocking = false))
      }
    }
    assert(leaks.isEmpty, s"queries leaking persisted RDDs past releaseAll:\n${leaks.mkString("\n")}")
  }

  test("funnelSteps leaves no persisted state even WITHOUT a runner boundary") {
    // historically funnelSteps persisted per-step frames and unpersisted
    // them eagerly; it is now a single declarative plan (ReuseExchange
    // dedupes the shared step subtrees), so the invariant is trivial —
    // kept as a regression guard should persist() ever return
    graft.engine.Scoped.releaseAll(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = graft.operators.Extended.funnelSteps(
      graft.engine.Tables.events(spark, sfDir),
      Seq("view" -> "s1_view", "click" -> "s2_click"), 3600L * 1000000L)
    assert(out.count() === 2)
    assert(spark.sparkContext.getPersistentRDDs.keySet === before)
  }

  test("withPersisted unpersists on success and on failure") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val n = graft.engine.Scoped.withPersisted(df) { df.count() }
    assert(n === 3)
    assert(!df.storageLevel.useMemory)
    intercept[RuntimeException] {
      graft.engine.Scoped.withPersisted(df) { throw new RuntimeException("boom") }
    }
    assert(!df.storageLevel.useMemory)
  }
}
