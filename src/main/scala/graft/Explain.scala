package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dump the formatted physical plan of every registered
  * query to one file. The artifact the "would this survive a 100× scale-up"
  * review reads — exchanges, pushed filters, read schemas, join strategies,
  * codegen spans are all visible per query.
  *
  * Usage: runMain graft.Explain <sfDir> <outFile>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "PLANS.txt"
    // Explain is a RUNNER like Verify/Bench and builds the SAME session
    // (graft.engine.RunnerSession — corpus-sized shuffle partitions, AQE,
    // shuffled-hash preference): the dumped plans are exactly the plans
    // the benches execute, join strategy included. Round 14's config
    // drift — the bench preferring shuffled-hash joins while this dumper
    // did not — made the committed artifacts structurally unable to show
    // the strategy the benches ran; sharing the builder closes that class
    // of drift permanently.
    val spark = graft.engine.RunnerSession.build(sfDir, logLevel = "ERROR")

    val sb = new StringBuilder
    var nFailed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n${"=" * 78}\n== $name\n${"=" * 78}\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable =>
          nFailed += 1
          sb.append(s"EXPLAIN FAILED: ${e.getMessage}\n")
      }
      // a prior query's persist() marks would otherwise substitute
      // InMemoryRelation into later plans, hiding their real shape
      graft.engine.Scoped.releaseAll(spark)
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[explain] wrote ${SparkEntry.queries.size} plans to $outFile" +
      (if (nFailed > 0) s" ($nFailed FAILED)" else ""))
    spark.stop()
    // a failed explain must fail the run — PlanAuditSpec separately pins
    // the committed PLANS.txt to the registry key set
    if (nFailed > 0) sys.exit(1)
  }
}
