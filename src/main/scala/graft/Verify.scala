package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // ONE builder shared with Bench/Explain/StageBench (see
    // graft.engine.RunnerSession): gate runs execute the same join
    // strategy and partition sizing as the benches. Results are
    // strategy- and width-invariant (r13 parity passed all 177 keys at
    // the corpus-derived width), so hashes are unchanged.
    val spark = graft.engine.RunnerSession.build(sfDir)
    new java.io.File(outDir).mkdirs()
    def rmdir(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmdir)); f.delete(); ()
    }
    // Dev aid: SPARK_GRAFT_ONLY=q1,q2 restricts the dump (unset → all).
    // The driver runs without it, so the full registry is always gated.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // drop any previous round's output FIRST: a failing query must leave
      // no result behind, or the driver would hash stale (passing) data and
      // mask the regression
      rmdir(new java.io.File(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        rmdir(new java.io.File(s"$outDir/$name"))
      }
      // drop per-operator persisted index frames AND localCheckpoint
      // blocks (clearCache alone misses RDD-level persists)
      graft.engine.Scoped.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
