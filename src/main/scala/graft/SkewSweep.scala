package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Parity, Scale}

/** Decomposition harness for the round-19 `skew_join_salted` rewrite —
  * measures, on the same session and corpus, the components the verdict's
  * "within ~2× of the plain join" bar needs pinned:
  *
  *   plain      — lineitem⋈part brand revenue with NO salting anywhere
  *                (the oracle shape; the true baseline the bar is against)
  *   hotscan    — Scale.hotKeys alone (the sampled pruned-key-column
  *                diagnosis the salted path adds)
  *   salted     — the registered hot-key-only saltedBrandRevenue
  *   blanket    — the pre-r19 shape: small side replicated ×buckets for
  *                EVERY key (kept for the A/B record)
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.SkewSweep"
  * Two timed runs each, like Bench; results land in BASELINE.md.
  */
object SkewSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf1")
    val spark = graft.engine.RunnerSession.build(sfDir, "32", logLevel = "ERROR")
    import Parity._

    def li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    def parts = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    def agg(joined: DataFrame): DataFrame = joined
      .groupBy(col("p_brand"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("cnt"))

    def timed(label: String)(f: => DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        graft.engine.Scoped.releaseAll(spark)
        s
      }
      println(f"[skewsweep] $label%-8s ${secs.min}%8.1f s  (runs: ${secs.map(s => f"$s%.1f").mkString(", ")})")
    }

    timed("plain") { agg(li.join(parts, Seq("l_partkey"))) }
    timed("hotscan") { Scale.hotKeys(li, "l_partkey") }
    timed("salted") { Scale.saltedBrandRevenue(spark, sfDir) }
    timed("blanket") { // the pre-r19 shape, inlined for the A/B record
      val saltedBig = li.withColumn("_salt",
        pmod(xxhash64(struct(li.columns.map(col): _*)), lit(8)).cast("int"))
      val salts = spark.range(0, 8).select(col("id").cast("int").as("_salt"))
      agg(saltedBig.join(parts.crossJoin(broadcast(salts)), Seq("l_partkey", "_salt")).drop("_salt"))
    }
    spark.stop()
  }
}
