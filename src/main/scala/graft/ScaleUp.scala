package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only bench-data scaler: builds an sf1-equivalent RELATIONAL dataset
  * from the driver's sf0.1 tables by replicating each SF-scaling table
  * `copies` times with injective key remapping (key' = key*copies + r for
  * replica r), leaving all non-key attributes — and therefore value
  * distributions, date ranges, and selectivities — untouched. Fixed-
  * cardinality dims (nation, region) copy as-is, exactly how TPC-H itself
  * scales. Foreign keys remap with the same formula as their primary keys,
  * so referential integrity and join fan-outs are preserved; per-key group
  * sizes (lines per order, orders per customer) stay identical, which is
  * the property the TPC-H plan shapes depend on.
  *
  * The pipeline tables scale with structure-preserving per-replica
  * transforms instead of naive copies (which would create 10-way
  * exact-dup clusters and quadratically inflate every dedup pair count,
  * measuring the replication instead of the operator):
  *  - documents: replica r applies a Caesar rotation by r to the letters
  *    of `text` — a BIJECTION, so every intra-replica dup/near-dup
  *    relation, shingle frequency, and length stays bit-identical, while
  *    replicas share (almost) no shingles: corpus duplicate DENSITY is
  *    constant under scaling, exactly how a real corpus grows. (lang/
  *    quality scores of rotated replicas shift — the sf1 text point is
  *    for the dedup/index operators, not the linguistic scores.)
  *  - embeddings: replica r circularly shifts vector dimensions by r —
  *    norms and all intra-replica cosines are exactly preserved;
  *    cross-replica cosines are distributed like independent pairs.
  *  - events: ids remap, timestamps/values/props unchanged — per-user
  *    session and funnel structure replicates exactly.
  *
  * Usage: sbt "runMain graft.ScaleUp [srcDir] [dstDir] [copies]"
  *        (defaults: /root/testdata/sf0.1 → /root/repo/data/sf1 × 10;
  *         output is NOT committed — regenerate on demand.)
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/data/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(name: String, keys: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val out = df
        .withColumn("__r", explode(sequence(lit(0L), lit(copies - 1L))))
        .select(df.columns.map(c =>
          if (keys.contains(c)) (col(c) * copies + col("__r")).as(c) else col(c)): _*)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${df.count()} -> ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: copied unscaled (fixed dim)")
    }

    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    copy("nation")
    copy("region")

    // ---- pipeline tables: structure-preserving replication ----
    val az = "abcdefghijklmnopqrstuvwxyz"
    def rotAlpha(r: Int): String = az.drop(r % 26) + az.take(r % 26)
    def caesar(c: org.apache.spark.sql.Column, r: Int) =
      translate(c, az + az.toUpperCase,
        rotAlpha(r) + rotAlpha(r).toUpperCase)

    def replicateDocs(): Unit = {
      val df = spark.read.parquet(s"$src/documents.parquet")
      val out = df
        .withColumn("__r", explode(sequence(lit(0), lit(copies - 1))))
        .select(
          (col("doc_id") * copies + col("__r")).as("doc_id"),
          // 10-branch CASE: translate's maps must be literals, so each
          // replica gets its own rotation literal
          (1 until copies).foldLeft(when(col("__r") === 0, col("text"))) {
            (acc, r) => acc.when(col("__r") === r, caesar(col("text"), r))
          }.as("text"),
          col("lang"), col("source"), col("n_chars"))
      out.write.mode("overwrite").parquet(s"$dst/documents.parquet")
      println(s"[scaleup] documents: rotated-letter replication × $copies")
    }

    def replicateEmb(): Unit = {
      val df = spark.read.parquet(s"$src/embeddings.parquet")
      val out = df
        .withColumn("__r", explode(sequence(lit(0), lit(copies - 1))))
        .select(
          (col("vec_id") * copies + col("__r")).as("vec_id"),
          // circular dim shift by r: norms and intra-replica cosines
          // are exactly preserved
          concat(
            slice(col("embedding"), col("__r") + 1, size(col("embedding")) - col("__r")),
            slice(col("embedding"), lit(1), col("__r"))).as("embedding"),
          col("label"))
      out.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      println(s"[scaleup] embeddings: dim-rotated replication × $copies")
    }

    def replicateEvents(): Unit = {
      // events.ts is TIMESTAMP(NANOS) — go through the engine loader
      // (nanosAsLong) and write back as µs timestamps, which the engine
      // reads identically
      val df = graft.engine.Tables.events(spark, src)
      val out = df
        .withColumn("__r", explode(sequence(lit(0L), lit(copies - 1L))))
        .select(
          (col("event_id") * copies + col("__r")).as("event_id"),
          col("ts"),
          (col("user_id") * copies + col("__r")).as("user_id"),
          col("event_type"), col("value"), col("props"))
      out.write.mode("overwrite").parquet(s"$dst/events.parquet")
      println(s"[scaleup] events: id-remapped replication × $copies")
    }

    replicateDocs()
    replicateEmb()
    replicateEvents()
    spark.stop()
  }
}
