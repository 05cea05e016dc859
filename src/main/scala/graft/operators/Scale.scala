package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: the partitioning patterns a 100 TB deployment leans on
  * when the defaults (AQE skew splitting, broadcast thresholds) need a
  * manual override. These are composable helpers, not qkeys — their
  * correctness is asserted by equivalence tests against the plain
  * operators, their plan shape by PlanSpec-style checks.
  */
object Scale {

  /** Salted inner equi-join for skewed keys.
    *
    * The big (skewed) side gets a random salt in [0, buckets); the small
    * side is replicated `buckets` times with every salt value; the join key
    * becomes (key, salt). A hot key that would land on one reducer spreads
    * over `buckets` of them, at the cost of replicating the small side —
    * the classic trade when AQE's runtime skew-join (enabled by default in
    * this engine's sessions) cannot help, e.g. when the skew is in a
    * broadcast-ineligible mid-size dimension.
    *
    * Salt is derived from a hash of the row's other columns (deterministic,
    * no RNG state on executors — re-runs and speculative tasks agree).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin: inputs must not already have a _salt column (it would be clobbered)")
    val saltedBig = big.withColumn(
      "_salt", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets)).cast("int"))
    val salts = small.sparkSession.range(0, buckets).select(col("id").cast("int").as("_salt"))
    val saltedSmall = small.crossJoin(broadcast(salts))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * co-located: no exchange on either side, just a bucket-aware scan +
    * sort-merge. At 100 TB this turns every repeated fact⋈fact join on the
    * same key into a shuffle-free operation — the storage-layout analog of
    * Flink's keyed-stream partitioning.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Size shuffle partitions to the data: ceil(inputBytes / targetBytes),
    * clamped. The driver-side calculation a cluster job does from file
    * listing before kicking off a big shuffle (AQE coalescing handles the
    * too-many case at runtime; this handles the far-too-few case up front).
    */
  def shufflePartitionsFor(inputBytes: Long, targetBytes: Long = 128L << 20,
                           min: Int = 32, max: Int = 20000): Int =
    math.min(max, math.max(min, math.ceil(inputBytes.toDouble / targetBytes).toInt))
}
