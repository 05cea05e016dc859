package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}

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

  /** Stage `df` as a bucketed table exactly once per session: skipped when
    * the table is already registered, and a stale warehouse directory left
    * by an interrupted run is removed first (it would otherwise block the
    * managed-table CREATE). The location is resolved through the Hadoop
    * Path/FileSystem APIs, so `file:`, `file://`, URI-encoded characters
    * and non-local warehouses all clean up correctly.
    *
    * Same-session staleness: if the underlying sf-dir's parquet is
    * regenerated WITHIN one session, the already-registered table keeps
    * serving the earlier staging (the table-name sf-dir fingerprint only
    * isolates different paths, not rewrites of the same path) — acceptable
    * because testdata dirs are immutable per driver run.
    */
  def stageBucketedOnce(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) return
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    writeBucketed(df, table, key, buckets)
  }

  /** TPC-H Q18 shape off bucketed staging — the end-to-end demonstration
    * that [[writeBucketed]] layout pays: `lineitem` and `orders` are staged
    * once per sf-dir bucketed (and sorted) by order key, after which BOTH
    * the per-order aggregation AND the fact join run without a single hash
    * exchange — the scans themselves deliver the required partitioning.
    * At 100 TB this is the difference between re-shuffling the fact table
    * per query and paying the layout cost once at ingest; the same staging
    * serves every downstream orderkey join/agg.
    *
    * Staging prunes to the referenced columns (the bucketed "index" is
    * narrow), and `stageBucketedOnce` makes re-runs in one session reuse
    * the layout — which is exactly what the bench's min-of-2 then measures:
    * the steady-state bucketed-scan query, not the one-time ingest.
    */
  def q18Bucketed(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    // table names carry an sf-dir fingerprint so different test scales
    // never silently share staging
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val liT = s"graft_bkt_lineitem_$tag"
    val ordT = s"graft_bkt_orders_$tag"
    stageBucketedOnce(Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      liT, "l_orderkey", buckets)
    stageBucketedOnce(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
      ordT, "o_orderkey", buckets)
    val big = spark.table(liT).groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    spark.table(ordT).join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("odate"),
        col("total_qty"))
  }

  /** Write a table hive-partitioned by a column — the 100 TB layout lever
    * complementary to [[writeBucketed]]: bucketing co-locates JOIN keys,
    * directory partitioning lets predicate-bearing scans skip whole
    * partitions at FILE LISTING time (partition pruning — the scan never
    * opens, or even lists, non-matching directories). Partition by
    * low-cardinality scan predicates (date, language, source); bucket by
    * high-cardinality join keys.
    */
  def writePartitioned(df: DataFrame, table: String, partCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCol)
      .format("parquet")
      .saveAsTable(table)

  /** Once-per-session partitioned staging; same contract and stale-dir
    * handling as [[stageBucketedOnce]].
    */
  def stagePartitionedOnce(df: DataFrame, table: String, partCol: String): Unit = {
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) return
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    writePartitioned(df, table, partCol)
  }

  /** Per-source counts of English documents off language-partitioned
    * staging — partition pruning as a registered, oracle-audited
    * capability. The `lang = 'en'` predicate resolves against the
    * partition COLUMN: the scan lists only the lang=en directory (the
    * executed plan shows it as a PartitionFilter, not a data filter), so
    * at 100 TB a one-language query reads one language's bytes. The
    * oracle runs the same query on the unpartitioned parquet — layout
    * changes the plan, never the answer (same contract as
    * [[q18Bucketed]]).
    */
  def prunedLangCounts(spark: SparkSession, dir: String): DataFrame = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val docT = s"graft_part_documents_$tag"
    stagePartitionedOnce(Tables.documents(spark, dir).select("doc_id", "source", "lang"),
      docT, "lang")
    spark.table(docT)
      .filter(col("lang") === "en")
      .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
  }

  /** Revenue by brand off a salted lineitem⋈part join — [[saltedJoin]] as a
    * registered, oracle-audited capability. The salt only changes physical
    * row placement (a hot part key spreads over `buckets` reducers instead
    * of one); the logical result is the plain join's, so the oracle is the
    * UNSALTED SQL — "same answer, skew-proof plan" is the contract being
    * hash-checked. At test scale the replicated part side broadcasts and
    * the salt is moot; the shape matters at 100× when a skewed mid-size
    * dimension is broadcast-ineligible and AQE's skew split can't help
    * (e.g. the skew survives into a required sort-merge join).
    */
  def saltedBrandRevenue(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    import Parity._
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    saltedJoin(li, parts, "l_partkey", buckets)
      .groupBy(col("p_brand"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("cnt"))
  }

  /** Same result contract as q18_big_orders — the oracle doesn't care about
    * physical layout, which is the point: bucketing changes the plan, never
    * the answer.
    */
  val defs: Seq[QueryDef] = Seq(
    QueryDef("bucketed_join", (s, dir) => q18Bucketed(s, dir),
      Some(
        """SELECT o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS odate, total_qty
          |FROM orders JOIN (
          |  SELECT l_orderkey, sum(l_quantity) AS total_qty
          |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
          |) ON o_orderkey = l_orderkey""".stripMargin)),
    QueryDef("skew_join_salted", (s, dir) => saltedBrandRevenue(s, dir),
      Some(
        s"""SELECT p_brand, ${Parity.decSumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
           |  count(*) AS cnt
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY 1""".stripMargin)),
    QueryDef("partition_pruned_scan", (s, dir) => prunedLangCounts(s, dir),
      Some("SELECT source, count(*) AS cnt FROM documents WHERE lang = 'en' GROUP BY 1")),
  )

  /** Size shuffle partitions to the data: ceil(inputBytes / targetBytes),
    * clamped. The driver-side calculation a cluster job does from file
    * listing before kicking off a big shuffle (AQE coalescing handles the
    * too-many case at runtime; this handles the far-too-few case up front).
    */
  def shufflePartitionsFor(inputBytes: Long, targetBytes: Long = 128L << 20,
                           min: Int = 32, max: Int = 20000): Int =
    math.min(max, math.max(min, math.ceil(inputBytes.toDouble / targetBytes).toInt))
}
