package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A registered query: stable key, builder over (session, sf-dir), and an
  * optional DuckDB-compatible oracle SQL over the same parquet tables.
  *
  * Column aliases in `build` and `oracle` MUST match exactly — the driver
  * sorts columns by name before hashing values.
  */
final case class QueryDef(
    key: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two parquet encodings: TIMESTAMP(NANOS),
    * which Spark 4 refuses to map to TimestampType, and TIMESTAMP(MICROS)
    * without timezone, which Spark reads as TIMESTAMP_NTZ (rejected by
    * `unix_micros` and friends). Normalize both to a microsecond
    * TimestampType here — the single seam every events query reads
    * through. Nanos are truncated to micros (the same truncation DuckDB
    * applies); the NTZ cast is value-preserving because the session
    * timezone is pinned to UTC.
    *
    * Session-wide side effect, by design: the nanosAsLong conf stays set,
    * so OTHER nanos-parquet reads in this session also come back as
    * LongType instead of erroring. The conf must stay on for this query's
    * own execution (it is consulted again at scan time), so it cannot be
    * safely restored here; callers reading foreign nanos parquet should
    * convert explicitly as done below.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

/** SQL text surface: register the sf-dir tables as temp views (plus the
  * engine's custom functions) so `spark.sql("...")` works over the same
  * data the DataFrame operators see. The engine is DataFrame-first, but a
  * user switching from any SQL-speaking system gets the full Spark SQL
  * dialect for free.
  */
object GraftSql {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir) else Tables(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    graft.functions.VectorExpressions.register(spark)
  }
}

/** Session factory for local runs/tests. Production deploys pass their own
  * session; nothing in the engine assumes local mode.
  */
object GraftSession {
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
