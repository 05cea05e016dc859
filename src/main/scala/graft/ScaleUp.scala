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
  *  - documents: replica r applies an AFFINE letter map x → a·x + b
  *    (mod 26) to the letters of `text`, with (a, b) derived from r —
  *    a BIJECTION, so every intra-replica dup/near-dup relation, shingle
  *    frequency, and length stays bit-identical, while replicas share
  *    (almost) no shingles: corpus duplicate DENSITY is constant under
  *    scaling, exactly how a real corpus grows. For r < 26 the map is
  *    a = 1, b = r — plain Caesar, byte-identical to the pre-round-11
  *    generator, so data/sf1 regenerates unchanged; r ≥ 26 walks the 12
  *    units of Z₂₆ for `a`, giving 312 distinct maps (enough for ×100 =
  *    sf10 from sf0.1). (lang/quality scores of mapped replicas shift —
  *    the scaled text points are for the dedup/index operators, not the
  *    linguistic scores.)
  *  - embeddings: replica r circularly shifts vector dimensions by
  *    r mod 64 and NEGATES the vector for r ≥ 64 — norms and all
  *    intra-replica cosines are exactly preserved under both (cos(−a,−b)
  *    = cos(a,b)); cross-replica cosines are distributed like
  *    independent pairs. 128 distinct transforms; r < 64 is
  *    byte-identical to the pre-round-11 generator.
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
    // the 12 multiplicative units of Z26 — each (a, b) is a distinct
    // bijection on letters; a = 1 first so r < 26 stays plain Caesar
    val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    def affineAlpha(r: Int): String = {
      val a = units((r / 26) % units.length)
      val b = r % 26
      (0 until 26).map(i => az((a * i + b) % 26)).mkString
    }
    def affine(c: org.apache.spark.sql.Column, r: Int) =
      translate(c, az + az.toUpperCase,
        affineAlpha(r) + affineAlpha(r).toUpperCase)

    def replicateDocs(): Unit = {
      require(copies <= 26 * units.length,
        s"documents: only ${26 * units.length} distinct affine maps — " +
          s"copies=$copies would create exact cross-replica duplicates")
      val df = spark.read.parquet(s"$src/documents.parquet")
      val out = df
        .withColumn("__r", explode(sequence(lit(0), lit(copies - 1))))
        .select(
          (col("doc_id") * copies + col("__r")).as("doc_id"),
          // per-replica CASE: translate's maps must be literals, so each
          // replica gets its own affine-map literal
          (1 until copies).foldLeft(when(col("__r") === 0, col("text"))) {
            (acc, r) => acc.when(col("__r") === r, affine(col("text"), r))
          }.as("text"),
          col("lang"), col("source"), col("n_chars"))
      out.write.mode("overwrite").parquet(s"$dst/documents.parquet")
      println(s"[scaleup] documents: affine-letter replication × $copies")
    }

    def replicateEmb(): Unit = {
      require(copies <= 100000,
        s"embeddings: keep the replica budget sane, got copies=$copies")
      val df = spark.read.parquet(s"$src/embeddings.parquet")
      val dims = 64
      val shift = col("__r") % dims
      val shifted = concat(
        slice(col("embedding"), shift + 1, size(col("embedding")) - shift),
        slice(col("embedding"), lit(1), shift))
      // r < 128: circular dim shift by r mod 64, negated for r >= 64 —
      // byte-identical to the pre-round-12 generator, so data/sf1 and
      // data/sf10 regenerate unchanged. r >= 128 (the fourth-decade
      // extension, round 12): the same shift/negate COMPOSED with a
      // per-replica DIAGONAL ±1 map whose signs come from
      // xxhash64(replica, dim) — an orthogonal involution, so norms and
      // every intra-replica cosine are still EXACTLY preserved, while
      // the 2^64 sign patterns make distinct replicas collision-free in
      // practice (the bare shift/negate family has only 128 members;
      // composing replicated dirs would alias without this).
      val negated = when((col("__r") / dims) % 2 === 0, shifted)
        .otherwise(transform(shifted, x => -x))
      val flipped = transform(negated, (x, i) =>
        when(pmod(xxhash64(col("__r"), i), lit(2)) === 0, x).otherwise(-x))
      val out = df
        .withColumn("__r", explode(sequence(lit(0), lit(copies - 1))))
        .select(
          (col("vec_id") * copies + col("__r")).as("vec_id"),
          when(col("__r") < 2 * dims, negated).otherwise(flipped).as("embedding"),
          col("label"))
      out.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      println(s"[scaleup] embeddings: dim-rotated/negated/sign-flipped replication × $copies")
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
