package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

class ScaleSpec extends SparkSpec {

  test("keySkewProfile: exact counts, rank-picked quantiles, integer skew ratio") {
    import spark.implicits._
    // keys a,b (1 row), c (2 rows), d (6 rows): n_keys=4, n_rows=10,
    // max=6, p50 = 2nd-smallest count = 1 (ceil(0.5*4)=2), p99 = 4th = 6,
    // skew = 6*1000*4 div 10 = 2400
    val df = (Seq("a", "b") ++ Seq.fill(2)("c") ++ Seq.fill(6)("d")).toDF("k")
    val got = Scale.keySkewProfile(df, "k").collect().head
    assert(got.toSeq === Seq(4L, 10L, 6L, 1L, 6L, 2400L))
    // uniform distribution: skew ratio is exactly 1000
    val uni = (1 to 40).map(i => s"k${i % 4}").toDF("k")
    assert(Scale.keySkewProfile(uni, "k").collect().head.getLong(5) === 1000L)
    spark.catalog.clearCache()
  }

  test("skew ratio survives the Long-overflow regime (decimal numerator)") {
    import spark.implicits._
    // ~1e8 keys with a ~1e8-row hot key: max_cnt·1000·n_keys = 1e19·1e3
    // wraps a BIGINT negative, the exact regime the diagnostic targets
    // (ADVICE r10); the decimal(38,0) numerator must stay exact. Stats
    // are fabricated (no 1e16-row frame in a test) — the expression is
    // the same one keySkewProfile selects.
    val stats = Seq((100000000L, 10000000000000000L, 100000000L))
      .toDF("n_keys", "n_rows", "max_cnt")
    val got = stats.select(Scale.skewX1000Expr.as("skew_x1000")).collect().head.getLong(0)
    // exact: 1e8 · 1000 · 1e8 / 1e16 = 1000 · max/mean with mean = 1e8
    assert(got === 1000L, s"skew ratio wrapped or lost precision: $got")
  }

  test("salted join returns exactly the plain join result") {
    import spark.implicits._
    // heavily skewed big side: 90% of rows share one key
    val big = spark.range(2000).select(
      when(col("id") < 1800, 1L).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Scale.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 2000)
  }

  test("saltedJoin salts only hot keys; uniform data degenerates to the plain join") {
    import spark.implicits._
    // 90% of rows on key 1 → exactly {1} dominates a reducer
    // (sampleFraction = 1.0 → the exact profile: threshold = rows/8/P)
    val skewed = spark.range(2000).select(
      when(col("id") < 1800, 1L).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
    val hot = Scale.hotKeys(skewed, "k", sampleFraction = 1.0).collect().map(_.getLong(0)).toSet
    assert(hot === Set(1L), s"expected only the 90% key hot, got $hot")
    // uniform: 40 rows/key, reducer threshold 2000/8/4 = 62.5 → no hot
    // keys → the small side is NOT replicated (plain-join degeneration)
    val uniform = spark.range(2000).select((col("id") % 50).as("k"), col("id").as("payload"))
    assert(Scale.hotKeys(uniform, "k", sampleFraction = 1.0).isEmpty)
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = uniform.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Scale.saltedJoin(uniform, small, "k", buckets = 8)
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("bucketed tables join without an exchange") {
    import spark.implicits._
    for (t <- Seq("bucketed_a", "bucketed_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) { // stale location from an interrupted run blocks CREATE
        def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
        rm(loc)
      }
    }
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    Scale.writeBucketed(a, "bucketed_a", "k", 4)
    Scale.writeBucketed(b, "bucketed_b", "k", 4)
    // disable broadcast so the sort-merge path shows the bucketed layout
    // (at real scale both sides are too big to broadcast anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "bucketed_a", "bucketed_b", "k")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("registered bucketed_join qkey: q18 result off bucketed staging, zero hash exchanges") {
    val sf = "/root/testdata/sf0.001"
    // broadcast off: at real scale neither side of a fact/fact join fits,
    // and the assertion is about the bucketed layout, not broadcast luck
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("bucketed_join")(spark, sf)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed q18 still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")
      // physical layout must not change the answer
      val plain = SparkEntry.queries("q18_big_orders")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === plain)
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("registered skew_join_salted qkey equals the plain (unsalted) join result") {
    val sf = "/root/testdata/sf0.001"
    val salted = SparkEntry.queries("skew_join_salted")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf/part.parquet")
    val plain = li.join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(graft.operators.Parity.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("shuffle partition sizing clamps and scales") {
    assert(Scale.shufflePartitionsFor(1L << 20) === 32) // tiny input → floor
    assert(Scale.shufflePartitionsFor(100L * (128L << 20)) === 100)
    assert(Scale.shufflePartitionsFor(Long.MaxValue) === 20000) // ceiling
    // the runner wiring: gate-scale corpora stay at the 32 floor (so all
    // committed ≤sf10 artifacts and timings are unchanged), absent dirs
    // fall back to the floor instead of crashing pre-session
    val gate = Scale.dirBytes("/root/testdata/sf0.001")
    assert(gate > 0L && Scale.shufflePartitionsFor(gate) === 32)
    assert(Scale.dirBytes("/no/such/dir") === 0L)
  }

  test("partition_pruned_scan resolves the lang predicate as a partition filter") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("partition_pruned_scan")(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    // the predicate prunes directories at listing time — it must appear as
    // a PartitionFilter on the scan, NOT as a post-scan data Filter
    assert(plan.contains("PartitionFilters:") && plan.contains("(lang#"),
      s"lang predicate did not become a partition filter:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"),
      s"lang predicate leaked into the data filters:\n$plan")
    // result equals the unpartitioned formulation
    val plain = graft.engine.Tables.documents(spark, sf)
      .filter(col("lang") === "en")
      .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === plain)
    assert(got.nonEmpty)
  }

  test("embReplica r<128 is byte-identical to the pre-round-12 shift/negate generator") {
    // ADVICE r12 (high): the half-cycle test must be integer modular
    // arithmetic — double division negated replicas 1..63. The old
    // generator (copies <= 128) was: shift by r mod 64, negate iff r >= 64.
    val base = (1 to 64).map(_.toFloat).toArray
    val df = spark.range(128).select(col("id").cast("int").as("r"))
      .withColumn("embedding", typedLit(base))
    val dims = 64
    val shift = col("r") % dims
    val shifted = concat(
      slice(col("embedding"), shift + 1, size(col("embedding")) - shift),
      slice(col("embedding"), lit(1), shift))
    val old = when(col("r") < dims, shifted)
      .otherwise(transform(shifted, x => -x))
    val mismatches = df.select(
        ScaleUp.embReplica(col("embedding"), col("r")).as("got"), old.as("want"))
      .where(not(col("got") === col("want"))).count()
    assert(mismatches === 0L)
  }

  test("embReplica replicas 0..255 are pairwise distinct and norm-preserving") {
    val base = (1 to 64).map(_.toFloat).toArray
    val df = spark.range(256).select(col("id").cast("int").as("r"))
      .withColumn("embedding", typedLit(base))
      .select(ScaleUp.embReplica(col("embedding"), col("r")).as("e"))
    // pairwise distinct ⟺ 256 distinct arrays (the r/r+64 aliasing the
    // double-division bug produced would collapse this to < 256)
    assert(df.distinct().count() === 256L)
    // shift, negate, and the diagonal ±1 involution are all orthogonal:
    // every replica keeps the base norm exactly
    val baseNorm = base.map(x => x.toDouble * x).sum
    val norms = df
      .select(aggregate(col("e"), lit(0.0d), (a, x) => a + x * x).as("n"))
      .distinct().collect().map(_.getDouble(0))
    assert(norms.length === 1 && math.abs(norms.head - baseNorm) < 1e-6)
  }

  test("docAlphabet: legacy affine maps below 312, distinct bijections through ×1000") {
    val az = "abcdefghijklmnopqrstuvwxyz"
    // r < 26 is plain Caesar — the original generator family
    assert(ScaleUp.docAlphabet(0) === az)
    assert(ScaleUp.docAlphabet(2) === "cdefghijklmnopqrstuvwxyzab")
    // r < 312 stays the affine family byte-for-byte (a walks the units
    // of Z26 every 26 replicas): r = 26 is a = 3, b = 0
    assert(ScaleUp.docAlphabet(26) ===
      (0 until 26).map(i => az((3 * i) % 26)).mkString)
    // every replica through the sf100 budget is a PERMUTATION of a-z
    // (bijection ⇒ dup/near-dup structure preserved) and all 1000 are
    // pairwise distinct (any alias would be an exact cross-replica dup
    // factory); determinism: the permutation branch re-derives identically
    val alphas = (0 until 1000).map(ScaleUp.docAlphabet)
    assert(alphas.forall(_.sorted == az), "non-bijective replica alphabet")
    assert(alphas.distinct.size === 1000, "replica alphabet collision")
    assert(ScaleUp.docAlphabet(500) === ScaleUp.docAlphabet(500))
  }

  test("committed data/sf1 embeddings regenerate unchanged under embReplica") {
    // data/sf1 was built by the pre-round-12 generator (copies = 10); the
    // fixed transform must reproduce it bit-for-bit. Optional: skips when
    // the regenerable dataset is absent (it is not committed).
    val sf1 = new java.io.File("data/sf1/embeddings.parquet")
    assume(sf1.exists(), "data/sf1 not present — regenerate with graft.ScaleUp")
    val copies = 10
    val regen = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .withColumn("__r", explode(sequence(lit(0), lit(copies - 1))))
      .select(
        (col("vec_id") * copies + col("__r")).as("vec_id"),
        ScaleUp.embReplica(col("embedding"), col("__r")).as("embedding"),
        col("label"))
    val committed = spark.read.parquet(sf1.getPath)
    assert(regen.exceptAll(committed).count() === 0L)
    assert(committed.exceptAll(regen).count() === 0L)
  }
}
