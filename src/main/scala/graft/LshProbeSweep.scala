package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity}

/** Dev-only sweep for the POST-CLAMP sign-LSH regime (round 14, verdict
  * item: `lshBitsFor` hits its 16-bit clamp at sf100's 2 M vectors, so
  * candidate volume grows linearly with n from there). Measures, per
  * geometry {committed 16-bit clamp, raised clamps 18/20/22 unprobed,
  * and [[Dedup.lshGeometryFor]]'s volume-equalized 1-bit multi-probe}:
  *
  *  - serve seconds (min of 2, noop-consumed, same-session interleaved)
  *  - emitted pair count at the registered threshold 0.4
  *  - bucket occupancy (avg / p99 / max bucket size over the band table)
  *  - recall vs EXACT all-pairs truth on a deterministic hash-sampled
  *    vector slice (~15 k vectors — banding is per-vector, so recall on
  *    slice pairs equals true recall restricted to the slice), split by
  *    cosine regime: the 0.9+ production band and the 0.97+ near-dup
  *    core, plus overall at the 0.4 registration threshold.
  *
  * Usage: SPARK_GRAFT_SF_DIR=data/sf100 sbt "runMain graft.LshProbeSweep"
  */
object LshProbeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        operators.Scale.shufflePartitionsFor(operators.Scale.dirBytes(sfDir)))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val nVecs = emb.count()
    val numBands = 8
    val threshold = 0.4

    // ---- exact truth on a deterministic slice (~15 k vectors) ----
    val mod = math.max(1L, nVecs / 15000L)
    val slice = emb.filter(pmod(xxhash64(col("vec_id")), lit(mod)) === 0)
    val sliceIds = slice.select(col("vec_id")).persist()
    val nSlice = sliceIds.count()
    val exact = Dedup.embeddingNearDups(slice, "vec_id", "embedding", threshold)
      .select(col("vec_a"), col("vec_b"), col("cos_sim")).persist()
    val exactN = exact.count()
    // the real corpus is deliberately UNIFORM (no cos>=0.9 pairs exist):
    // slice recall is measurable only at the 0.4-0.8 registration regime
    def bucketed(df: DataFrame): Map[String, Long] = {
      val rows = df.select(
        sum(when(col("cos_sim") >= 0.6, 1L).otherwise(0L)).as("c60"),
        sum(when(col("cos_sim") >= 0.8, 1L).otherwise(0L)).as("c80"),
        count(lit(1)).as("all")).collect()(0)
      def g(i: Int) = if (rows.isNullAt(i)) 0L else rows.getLong(i)
      Map("c60" -> g(0), "c80" -> g(1), "all" -> g(2))
    }
    val exactBuckets = bucketed(exact)
    println(s"[lsh-probe] n=$nVecs slice mod=$mod -> $nSlice vectors, " +
      s"$exactN exact pairs (cos>=0.6: ${exactBuckets("c60")}, >=0.8: ${exactBuckets("c80")})")

    // ---- clustered fixture: the PRODUCTION near-dup regime ----
    // mixture of 64 Gaussians × 160 members (10 240 vectors, intra-
    // cluster cosine ~0.98) — sf-independent geometry recall at cos>=0.9,
    // the regime the corpus cannot provide
    val clustered = {
      import spark.implicits._
      val rnd = new scala.util.Random(42)
      val dim = 64
      val centers = Array.fill(64)(Array.fill(dim)(rnd.nextGaussian().toFloat))
      (for { c <- 0 until 64; i <- 0 until 160 } yield {
        val v = centers(c).map(x => x + 0.1f * rnd.nextGaussian().toFloat)
        ((c * 160 + i).toLong, v.toSeq)
      }).toDF("vec_id", "embedding")
    }
    val clusterExact = Dedup.embeddingNearDups(clustered, "vec_id", "embedding", 0.9)
      .select(col("vec_a"), col("vec_b")).persist()
    val clusterExactN = clusterExact.count()
    println(s"[lsh-probe] clustered fixture: 10240 vectors, $clusterExactN exact pairs at cos>=0.9")

    val (ruleBits, ruleProbe) = Dedup.lshGeometryFor(nVecs)
    // SPARK_GRAFT_LSH_VARIANTS=name:bits:probe,... overrides the default
    // grid; SPARK_GRAFT_LSH_ROUNDS=1 skips the warm-up round (the sf100
    // inline runs are ~10 min each — a 2×6 grid does not fit a session)
    val rounds = sys.env.get("SPARK_GRAFT_LSH_ROUNDS").map(_.toInt).getOrElse(2)
    val variants: Seq[(String, Int, Int)] =
      sys.env.get("SPARK_GRAFT_LSH_VARIANTS").map(_.split(",").toSeq.map { s =>
        val Array(nm, b, p) = s.split(":"); (nm, b.toInt, p.toInt)
      }).getOrElse((Seq(
        ("clamp16", Dedup.lshBitsFor(nVecs), 0),
        ("raw18", 18, 0), ("raw20", 20, 0), ("raw22", 22, 0),
        (s"rule_b${ruleBits}p$ruleProbe", ruleBits, ruleProbe))
        ++ (if (ruleProbe == 1) Seq((s"probe_b${ruleBits}p0", ruleBits, 0)) else Nil))
        .distinct)

    def pipelineOf(bits: Int, probe: Int): DataFrame = {
      // same persist discipline as the committed embeddingLshPairs: the
      // normalized frame feeds bands + both scoring sides, the band
      // table feeds both self-join sides (and the probe expansion)
      val n = Similarity.withNorm(emb, "vec_id", "embedding").persist()
      val bands = Dedup.embLshBandTable(n, "vec_id", numBands * bits, bits, 64).persist()
      Dedup.embLshScoreProbed(bands, n, "vec_id", threshold, bits, probe)
    }

    println(f"${"variant"}%-14s ${"bits"}%5s ${"probe"}%6s ${"secs"}%8s ${"pairs"}%12s " +
      f"${"occAvg"}%8s ${"occP99"}%8s ${"occMax"}%8s ${"r@.4"}%7s ${"r@.6"}%7s ${"r@.8"}%7s ${"rClus.9"}%8s")
    // SPARK_GRAFT_LSH_ONEPASS=1: time the measurement pass itself (one
    // execution per variant — the sf100 inline pipelines are ~10+ min
    // each, so the separate noop-timed pass doubles a cost we can't pay)
    val onePass = sys.env.get("SPARK_GRAFT_LSH_ONEPASS").contains("1")
    for (round <- 1 to rounds; (name, bits, probe) <- variants) {
      var secs = Double.NaN
      if (!onePass) {
        val t0 = System.nanoTime()
        pipelineOf(bits, probe).write.format("noop").mode("overwrite").save()
        secs = (System.nanoTime() - t0) / 1e9
        graft.engine.Scoped.releaseAll(spark)
      }
      if (round == rounds) {
        // measurement pass: pair count, occupancy, slice recall
        val t1 = System.nanoTime()
        val pairs = pipelineOf(bits, probe).persist()
        val nPairs = pairs.count()
        if (onePass) secs = (System.nanoTime() - t1) / 1e9
        val n = Similarity.withNorm(emb, "vec_id", "embedding")
        val occ = Dedup.embLshBandTable(n, "vec_id", numBands * bits, bits, 64)
          .groupBy(col("band"), col("key")).agg(count(lit(1)).as("c"))
          .agg(avg(col("c")), expr("percentile_approx(c, 0.99)"), max(col("c")))
          .collect()(0)
        val slicePairs = pairs
          .join(sliceIds.select(col("vec_id").as("vec_a")), Seq("vec_a"))
          .join(sliceIds.select(col("vec_id").as("vec_b")), Seq("vec_b"))
        val hit = bucketed(exact.join(slicePairs.select(col("vec_a"), col("vec_b")),
          Seq("vec_a", "vec_b")))
        def rec(k: String) =
          if (exactBuckets(k) == 0) "-" else f"${hit(k).toDouble / exactBuckets(k)}%.3f"
        // clustered-fixture recall at the same geometry (threshold 0.9)
        val cn = Similarity.withNorm(clustered, "vec_id", "embedding")
        val cBands = Dedup.embLshBandTable(cn, "vec_id", numBands * bits, bits, 64)
        val cHit = clusterExact.join(
          Dedup.embLshScoreProbed(cBands, cn, "vec_id", 0.9, bits, probe)
            .select(col("vec_a"), col("vec_b")),
          Seq("vec_a", "vec_b")).count()
        val rClus = if (clusterExactN == 0) "-" else f"${cHit.toDouble / clusterExactN}%.3f"
        println(f"$name%-14s $bits%5d $probe%6d $secs%8.1f $nPairs%12d " +
          f"${occ.getDouble(0)}%8.2f ${occ.getLong(1)}%8d ${occ.getLong(2)}%8d " +
          f"${rec("all")}%7s ${rec("c60")}%7s ${rec("c80")}%7s $rClus%8s")
        pairs.unpersist()
        graft.engine.Scoped.releaseAll(spark)
      } else {
        println(f"$name%-14s $bits%5d $probe%6d $secs%8.1f (warm-up round)")
      }
    }
    spark.stop()
  }
}
