package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.engine.{Sinks, Sources}
import graft.operators.{KeyedAggs, MultiStream, Stateless, Windows}

/** Property-style invariants over seeded random inputs (SURVEY.md §5.4).
  * Deterministic seeds keep runs reproducible while still sampling the
  * space rather than hand-picking examples.
  */
class PropertySpec extends SparkSpec {
  private val rnd = new Random(42)

  private def randomEvents(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, at(rnd.nextInt(3600) + rnd.nextDouble()))
    }.toDF("event_id", "user_id", "ts")
  }

  test("tumbling windows partition the timeline: every event in exactly one window") {
    for (_ <- 1 to 3) {
      val df = randomEvents(200)
      val total = Windows.tumblingCount(df, "ts", "7 seconds")
        .agg(sum("cnt")).collect()(0).getLong(0)
      assert(total === 200)
    }
  }

  test("sliding windows assign every event to exactly size/slide windows") {
    for (sizeMul <- Seq(2, 5)) {
      val df = randomEvents(150)
      val total = Windows.slidingCount(df, "ts", s"${3 * sizeMul} seconds", "3 seconds")
        .agg(sum("cnt")).collect()(0).getLong(0)
      assert(total === 150L * sizeMul)
    }
  }

  test("interval join equals the theta join with the same strict predicate") {
    val a = randomEvents(80)
    val b = randomEvents(80)
    val joined = MultiStream.intervalJoin(a, b, "user_id", "ts", "5 SECONDS", "event_id", "event_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val theta = a.select(col("event_id").as("aid"), col("user_id"), col("ts").as("ats"))
      .join(b.select(col("event_id").as("bid"), col("user_id"), col("ts").as("bts")), Seq("user_id"))
      .filter(abs(col("bts").cast("double") - col("ats").cast("double")) < 5.0)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(joined === theta)
    assert(joined.nonEmpty) // 80×80 over a shared hour with 5 keys: matches certain
  }

  test("keyed reduce equals groupBy sum on random values") {
    import spark.implicits._
    val data = (1 to 300).map(_ => (rnd.nextInt(7).toLong, rnd.nextDouble() * 100))
    val df = data.toDF("user_id", "value")
    val fromOp = KeyedAggs.keyedReduceSum(df, "user_id", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = data.groupBy(_._1).view.mapValues(vs =>
      vs.map(v => BigDecimal(v._2).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble).toMap
    for ((k, v) <- expected) assert(math.abs(fromOp(k) - v) < 1e-9, s"key $k")
  }

  test("union cardinality is |A| + |B| for any random split") {
    val df = randomEvents(120)
    val a = df.filter(col("user_id") < 2)
    val b = df.filter(col("user_id") >= 2)
    assert(MultiStream.unionStreams(a, b).count() === 120)
  }

  test("fizzbuzz law: kept n are exactly multiples of 15, over random ranges") {
    for (_ <- 1 to 3) {
      val lo = rnd.nextInt(1000) + 1
      val hi = lo + rnd.nextInt(2000) + 10
      val kept = Stateless.fizzbuzz(
        spark.range(lo.toLong, hi.toLong).select(col("id").as("n")), "n")
        .collect().map(_.getLong(0)).toSet
      assert(kept === (lo.toLong until hi.toLong).filter(_ % 15 == 0).toSet)
    }
  }

  test("sources round-trip through the row-format file sink") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ds = Sources.fromSequence(spark, 1, 100)
    Sinks.rowFileSink(Stateless.fizzbuzz(ds.toDF(), "value"), tmp, parallelism = 1)
    val back = spark.read.text(tmp).collect().map(_.getString(0).toLong).sorted
    assert(back.toSeq === (15L to 100L by 15L))
    val files = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length === 1) // parallelism 1 ≙ DataStreams.scala:62
  }

  test("fromElements/fromCollection mirror the reference bounded sources") {
    import spark.implicits._
    assert(Sources.fromElements(spark)(1, 2, 3, 4).collect().toSeq === Seq(1, 2, 3, 4))
    assert(Sources.fromCollection(spark, Seq("a", "b")).count() === 2)
    assert(Sinks.collectToDriver(Sources.fromSequence(spark, 1, 100)).size === 100)
  }

  test("operators are total on empty inputs (no crash, empty output)") {
    import spark.implicits._
    import graft.functions.{Dedup, Similarity => Sim}
    val noEvents = Seq.empty[(Long, Long, java.sql.Timestamp)].toDF("event_id", "user_id", "ts")
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Windows.tumblingCount(noEvents, "ts", "1 hour").count() === 0)
    assert(Windows.keyedSessionCount(noEvents, "user_id", "ts", "1 hour").count() === 0)
    assert(Dedup.exact(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashLshPairs(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text").count() === 0)
    assert(Sim.knnBrute(noVecs, noVecs, "vec_id", "embedding", 5).count() === 0)
    assert(Sim.knnLsh(noVecs, lit(true), "vec_id", "embedding", 5).count() === 0)
    assert(MultiStream.unionStreams(noEvents, noEvents).count() === 0)
    // round-6 operators
    import graft.functions.Curation
    val noSrcDocs = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars")
    assert(Dedup.ngramContainmentPairs(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashPairsMd5(noDocs, "doc_id", "text").count() === 0)
    assert(Curation.sourceCap(noSrcDocs, "doc_id", "source", "n_chars", 5).count() === 0)
    assert(Curation.mixtureSqrtSample(noSrcDocs, "doc_id", "source", 4).count() === 0)
    assert(Curation.corpusShuffle(noDocs, "doc_id", 8).count() === 0)
    assert(Sim.quantizeInt8(noVecs, "vec_id", "embedding").count() === 0)
    val noMedia = spark.emptyDataset(
      org.apache.spark.sql.Encoders.product[graft.multimodal.Multimodal.MediaRecord])
    assert(graft.multimodal.Multimodal.sampleFrames(noMedia, 1).count() === 0)
    // round-10 operators
    import graft.functions.TextAnalysis
    import graft.operators.Scale
    assert(TextAnalysis.bm25TopK(noDocs, "doc_id", "text", Seq("x"), 5).count() === 0)
    assert(Curation.corpusDiff(noDocs, noDocs, "doc_id", "text").count() === 0)
    // the survival curve is total in its THRESHOLD frame, not the corpus:
    // an empty corpus still emits all 10 (thr, 0, 0) rows (ADVICE r10 —
    // consumers walk a fixed-length sweep)
    assert(Curation.qualitySurvival(noDocs, "text")
      .collect().forall(r => r.getLong(1) === 0L && r.getLong(2) === 0L))
    assert(Curation.qualitySurvival(noDocs, "text").count() === 10)
    val noSrcText = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(Curation.packingStats(noSrcText, "doc_id", "source", "text", 256, 4)
      .collect().head.getLong(0) === 0L)
    assert(Scale.keySkewProfile(noEvents, "user_id").count() === 0)
    // empty QUERY side against a real corpus (the common streaming-batch
    // edge): zero rows out, no crash
    val vecs = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(Sim.mrlRecallReport(vecs, "vec_id", "embedding",
      lit(false), 5, Seq(4)).collect().head.getLong(1) === 0L)
    assert(Dedup.embeddingDedupQa(noVecs, "vec_id", "embedding", 0.4, 1)
      .collect().head.getLong(0) === 0L)
  }

  test("SQL text surface: registered views + custom functions answer queries") {
    graft.engine.GraftSql.registerTables(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql.values.sum === 6000L)
    val dotViaSql = spark.sql(
      "SELECT vector_dot(embedding, embedding) AS d FROM embeddings WHERE vec_id = 0")
      .collect()(0).getDouble(0)
    assert(dotViaSql > 0.0) // custom codegen expression reachable from SQL
  }

  test("processing-time windows count everything exactly once (nondeterministic buckets)") {
    val df = randomEvents(50)
    val total = Windows.processingTimeTumblingCount(df, "5 seconds")
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === 50)
  }

  test("connected components: union-find endgame ≡ iterative rounds on random graphs") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val nNodes = 40 + trial * 20
      val nEdges = 30 + trial * 25
      val docs = (1L to nNodes.toLong).map(i => (i, s"d$i")).toDF("doc_id", "text")
      val pairs = (1 to nEdges).map { _ =>
        val a = rnd.nextInt(nNodes).toLong + 1
        val b = rnd.nextInt(nNodes).toLong + 1
        if (a <= b) (a, b) else (b, a)
      }.filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
      val local = graft.functions.Dedup.connectedComponents(docs, pairs, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val iterative = graft.functions.Dedup
        .connectedComponents(docs, pairs, "doc_id", localMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === iterative, s"paths disagree on trial $trial")
      // labels are component minima: every cluster id labels itself
      assert(local.values.toSet.forall(c => local(c) == c))
    }
  }

  test("json extraction is total on malformed, null, and key-missing props") {
    import spark.implicits._
    val df = Seq(
      ("click", """{"k": 7}"""),
      ("click", """{"k": "not-a-number"}"""), // type mismatch → null field
      ("click", """{nope"""),                 // malformed JSON → null struct
      ("click", """{"other": 1}"""),          // key missing → null field
      ("click", null.asInstanceOf[String]))   // null document
      .toDF("event_type", "props")
    val got = graft.operators.Relational.jsonPropSum(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // no row is dropped or throws; only the one valid k contributes to the sum
    assert(got.toSeq === Seq(("click", 7L, 5L)))
  }

  private def randomTypedEvents(n: Int, types: Seq[String]) = {
    import spark.implicits._
    (1 to n).map { i =>
      (i.toLong, rnd.nextInt(8).toLong, types(rnd.nextInt(types.size)),
        at(rnd.nextInt(7 * 86400) + rnd.nextDouble()))
    }.toDF("event_id", "user_id", "event_type", "ts")
  }

  test("funnel counts are monotone nonincreasing for any event set") {
    for (trial <- 1 to 3) {
      val df = randomTypedEvents(300, Seq("view", "click", "purchase"))
      val counts = graft.operators.Extended
        .funnelSteps(df, Seq("view" -> "s1", "click" -> "s2", "purchase" -> "s3"),
          2L * 86400L * 1000000L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("s1") >= counts("s2") && counts("s2") >= counts("s3"),
        s"funnel widened on trial $trial: $counts")
      spark.catalog.clearCache()
    }
  }

  test("retention: day-0 actives per cohort sum to the distinct user count") {
    for (_ <- 1 to 3) {
      val df = randomTypedEvents(250, Seq("view", "click"))
      val ret = graft.operators.Extended.retentionCohorts(df)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // every user is active on their own first-seen day, exactly once
      val day0 = ret.collect { case ((_, 0L), n) => n }.sum
      val users = df.select("user_id").distinct().count()
      assert(day0 === users)
      // offsets are never negative — nothing is active before its cohort day
      assert(ret.keys.forall(_._2 >= 0L))
    }
  }

  test("resample LOCF equals the brute-force latest-at-or-before on random series") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val rows = (1 to 120).map { i =>
        (rnd.nextInt(4).toLong, at(rnd.nextInt(10 * 3600) + rnd.nextDouble()), rnd.nextDouble())
      }
      val df = rows.toDF("user_id", "ts", "value")
      val got = graft.operators.Extended.resampleLocf(df, "user_id", "ts", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val ev = rows.map { case (u, t, v) => (u, t.getTime * 1000L, v) } // ms → µs
      got.foreach { case ((u, g), v) =>
        val expected = ev.filter(e => e._1 == u && e._2 <= g * 1000000L).maxBy(_._2)._3
        assert(v === expected, s"trial $trial user $u grid $g")
      }
      // grid density: one point per hour from the first point AT OR AFTER
      // the user's first event (the floor-hour point before it has nothing
      // to carry forward and is dropped) through the last-event hour
      val byUser = ev.groupBy(_._1)
      byUser.foreach { case (u, es) =>
        val h = 3600000000L
        val us0 = es.map(_._2).min
        val hi = es.map(_._2).max / h
        val firstKept = (us0 + h - 1) / h // ceil: first grid point with history
        val gridPts = got.keys.count(_._1 == u)
        assert(gridPts === (hi - firstKept + 1), s"trial $trial user $u grid size")
      }
    }
  }
}
