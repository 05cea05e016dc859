package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("feature extraction is deterministic, distributed, and schema-stable") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media, partitions = 4)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("media_id", "media_type", "n_bytes", "checksum", "feature"))
    val rows = feats.collect()
    assert(rows.length === 30)
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 30), 2).collect()
    assert(rows.map(r => r.media_id -> r.checksum).toMap ===
      again.map(r => r.media_id -> r.checksum).toMap) // partitioning-invariant
    assert(rows.forall(_.feature.length === Multimodal.FakeCodec.FeatureDim))
  }

  /** A real 2×2 PNG, encoded in-memory by the JDK itself: red, green /
    * blue, white pixels.
    */
  private def png2x2: Array[Byte] = {
    val im = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, 0xff0000); im.setRGB(1, 0, 0x00ff00)
    im.setRGB(0, 1, 0x0000ff); im.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("ImageCodec decodes a real 2x2 PNG to exact pixel features") {
    val f = Multimodal.ImageCodec.decode(png2x2).get
    assert(f.length === Multimodal.ImageCodec.FeatureDim)
    assert(f(0) === 2f && f(1) === 2f) // width, height
    // channel means: each channel is 255 in exactly 2 of 4 pixels → 0.5
    assert(math.abs(f(2) - 0.5f) < 1e-6 && math.abs(f(3) - 0.5f) < 1e-6 && math.abs(f(4) - 0.5f) < 1e-6)
    // luma mean: (0.299 + 0.587 + 0.114 + 1.0) * 255 / 4 / 255 = 0.5
    assert(math.abs(f(5) - 0.5f) < 1e-6)
    // exact stddev of {76.245, 149.685, 29.07, 255} around 127.5
    val lumas = Seq(0.299, 0.587, 0.114, 1.0).map(_ * 255)
    val expectedSd = math.sqrt(lumas.map(l => (l - 127.5) * (l - 127.5)).sum / 4)
    assert(math.abs(f(6) - expectedSd) < 1e-3)
    assert(f(7) === 4f) // pixel count
    // garbage bytes are NOT an image → None (pipeline falls back to FakeCodec)
    assert(Multimodal.ImageCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("extractFeatures routes real PNG payloads through the real decoder") {
    import spark.implicits._
    val payload = png2x2
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "image", payload, Some(2), Some(2), None),
      Multimodal.MediaRecord(2L, "audio", Array[Byte](9, 9, 9), None, None, Some(16000))))
    val feats = Multimodal.extractFeatures(media, partitions = 2)
      .collect().map(f => f.media_id -> f).toMap
    // the image row carries real decoded dimensions in its feature vector
    assert(feats(1L).feature(0) === 2f && feats(1L).feature(1) === 2f && feats(1L).feature(7) === 4f)
    // the audio row went through the deterministic fake
    assert(feats(2L).feature.toSeq === Multimodal.FakeCodec.decode(Array[Byte](9, 9, 9)).toSeq)
  }

  /** A real 16-bit mono WAV, encoded in-memory by the JDK itself: a
    * ±16384 square wave (8 periods of [0, +A, 0, −A]) at 8 kHz.
    */
  private def wavSquare: Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = 32
    val pcm = new Array[Byte](2 * n)
    (0 until n).foreach { i =>
      val s: Int = (i % 4) match { case 1 => 16384; case 3 => -16384; case _ => 0 }
      pcm(2 * i) = (s & 0xff).toByte        // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavCodec decodes a real 16-bit PCM WAV to exact waveform features") {
    val f = Multimodal.WavCodec.decode(wavSquare).get
    assert(f.length === Multimodal.WavCodec.FeatureDim)
    assert(f(0) === 32f && f(1) === 1f && f(2) === 8000f) // frames, channels, rate
    assert(math.abs(f(3)) < 1e-6) // square wave symmetric → mean 0
    // rms of {0, .5, 0, -.5} pattern = sqrt(0.125)
    assert(math.abs(f(4) - math.sqrt(0.125)) < 1e-6)
    assert(f(6) === 0.5f && f(7) === 16f) // peak, bit depth
    // each +A→−A transition is one zero crossing (zeros keep the prior sign)
    assert(f(5) > 0f)
    // garbage bytes are NOT audio → None (pipeline falls back to FakeCodec)
    assert(Multimodal.WavCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("extractFeatures routes real WAV payloads through the real decoder") {
    import spark.implicits._
    val payload = wavSquare
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "audio", payload, None, None, Some(8000)),
      Multimodal.MediaRecord(2L, "audio", Array[Byte](9, 9, 9), None, None, Some(16000))))
    val feats = Multimodal.extractFeatures(media, partitions = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).feature(0) === 32f && feats(1L).feature(2) === 8000f)
    // undecodable payload takes the deterministic fake path
    assert(feats(2L).feature.toSeq === Multimodal.FakeCodec.decode(Array[Byte](9, 9, 9)).toSeq)
  }

  /** A real MJPEG AVI assembled in-memory: RIFF('AVI ' LIST('hdrl' avih)
    * LIST('movi' 00dc 00dc)) with two JDK-encoded JPEG frames (one dark,
    * one bright) at 25 fps (avih dwMicroSecPerFrame = 40000).
    */
  private def jpegGray(gray: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until 4; x <- 0 until 4) im.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  private def mjpegAvi: Array[Byte] =
    Multimodal.AviCodec.encode(Seq(jpegGray(32), jpegGray(224)), 40000L) // 25 fps

  test("AviCodec decodes a real MJPEG AVI to frame and luma features") {
    val f = Multimodal.AviCodec.decode(mjpegAvi).get
    assert(f.length === Multimodal.AviCodec.FeatureDim)
    assert(f(0) === 2f)               // two frames
    assert(f(1) === 4f && f(2) === 4f) // frame dimensions
    assert(math.abs(f(3) - 25f) < 1e-3) // fps from avih
    // mean luma ≈ mean of the two gray levels (JPEG is lossy → loose bound)
    assert(math.abs(f(4) - (32 + 224) / 2.0 / 255.0) < 0.05)
    assert(f(5) > 0.2f)               // dark→bright = large per-frame luma spread
    assert(f(7) === 2f * 4 * 4)       // total pixels
    // non-AVI payloads are rejected → None (pipeline falls back to FakeCodec)
    assert(Multimodal.AviCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.AviCodec.decode(png2x2).isEmpty) // wrong container
    // a truncated AVI (header cut mid-chunk) must not throw
    assert(Multimodal.AviCodec.decode(mjpegAvi.take(40)).isEmpty)
  }

  test("extractFeatures routes real MJPEG-AVI payloads through the real decoder") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "video", mjpegAvi, None, None, None),
      Multimodal.MediaRecord(2L, "video", Array[Byte](9, 9, 9), None, None, None)))
    val feats = Multimodal.extractFeatures(media, partitions = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).feature(0) === 2f && feats(1L).feature(3) === 25f)
    // undecodable payload takes the deterministic fake path
    assert(feats(2L).feature.toSeq === Multimodal.FakeCodec.decode(Array[Byte](9, 9, 9)).toSeq)
  }

  test("AviCodec.frameIndex inverts encode: per-frame offsets and sizes") {
    val f0 = jpegGray(10); val f1 = jpegGray(200); val f2 = jpegGray(99)
    val avi = Multimodal.AviCodec.encode(Seq(f0, f1, f2), 40000L)
    val (usec, idx) = Multimodal.AviCodec.frameIndex(avi)
    assert(usec === 40000L && idx.length === 3)
    idx.zip(Seq(f0, f1, f2)).foreach { case ((off, size), orig) =>
      assert(size === orig.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + size), orig))
    }
    assert(Multimodal.AviCodec.frameIndex(Array[Byte](1, 2, 3))._2.isEmpty)
  }

  test("frame sampling walks the real chunk index of video rows only") {
    val media = Multimodal.syntheticMedia(spark, 9)
    // video ids: 2, 5, 8; id 8 is a noise row (8 % 5 == 3? no: noise when
    // id % 5 == 4 → none of 2,5,8) — all three are real AVIs with
    // 2 + id%4 frames: id2→4, id5→3, id8→2
    val all = Multimodal.sampleFrames(media, stride = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = all.groupBy(_._1)
    assert(byId.keySet === Set(2L, 5L, 8L))
    assert(byId(2L).length === 4 && byId(5L).length === 3 && byId(8L).length === 2)
    // frame sizes match the encoder's JPEG lengths, indices are dense
    val (_, idx2) = Multimodal.AviCodec.frameIndex(Multimodal.SyntheticPayloads.avi(2L))
    assert(byId(2L).sortBy(_._2).map(_._3).toSeq === idx2.map(_._2.toLong))
    assert(byId(2L).map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    // stride 2 keeps even ordinals only
    val strided = Multimodal.sampleFrames(media, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strided.forall(_._2 % 2 == 0))
    assert(strided.count(_._1 == 2L) === 2 && strided.count(_._1 == 5L) === 2)
    // a noise video row contributes zero frames
    import spark.implicits._
    val noisy = spark.createDataset(Seq(
      Multimodal.MediaRecord(99L, "video", Multimodal.SyntheticPayloads.noise(99L), None, None, None)))
    assert(Multimodal.sampleFrames(noisy, stride = 1).count() === 0L)
  }
}

/** Plan-shape audit: the optimizations the 100 TB posture depends on must
  * actually appear in the physical plan (SURVEY.md §4).
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(key: String): String = {
    val df = SparkEntry.queries(key)(spark, sf)
    df.collect() // finalize AQE so the executed plan shows real stages
    df.queryExecution.executedPlan.toString
  }

  /** Formatted pre-execution plan: full PushedFilters lists (the executed
    * plan's one-line scan rendering truncates long metadata) and the
    * static exchange count (no AQE shuffle-read wrappers double-counting).
    */
  private def fullPlan(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("filter_eq pushes the predicate into the parquet scan") {
    val p = plan("filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"predicate not pushed:\n$p")
  }

  test("q1_pricing prunes columns at the scan") {
    val p = plan("q1_pricing")
    assert(!p.contains("l_orderkey"), "unused column not pruned from scan")
    assert(p.contains("l_returnflag"))
  }

  test("q3_top_orders broadcasts the dimension and takes ordered top-k") {
    val p = plan("q3_top_orders")
    assert(p.contains("BroadcastHashJoin"), s"dimension join not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p")
  }

  test("window aggregations run as partial+final hash aggregate") {
    val p = plan("tumbling_count")
    assert(p.contains("partial_count"), s"no map-side partial aggregation:\n$p")
    assert(p.contains("*(1)"), s"no whole-stage-codegen span markers:\n$p") // *(n) = codegen'd stage
  }

  test("window_join is an equi-join, not a nested loop") {
    val p = plan("window_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"window join degraded to a non-equi join:\n$p")
  }

  test("interval_join plans as an equi-join with a range filter, not cartesian") {
    val p = plan("interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join degraded:\n$p")
  }

  test("topk_per_key pushes rank<=k into WindowGroupLimit (no full sort of losers)") {
    val p = plan("topk_per_key")
    assert(p.contains("WindowGroupLimit"), s"rank filter not pushed into the window:\n$p")
  }

  test("asof_join is a single-shuffle window scan, no join operator at all") {
    val p = plan("asof_join")
    assert(!p.contains("Join"), s"as-of join should be the union-scan idiom:\n$p")
    assert(p.contains("Window") || p.contains("WindowGroupLimit") || p.contains("RunningWindowFunction"),
      s"expected a window operator:\n$p")
  }

  test("q4_order_priority plans the EXISTS as a semi join with pushed filters") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), s"EXISTS did not plan as a semi join:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag filter not pushed to the scan:\n$p")
  }

  test("q16_supplier_cnt plans the NOT IN as a broadcast anti join") {
    val p = plan("q16_supplier_cnt")
    assert(p.contains("LeftAnti"), s"NOT IN did not plan as an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"tiny exclusion set not broadcast:\n$p")
  }

  test("q7_nation_volume pushes the ship-date range to the scan and broadcasts dims") {
    val p = plan("q7_nation_volume")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      s"date range not pushed to the lineitem scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation/supplier dims not broadcast:\n$p")
  }

  test("q10_returned takes ordered top-k and aggregates before the customer join") {
    val p = plan("q10_returned")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not TakeOrdered:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed to the scan:\n$p")
  }

  test("q6_forecast pushes every predicate into one scan, no join") {
    val p = fullPlan("q6_forecast")
    assert(!p.contains("Join"), s"Q6 should be scan+aggregate only:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.03)") &&
      p.contains("LessThan(l_quantity,24.0)"),
      s"discount/quantity band not pushed to the scan:\n$p")
  }

  test("q13_cust_orders aggregates orders per customer BEFORE the outer join") {
    val p = plan("q13_cust_orders")
    assert(p.contains("LeftOuter"), s"zero-order customers need an outer join:\n$p")
    // the aggregate-first shape: per-custkey counts are built under the
    // broadcast side of the join, so the join input is |customers|-sized
    assert(p.contains("partial_count"), s"no pre-join partial aggregation:\n$p")
  }

  test("q19_disjunct factors the OR groups into pushed per-scan filters") {
    val p = fullPlan("q19_disjunct")
    // Catalyst extracts each side's disjunction: lineitem gets the quantity
    // bands, part gets the brand/size bands — both as parquet PushedFilters
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      s"quantity disjunction not pushed to the lineitem scan:\n$p")
    assert(p.contains("EqualTo(p_brand,Brand#12)"),
      s"brand/size disjunction not pushed to the part scan:\n$p")
  }

  test("q2_min_cost_supp: min_by hash-agg argmin (no window sort), part filter below the agg") {
    val p = fullPlan("q2_min_cost_supp")
    // the argmin is a min_by aggregation — no per-part sort of the
    // (part, supplier) intermediate ever happens
    assert(p.contains("min_by"), s"argmin not a min_by aggregation:\n$p")
    assert(!p.contains("WindowGroupLimit") && !p.contains(" Window "),
      s"argmin regressed to a window sort:\n$p")
    // the watched-part filter reaches the part scan, i.e. the join sits
    // BELOW the aggregation and prunes its input
    assert(p.contains("LessThanOrEqual(p_size,5)"),
      s"part filter not pushed to the scan below the aggregation:\n$p")
  }

  test("q21_waiting plans without Expand (no countDistinct row blowup)") {
    val p = fullPlan("q21_waiting")
    assert(!p.contains("Expand"), s"pair-aggregation rewrite regressed to Expand:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not TakeOrdered:\n$p")
  }

  test("q20_excess_suppliers plans the supplier filter as a semi join") {
    val p = fullPlan("q20_excess_suppliers")
    assert(p.contains("LeftSemi"), s"IN subquery did not plan as a semi join:\n$p")
  }

  test("dedup_keep_best shuffles hashes once and shares one window partitioning") {
    val p = fullPlan("dedup_keep_best")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected a single hash exchange on nh, got $exchanges:\n$p")
    // the shuffled projection carries (id, hash, length) — never the text
    val exchangeInputs = """\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]""".r
      .findAllMatchIn(p).map(_.group(1)).mkString(";")
    assert(exchangeInputs.nonEmpty && !exchangeInputs.contains("text#"),
      s"window shuffle must carry hashes, not document text: [$exchangeInputs]\n$p")
  }
}

/** Cross-checks of the new relational shapes against Spark SQL's own
  * subquery planner (EXISTS / NOT IN) over the same parquet — a second,
  * independent formulation inside the engine, complementing the DuckDB
  * oracle outside it.
  */
class RelationalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q4_order_priority equals Spark SQL's own EXISTS formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q4_order_priority")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === viaSql)
    assert(got.size === 5 && got.values.forall(_ > 0))
  }

  test("q16_supplier_cnt equals Spark SQL's own NOT IN formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = SparkEntry.queries("q16_supplier_cnt")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q7_nation_volume equals Spark SQL's double-nation-alias formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND sn.n_name < cn.n_name
        |GROUP BY 1, 2, 3""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    val got = SparkEntry.queries("q7_nation_volume")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q14_promo equals Spark SQL's conditional-aggregate formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin)
      .collect()(0).getDouble(0)
    val got = SparkEntry.queries("q14_promo")(spark, sf).collect()(0).getDouble(0)
    assert(got === viaSql)
    assert(got > 0.0 && got < 100.0)
  }

  test("q6_forecast equals Spark SQL's filter-aggregate formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin).collect()(0)
    val got = SparkEntry.queries("q6_forecast")(spark, sf).collect()(0)
    assert(got.getDouble(0) === viaSql.getDouble(0))
    assert(got.getLong(1) === viaSql.getLong(1) && got.getLong(1) > 0)
  }

  test("q13_cust_orders (aggregate-first) equals Spark SQL's join-then-aggregate") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY 1)
        |GROUP BY 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q13_cust_orders")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === viaSql)
    assert(got.values.sum === spark.sql("SELECT count(*) FROM customer").collect()(0).getLong(0))
  }

  test("q15_top_supplier equals Spark SQL's scalar-max-subquery formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val got = SparkEntry.queries("q15_top_supplier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q19_disjunct equals Spark SQL's OR-predicate formulation") {
    // sf0.01: the three brand/size/quantity bands match zero rows at sf0.001
    val sf = "/root/testdata/sf0.01"
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
      .collect()(0)
    val got = SparkEntry.queries("q19_disjunct")(spark, sf).collect()(0)
    assert(got.getDouble(0) === viaSql.getDouble(0))
    assert(got.getLong(1) === viaSql.getLong(1) && got.getLong(1) > 0)
  }

  test("q2_min_cost_supp equals Spark SQL's correlated-min-subquery formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    // the classic Q2 correlated form — Spark plans it as its own
    // aggregate+join; our registry plans argmin-per-group. Same rows.
    val viaSql = spark.sql(
      """WITH ap AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, p_brand, s_name, avg_price
        |FROM ap JOIN part ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_size <= 5
        |  AND (avg_price, l_suppkey) = (SELECT min(struct(i.avg_price, i.l_suppkey))
        |                                FROM ap i WHERE i.l_partkey = ap.l_partkey)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    val got = SparkEntry.queries("q2_min_cost_supp")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q11_important_parts equals Spark SQL's scalar-fraction formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """WITH v AS (SELECT l_partkey,
        |    sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS dec_value
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(dec_value AS DOUBLE) AS part_value FROM v
        |WHERE CAST(dec_value AS DOUBLE) >
        |  1.6 * CAST((SELECT sum(dec_value) FROM v) AS DOUBLE) / (SELECT count(*) FROM v)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = SparkEntry.queries("q11_important_parts")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q20_excess_suppliers equals Spark SQL's nested-IN formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """WITH sq AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND p_name LIKE 'red%'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey AS t_partkey, sum(supp_qty) AS total_qty FROM sq GROUP BY 1)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM sq JOIN pt ON l_partkey = t_partkey
        |  WHERE supp_qty > 0.2 * total_qty)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = SparkEntry.queries("q20_excess_suppliers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q21_waiting equals Spark SQL's per-order aggregate formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """WITH po AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
        |         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
        |       FROM lineitem GROUP BY 1),
        |rl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        |w AS (SELECT rl.l_suppkey, count(*) AS numwait
        |      FROM rl JOIN po ON rl.l_orderkey = po.l_orderkey
        |      WHERE po.n_supp > 1 AND po.n_r_supp = 1
        |      GROUP BY 1)
        |SELECT s_name, numwait FROM supplier JOIN w ON s_suppkey = l_suppkey
        |ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = SparkEntry.queries("q21_waiting")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q22_idle_custs equals Spark SQL's scalar-avg + NOT EXISTS formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |                   FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = SparkEntry.queries("q22_idle_custs")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === viaSql)
    assert(got.nonEmpty)
  }

  test("q8_market_share equals Spark SQL's nested-subquery formulation") {
    graft.engine.GraftSql.registerTables(spark, sf)
    // the classic Q8 form: all-nations volume table in a subquery, share
    // as a conditional-sum ratio over it
    val viaSql = spark.sql(
      """SELECT o_year,
        |  CAST(sum(CAST(CASE WHEN nation = 'NATION_6' THEN volume ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
        |  / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
        |FROM (SELECT year(o_orderdate) AS o_year,
        |        l_extendedprice * (1.0 - l_discount) AS volume,
        |        sn.n_name AS nation
        |      FROM lineitem
        |        JOIN part ON l_partkey = p_partkey
        |        JOIN supplier ON l_suppkey = s_suppkey
        |        JOIN nation sn ON s_nationkey = sn.n_nationkey
        |        JOIN orders ON l_orderkey = o_orderkey
        |        JOIN customer ON o_custkey = c_custkey
        |        JOIN nation cn ON c_nationkey = cn.n_nationkey
        |        JOIN region ON cn.n_regionkey = r_regionkey
        |      WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA') v
        |GROUP BY 1""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val got = SparkEntry.queries("q8_market_share")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got === viaSql)
    assert(got.nonEmpty && got.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("q12_priority_class: high+low counts partition the joined rows") {
    graft.engine.GraftSql.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = SparkEntry.queries("q12_priority_class")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === viaSql)
    // every joined row lands in exactly one class
    val joined = spark.sql(
      """SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin).collect()(0).getLong(0)
    assert(got.values.map(v => v._1 + v._2).sum === joined)
  }
}
