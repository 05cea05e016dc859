package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming layer: the unbounded twins of the batch operators.
  *
  * Mapping from the reference (SURVEY.md §2.8-2.9):
  *  - WatermarkStrategy.forBoundedOutOfOrderness ≙ `withWatermark`
  *    (reference: WindowFunctions.scala:43-49). Arbitrary custom
  *    WatermarkGenerator policies (TimeBasedTransformations.scala:76-91)
  *    are NOT implementable in Structured Streaming; the one the reference
  *    actually builds is exactly the bounded-out-of-orderness policy
  *    `withWatermark` provides — documented deviation for the general case.
  *  - CountTrigger / PurgingTrigger (reference: Triggers.scala:19-40) ≙
  *    keyed state: buffer count per key, emit on every n-th element;
  *    purging clears state on fire, accumulating keeps it.
  *  - connect + CoProcessFunction (reference: MultipleStreams.scala:106-145)
  *    ≙ union of an envelope type + flatMapGroupsWithState holding
  *    per-side counters.
  *
  * Scale notes: all stateful ops are keyed, so state is hash-partitioned
  * across executors and checkpointed by the state store. The reference's
  * parallelism-1 global patterns (connect with instance-local state,
  * GlobalWindows) keep their semantics under a constant key — a documented
  * single-partition hotspot; prefer real keys at scale (SURVEY.md §7.5).
  */
object StreamingOps {

  /** Shopping-cart event model (reference: Shopping.scala:13-30, flattened
    * per SURVEY.md §1.3: sealed trait → event_type discriminator).
    */
  case class ShoppingCartEvent(user_id: String, sku: String, quantity: Int,
                               time: Timestamp, event_type: String)

  /** Catalog event model (reference: Shopping.scala:156-166). */
  case class CatalogEvent(user_id: String, time: Timestamp, product_id: String)

  /** Streaming tumbling window count with bounded-out-of-orderness
    * watermark (reference: WindowFunctions.scala:43-66 via
    * TumblingEventTimeWindows; append mode emits each window once, when the
    * watermark passes its end — the event-time-trigger firing Flink does).
    */
  def tumblingCounts(events: DataFrame, tsCol: String, delay: String, size: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("window.end").as("we"), col("cnt"))

  /** Streaming full-window buffer — the unbounded twin of
    * [[graft.operators.Windows.windowElements]] (reference
    * `ProcessAllWindowFunction` receiving the whole window's elements,
    * WindowFunctions.scala:58-63). The buffered `Iterable[T]` is a
    * `collect_list` aggregation (partial lists merge incrementally in the
    * state store — no full-window recompute per event), emitted once per
    * window in append mode as the same canonical sorted comma-joined
    * string as the batch operator.
    */
  def tumblingElements(events: DataFrame, tsCol: String, delay: String,
                       size: String, idCol: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size))
      .agg(concat_ws(",", sort_array(collect_list(col(idCol)))).as("ids"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("ids"))

  /** Streaming keyed tumbling count (reference: WindowFunctions.scala:109-121). */
  def keyedTumblingCounts(events: DataFrame, keyCol: String, tsCol: String,
                          delay: String, size: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), window(col(tsCol), size))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol), col("window.start").as("ws"), col("cnt"))

  /** Streaming sliding-window count (reference: slidingAllWindows,
    * WindowFunctions.scala:147-158).
    */
  def slidingCounts(events: DataFrame, tsCol: String, delay: String,
                    size: String, slide: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))

  /** Streaming session-window count (reference: sessionWindows,
    * WindowFunctions.scala:169-177): sessions finalize when the watermark
    * passes their (gap-extended) end. Streaming session aggregation MUST
    * be keyed (Spark rejects global session aggs — state has to hash-
    * partition); the reference's non-keyed variant exists in batch only
    * ([[graft.operators.Windows.sessionCount]]).
    */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    delay: String, gap: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol), col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("cnt"))

  /** Stream-stream window join (reference: MultipleStreams.scala:36-57 —
    * pairs restricted to the same tumbling window, here on event time):
    * equality on the `window()` struct is a time constraint Spark's
    * symmetric hash join uses for state eviction, so each side retains
    * only the watermark-open windows.
    */
  def windowJoin(a: DataFrame, b: DataFrame, keyCol: String,
                 aTs: String, bTs: String, delay: String, size: String): DataFrame = {
    // if the two event-time columns share a name, prefix the right one so
    // the output schema is selectable by name
    val (rb, rbTs) = if (aTs == bTs) (b.withColumnRenamed(bTs, s"r_$bTs"), s"r_$bTs") else (b, bTs)
    val l = a.withWatermark(aTs, delay).withColumn("w", window(col(aTs), size))
    val r = rb.withWatermark(rbTs, delay).withColumn("w", window(col(rbTs), size))
    l.join(r, l(keyCol) === r(keyCol) && l("w") === r("w"))
      .drop(r(keyCol)).drop(l("w")).drop(r("w"))
  }

  /** Stream-stream LEFT OUTER window join: same window-equality constraint
    * as [[windowJoin]], but an unmatched left row still emits (with null
    * right columns) — ONCE the watermark has closed its window, which is
    * when the symmetric hash join can prove no future right match exists.
    * This is the streaming "enrich if present" join; the inner variant
    * silently drops unenriched rows. State stays watermark-bounded on both
    * sides (outer-ness changes emission, not retention).
    */
  def windowJoinOuter(a: DataFrame, b: DataFrame, keyCol: String,
                      aTs: String, bTs: String, delay: String, size: String): DataFrame = {
    val (rb, rbTs) = if (aTs == bTs) (b.withColumnRenamed(bTs, s"r_$bTs"), s"r_$bTs") else (b, bTs)
    val rk = s"r_$keyCol"
    val l = a.withWatermark(aTs, delay).withColumn("w", window(col(aTs), size))
    val r = rb.withColumnRenamed(keyCol, rk)
      .withWatermark(rbTs, delay).withColumn("w", window(col(rbTs), size))
    l.join(r, l(keyCol) === r(rk) && l("w") === r("w"), "left_outer")
      .drop(rk).drop(l("w")).drop(r("w"))
  }

  /** Stream-stream interval join with exclusive bounds (reference:
    * MultipleStreams.scala:61-103): equi-key + time-range condition plans a
    * StreamingSymmetricHashJoin; watermarks bound each side's state
    * retention (SURVEY.md §3.2).
    */
  def intervalJoin(a: DataFrame, b: DataFrame, keyCol: String,
                   aTs: String, bTs: String, delay: String, interval: String): DataFrame = {
    val (rb, rbTs) = if (aTs == bTs) (b.withColumnRenamed(bTs, s"r_$bTs"), s"r_$bTs") else (b, bTs)
    val l = a.withWatermark(aTs, delay)
    val r = rb.withWatermark(rbTs, delay)
    l.join(r,
        l(keyCol) === r(keyCol) &&
          r(rbTs) > l(aTs) - expr(s"INTERVAL $interval") &&
          r(rbTs) < l(aTs) + expr(s"INTERVAL $interval"))
      .drop(r(keyCol))
  }

  case class CountTriggerState(count: Long)
  case class CountFire(key: String, fire_count: Long)

  /** CountTrigger.of(n): fire the (accumulating) window every n elements —
    * emits n, 2n, 3n… per key (reference: Triggers.scala:19-28).
    * PurgingTrigger.of(CountTrigger.of(n)): clear on fire — emits n, n, n…
    * (reference: Triggers.scala:31-40). `purging` toggles the two.
    */
  def countTrigger(events: Dataset[ShoppingCartEvent], n: Int, purging: Boolean): Dataset[CountFire] = {
    require(n > 0, s"count trigger requires n > 0 (got $n)")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[ShoppingCartEvent], state: GroupState[CountTriggerState]) => {
          var cnt = state.getOption.map(_.count).getOrElse(0L)
          val fires = scala.collection.mutable.ArrayBuffer.empty[CountFire]
          rows.toSeq.sortBy(_.time.getTime).foreach { _ =>
            cnt += 1
            if (cnt % n == 0) {
              fires += CountFire(key, if (purging) n.toLong else cnt)
              if (purging) cnt = 0
            }
          }
          state.update(CountTriggerState(cnt))
          fires.iterator
        })
  }

  /** Spark 4-native twin of [[countTrigger]] on the `transformWithState`
    * API (StatefulProcessor + typed ValueState, RocksDB-backed): the
    * long-term home for custom stateful operators — explicit state
    * variables, timers, TTL — replacing `flatMapGroupsWithState`'s single
    * state blob. Both implementations are kept: flatMapGroupsWithState
    * works on any state store; this one requires RocksDB
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  class CountTriggerProcessor(n: Int, purging: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, ShoppingCartEvent, CountFire] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var countState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long](
        "count", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ShoppingCartEvent],
                                 timerValues: TimerValues): Iterator[CountFire] = {
      var cnt = if (countState.exists()) countState.get() else 0L
      val fires = scala.collection.mutable.ArrayBuffer.empty[CountFire]
      rows.toSeq.sortBy(_.time.getTime).foreach { _ =>
        cnt += 1
        if (cnt % n == 0) {
          fires += CountFire(key, if (purging) n.toLong else cnt)
          if (purging) cnt = 0
        }
      }
      countState.update(cnt)
      fires.iterator
    }
  }

  def countTriggerTws(events: Dataset[ShoppingCartEvent], n: Int, purging: Boolean): Dataset[CountFire] = {
    require(n > 0, s"count trigger requires n > 0 (got $n)")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new CountTriggerProcessor(n, purging),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  case class SessionOut(key: String, ss_ms: Long, se_ms: Long, cnt: Long)

  /** Custom gap-session operator on event-time TIMERS — the full
    * Flink-trigger machinery on the transformWithState API. Sessions live
    * in state until the WATERMARK passes their gap-extended end (timers via
    * `registerTimer` → `handleExpiredTimer`); nothing emits early, so a
    * late-but-legal event can still extend or merge into any buffered
    * session (including backward start extension — events are not assumed
    * ordered). Built-in `session_window` is the production path; this
    * demonstrates arbitrary timer-driven window policies the built-ins
    * can't express.
    */
  class SessionGapProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, ShoppingCartEvent, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimeMode, TimerValues, TTLConfig}
    // buffered sessions: (start, last, count), open or gap-closed — all
    // held until the watermark passes last+gap
    @transient private var sessions: ListState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sessions = getHandle.getListState[(Long, Long, Long)](
        "sessions",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Long)](),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ShoppingCartEvent],
                                 tv: TimerValues): Iterator[SessionOut] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      if (sessions.exists()) buf ++= sessions.get()
      val endsBefore = buf.map(_._2 + gapMs).toSet
      rows.foreach { e =>
        val t = e.time.getTime
        // merge into every session within gap reach of t, then coalesce
        val (touching, rest) = buf.partition { case (s, last, _) =>
          t >= s - gapMs && t <= last + gapMs
        }
        val merged =
          if (touching.isEmpty) (t, t, 1L)
          else (
            math.min(t, touching.map(_._1).min),
            math.max(t, touching.map(_._2).max),
            touching.map(_._3).sum + 1)
        buf.clear(); buf ++= rest; buf += merged
      }
      // timer hygiene: drop timers whose session end moved (extension /
      // merge), register only the new ends — state and firings stay
      // proportional to live sessions, not to update count
      val endsAfter = buf.map(_._2 + gapMs).toSet
      (endsBefore -- endsAfter).foreach(getHandle.deleteTimer)
      (endsAfter -- endsBefore).foreach(getHandle.registerTimer)
      sessions.put(buf.toArray)
      Iterator.empty // emission is exclusively watermark-driven
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!sessions.exists()) return Iterator.empty
      val all = sessions.get().toSeq
      // stale timers fire for since-extended sessions: close only those
      // whose gap-extended end the expired timer actually covers
      val (done, open) = all.partition { case (_, last, _) => last + gapMs <= info.getExpiryTimeInMs() }
      if (open.isEmpty) sessions.clear() else sessions.put(open.toArray)
      done.sortBy(_._1).iterator.map { case (s, last, n) => SessionOut(key, s, last + gapMs, n) }
    }
  }

  /** Timer-driven session counts via [[SessionGapProcessor]] (requires the
    * RocksDB state store and an event-time watermark upstream).
    */
  def sessionCountsTws(events: Dataset[ShoppingCartEvent], delay: String, gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.toDF()
      .withWatermark("time", delay)
      .as[ShoppingCartEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionGapProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Envelope for connect-style co-processing of two differently-typed
    * streams (SURVEY.md §1.4: ConnectedStreams → union of an Either-style
    * envelope + keyed state).
    */
  case class SideEvent(gkey: Int, side: Int, time: Timestamp)
  case class RatioState(a: Long, b: Long)
  case class Ratio(ratio: Double)

  /** connect + CoProcessFunction running ratio: emits
    * a*100/(a+b) after every element (reference: MultipleStreams.scala:
    * 118-141). Constant `gkey` reproduces the reference's forced
    * parallelism-1; real deployments key by a meaningful dimension.
    */
  def coProcessRatio(sides: Dataset[SideEvent]): Dataset[Ratio] = {
    import sides.sparkSession.implicits._
    sides
      .groupByKey(_.gkey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Int, rows: Iterator[SideEvent], state: GroupState[RatioState]) => {
          var s = state.getOption.getOrElse(RatioState(0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Ratio]
          rows.toSeq.sortBy(_.time.getTime).foreach { e =>
            s = if (e.side == 0) s.copy(a = s.a + 1) else s.copy(b = s.b + 1)
            out += Ratio(s.a * 100.0 / (s.a + s.b))
          }
          state.update(s)
          out.iterator
        })
  }

  /** Streaming exact dedup — the unbounded twin of the batch
    * `dedup_exact` path: first occurrence of each key passes, repeats are
    * dropped. `dropDuplicatesWithinWatermark` keys the dedup state by
    * `keyCols` and EXPIRES each key's state once the watermark passes its
    * event time + delay — the property that makes streaming dedup viable
    * at 100 TB/day: state is bounded by the watermark horizon, not by the
    * all-time key cardinality (plain `dropDuplicates` on a stream grows
    * state forever). Within the horizon the guarantee is exact; a
    * duplicate arriving later than `delay` after the original is a
    * documented miss — the same trade Flink makes with state TTL.
    */
  def dedupStream(events: DataFrame, tsCol: String, delay: String,
                  keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static contamination scan — the streaming twin of the batch
    * `contamination_check`: incoming documents shingle in-flight and join
    * against a STATIC benchmark shingle set (the stream-static join:
    * Spark broadcasts/rescans the static side per micro-batch, no state,
    * no watermark requirement — the static side is the ingestion-time
    * "eval suite" every arriving training document is screened against).
    *
    * Every stateful step is watermark-bounded, so state cannot grow with
    * corpus lifetime at 100 TB/day:
    *  - within-doc shingle repeats collapse ROW-LOCALLY (`array_distinct`
    *    on the sampled shingle array before the explode) — a document is
    *    one row, so this needs zero cross-row state, where a streaming
    *    `dropDuplicates(id, sh)` would pin every (doc, shingle) pair
    *    forever;
    *  - redelivered documents are dropped by
    *    `dropDuplicatesWithinWatermark(id)` — the same bounded-horizon
    *    trade [[dedupStream]] makes;
    *  - the per-doc count is keyed by (event-time window, doc), so the
    *    watermark retires each window's groups once it passes.
    * A duplicate or straggler arriving later than `delay` after the
    * original is a documented miss, exactly as in [[dedupStream]].
    *
    * At 100 TB/day the static side is the small one (benchmark suites,
    * not the corpus) — exactly the side Spark keeps in memory.
    */
  def contaminationStream(docs: DataFrame, idCol: String, textCol: String,
                          tsCol: String, delay: String,
                          benchShingles: DataFrame, width: Int = 8, stride: Int = 4,
                          windowDur: String = "1 minute"): DataFrame = {
    import org.apache.spark.sql.functions._
    val uniq = docs
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)
    val sh = uniq.filter(length(col(textCol)) >= width)
      .select(col(idCol), col(tsCol),
        explode(expr(
          s"""array_distinct(transform(
             |  sequence(1, length($textCol) - ${width - 1}, $stride),
             |  i -> substring($textCol, CAST(i AS INT), $width)))""".stripMargin)).as("sh"))
    sh.join(benchShingles, Seq("sh")) // stream-static inner join: stateless
      .groupBy(window(col(tsCol), windowDur), col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("n_shared"))
  }

  /** Streaming split-leakage monitor — the per-batch twin of
    * [[graft.functions.Curation.splitLeakage]], flagging ingest documents
    * whose near-duplicates already sit in a DIFFERENT train/val/test
    * split of the staged corpus (the quarantine signal, caught at
    * ingestion time instead of in the nightly audit).
    *
    * The batch operator's two primitives restate cleanly on a stream:
    *  - the corpus side is the STATIC minhash band index
    *    ([[graft.functions.Dedup.bandIndex]]) plus the (id, split)
    *    assignment — at 100 TB both are read from storage, and they are
    *    the SMALL side of every stream-static join here;
    *  - the stream side computes its signature ROW-LOCALLY: a document's
    *    shingles live inside its own text column, so min-hashing is an
    *    `array_min` over in-row md5 digests — zero cross-row state where
    *    the batch path's `groupBy(doc)` would be a stateful aggregation.
    *    Identical values by construction (min over the same shingle set,
    *    same digest slices, same band composition as
    *    [[graft.functions.Dedup.minhashSignatures]]), spec-pinned against
    *    the batch pairs in StreamingSpec.
    * The split of the INCOMING document is the per-row hash expression
    * [[graft.functions.TextAnalysis.splitOf]] — stateless by design.
    *
    * Stateful steps are watermark-bounded exactly like
    * [[contaminationStream]]: redelivered documents drop via
    * `dropDuplicatesWithinWatermark(id)`, and band-collision duplicate
    * candidates collapse via `dropDuplicatesWithinWatermark(doc_a,
    * doc_b)` — state is the watermark horizon, never corpus lifetime.
    * Output: one (doc_a = new, doc_b = staged, split_a, split_b) row per
    * offending cross-split pair.
    */
  /** Per-row MinHash signatures for a STREAMING document frame: a
    * document's shingles live inside its own text column, so min-hashing
    * is an `array_min` over in-row md5 digests — zero cross-row state
    * where the batch path's `groupBy(doc)` would be a stateful
    * aggregation. Identical values to [[graft.functions.Dedup
    * .minhashSignatures]] by construction (min over the same shingle
    * set, same digest slices). Output: (idCol, tsCol, mh_1..mh_n).
    * Shared by [[splitLeakageStream]] and [[dedupIncrementalStream]].
    */
  private def inRowSignatures(docs: DataFrame, idCol: String, textCol: String,
                              tsCol: String, delay: String, numHashes: Int,
                              width: Int, stride: Int): DataFrame = {
    val dstride = if (numHashes == 1) 0 else math.max(1, (32 - 8) / (numHashes - 1))
    val uniq = docs.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCol)
    // in-row digests: one md5 per sampled shingle position, shared by all
    // numHashes signature slots
    val digests = uniq.filter(length(col(textCol)) >= width)
      .select(col(idCol), col(tsCol),
        transform(expr(
          s"""transform(sequence(1, length($textCol) - ${width - 1}, $stride),
             |  i -> substring($textCol, CAST(i AS INT), $width))""".stripMargin),
          s => md5(s)).as("ds"))
    val mh = (1 to numHashes).map { j =>
      array_min(transform(col("ds"),
        d => substring(d, (j - 1) * dstride + 1, 8))).as(s"mh_$j")
    }
    digests.select(col(idCol) +: col(tsCol) +: mh: _*)
  }

  /** The (band, sig) struct array over mh_1..mh_n columns — band
    * composition mirrors [[graft.functions.Dedup.minhashBands]]: slot j
    * pairs with j + numBands so band slices stay digest-disjoint.
    */
  private def bandStructsOf(numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    require(numHashes % rowsPerBand == 0, "numHashes must be a multiple of rowsPerBand")
    val numBands = numHashes / rowsPerBand
    (0 until numBands).map { b =>
      val sig = concat_ws(",",
        (0 until rowsPerBand).map(r => col(s"mh_${b + 1 + r * numBands}")): _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
  }

  def splitLeakageStream(docs: DataFrame, idCol: String, textCol: String,
                         tsCol: String, delay: String,
                         corpusBands: DataFrame, corpusSplits: DataFrame,
                         numHashes: Int = 8, rowsPerBand: Int = 2,
                         width: Int = 8, stride: Int = 4): DataFrame = {
    val sigs = inRowSignatures(docs, idCol, textCol, tsCol, delay, numHashes, width, stride)
    val newBands = sigs
      .select(col(idCol).as("doc_a"), col(tsCol),
        explode(array(bandStructsOf(numHashes, rowsPerBand): _*)).as("bs"))
      .select(col("doc_a"), col(tsCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val ex = corpusBands.select(col(idCol).as("doc_b"),
      col("band").as("band_b"), col("sig").as("sig_b"))
    val cand = newBands
      .join(ex, col("band") === col("band_b") && col("sig") === col("sig_b") &&
        col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col(tsCol))
      .dropDuplicatesWithinWatermark("doc_a", "doc_b")
    val sb = corpusSplits.select(col(idCol).as("doc_b"), col("split").as("split_b"))
    cand
      .withColumn("split_a", graft.functions.TextAnalysis.splitOf(col("doc_a")))
      .join(sb, Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"))
  }

  case class IncrMatch(doc_new: Long, n_matches: Long, best_match: Long, best_jacc: Double)

  /** Streaming incremental dedup — the LIVE ingest near-dup gate, the
    * streaming twin of [[graft.functions.SigIndex.dedupIncrementalStaged]]:
    * each arriving document is signed ROW-LOCALLY ([[inRowSignatures]] —
    * identical values to the batch signature build), banded, and matched
    * against the STORED corpus signature index (band index for
    * candidates, signature table for est-Jaccard scoring — both static
    * frames off [[graft.functions.SigIndex.stageOnce]]'s store). Per
    * document the report is the batch operator's exact contract: match
    * count, best-matching corpus doc (est desc, min-id tie-break), and
    * the agreeing-slot similarity estimate — ranked per micro-batch in
    * `flatMapGroupsWithState` (the per-key window restatement), with
    * served-state making redelivery idempotent. Band-collision duplicate
    * candidates collapse via `dropDuplicatesWithinWatermark` exactly
    * like [[splitLeakageStream]].
    *
    * Scale shape: the corpus side is storage-resident and never
    * reshuffles per batch; the stream pays one in-row signing + a
    * band-keyed join per document — the honest per-document ingest
    * cost, identical to what the staged batch serve pays per batch row.
    */
  def dedupIncrementalStream(docs: DataFrame, idCol: String, textCol: String,
                             tsCol: String, delay: String,
                             corpusSigs: DataFrame, corpusBands: DataFrame,
                             threshold: Double = 0.5,
                             numHashes: Int = 8, rowsPerBand: Int = 2,
                             width: Int = 8, stride: Int = 4,
                             servedTtl: Option[java.time.Duration] =
                               Some(java.time.Duration.ofHours(1))): Dataset[IncrMatch] = {
    import docs.sparkSession.implicits._
    val sigs = inRowSignatures(docs, idCol, textCol, tsCol, delay, numHashes, width, stride)
    // carry the stream doc's signature through the band explode: a
    // stream cannot re-join itself to fetch it back later
    val mhCols = (1 to numHashes).map(j => col(s"mh_$j"))
    val newBands = sigs
      .select(col(idCol).as("doc_new") +: col(tsCol) +:
        explode(array(bandStructsOf(numHashes, rowsPerBand): _*)).as("bs") +: mhCols: _*)
    val ex = corpusBands.select(col(idCol).as("doc_ex"),
      col("band").as("band_x"), col("sig").as("sig_x"))
    val cand = newBands
      .join(ex, col("bs.band") === col("band_x") && col("bs.sig") === col("sig_x"))
      .select(col("doc_new") +: col(tsCol) +: col("doc_ex") +: mhCols: _*)
      .dropDuplicatesWithinWatermark("doc_new", "doc_ex")
    val b = corpusSigs.select(col(idCol).as("doc_ex") +:
      (1 to numHashes).map(j => col(s"mh_$j").as(s"b_$j")): _*)
    val agree = (1 to numHashes)
      .map(j => when(col(s"mh_$j") === col(s"b_$j"), 1).otherwise(0)).reduce(_ + _)
    cand.join(b, Seq("doc_ex"))
      .select(col("doc_new"), col("doc_ex"), (agree.cast("double") / numHashes).as("est"))
      .filter(col("est") >= threshold)
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, servedTimeoutConf(servedTtl))(
        servedOnce[Long, (Long, Long, Double), IncrMatch](servedTtl) { (doc, ms) =>
          // est desc, min-id tie-break — the batch window's exact order
          val best = ms.minBy(r => (-r._3, r._2))
          Iterator.single(IncrMatch(doc, ms.size.toLong, best._2, best._3))
        })
  }

  case class FunnelEvent(user_id: Long, event_type: String, us: Long)
  case class FunnelHit(user_id: Long, step: String, t_us: Long)
  case class FunnelProgress(hits: Seq[Long])

  /** Streaming twin of [[graft.operators.Extended.funnelSteps]]: per-user
    * first-hit chain through `steps`, each step converting only within
    * `winUs` µs of the previous step's first hit (strict '>' — the batch
    * operator's contract). State per user is the PREFIX of completed-step
    * first-hit times (≤ |steps| longs — bounded by construction, no TTL
    * needed); a step completion emits one append-mode [[FunnelHit]], so
    * counting hits per step downstream reproduces the batch (step,
    * n_users) table.
    *
    * Semantics note: the batch operator computes per-step MINIMA over the
    * whole input, which equals this greedy first-match when events arrive
    * in event-time order (rows within a micro-batch are sorted here; the
    * equivalence spec feeds batches in order). A cross-batch straggler
    * that would have improved an already-taken step time is a documented
    * miss — the same in-order trade every incremental funnel makes.
    *
    * State growth: per-key state is bounded, but the KEY set is the user
    * base — at production scale pass `ttl` (sized to the funnel's total
    * conversion horizon, e.g. |steps| × window) so inactive users' state
    * expires; a user converting later than the TTL restarts from step 1,
    * the standard funnel-tracker trade. `ttl = None` (tests, bounded
    * replays) keeps state forever.
    */
  class FunnelProcessor(steps: Seq[(String, String)], winUs: Long,
                        ttl: Option[java.time.Duration] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FunnelEvent, FunnelHit] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var progress: ValueState[FunnelProgress] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      progress = getHandle.getValueState[FunnelProgress](
        "progress", org.apache.spark.sql.Encoders.product[FunnelProgress],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[FunnelHit] = {
      var hits = if (progress.exists()) progress.get().hits else Seq.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
      rows.toSeq.sortBy(e => (e.us, e.event_type)).foreach { e =>
        val i = hits.length
        if (i < steps.length && e.event_type == steps(i)._1 &&
            (i == 0 || (e.us > hits.last && e.us <= hits.last + winUs))) {
          hits = hits :+ e.us
          out += FunnelHit(key, steps(i)._2, e.us)
        }
      }
      progress.update(FunnelProgress(hits))
      out.iterator
    }
  }

  /** Keyed [[FunnelProcessor]] on the transformWithState API (requires the
    * RocksDB state store provider, like the other TWS operators here).
    * `ttl` bounds per-user state lifetime — see the processor's scaladoc;
    * a TTL needs a clock, so setting it switches the operator to
    * processing-time mode (state expiry only; funnel ordering stays on
    * the event-time `us` field).
    */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[(String, String)],
                   winUs: Long,
                   ttl: Option[java.time.Duration] = None): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(steps, winUs, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  case class PackDoc(doc_id: Long, source: String, text: String)
  case class TimedDoc(doc_id: Long, text: String, ts: Timestamp)
  case class PackTok(doc_id: Long, source: String, shard: Long, tok: Long)
  case class PackAssign(doc_id: Long, source: String, shard: Long, seq_id: Long, tok: Long)
  case class PackRunning(running: Long)

  /** Streaming twin of [[graft.functions.Curation.docChunks]] — the live
    * half of the chunk-then-pack ingest path. Chunking is a pure per-row
    * 1→N expansion (stateless projection + generate), so the BATCH
    * operator applies to a streaming frame unchanged; this delegate
    * exists to make that contract explicit and spec-pinned
    * (StreamingSpec asserts stream output == batch output row-for-row).
    */
  def docChunksStream(docs: DataFrame, idCol: String, textCol: String,
                      chunkTokens: Int, overlap: Int): DataFrame =
    graft.functions.Curation.docChunks(docs, idCol, textCol, chunkTokens, overlap)

  /** Streaming twin of [[graft.functions.TextAnalysis.bpeEncodeStats]] —
    * tokenizer APPLICATION on the live ingest. The tokenizer itself is
    * trained OFFLINE (the universal deployment shape: merges are frozen
    * artifacts, retrained out-of-band), so the trained segmentation
    * arrives as a STATIC (tok, n_syms) frame
    * ([[graft.functions.TextAnalysis.bpeSegmentation]]) and the stream
    * side is a stateless explode + stream-static join, followed by one
    * watermarked per-(doc, window) aggregation — all of a document's
    * words carry its single event time, so the window never splits a
    * document and the per-doc stats equal the batch operator's
    * (StreamingSpec-asserted).
    */
  def bpeEncodeStream(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String, delay: String, segmentation: DataFrame,
                      windowLen: String = "1 day"): DataFrame = {
    val words = docs.withWatermark(tsCol, delay)
      .select(col(idCol), col(tsCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
    val vt = segmentation.select(col("tok").as("v_tok"), col("n_syms"))
    words.join(vt, col("tok") === col("v_tok"))
      .groupBy(col(idCol), window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("tok")).cast("long")).as("n_chars"),
        sum(col("n_syms")).as("n_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_tokens"), 4))
      .select(col(idCol), col("n_words"), col("n_chars"), col("n_tokens"),
        col("chars_per_token"))
  }

  /** Streaming twin of [[graft.functions.Curation.seqPacking]]: next-fit
    * token packing as a running budget per (source, shard) key — the
    * incremental form of the batch operator's running-sum window. State
    * per key is ONE long (the shard's running token total); each incoming
    * document emits exactly one append-mode assignment with the sequence
    * id its tokens start in, `running_before div budget` — identical
    * arithmetic to the batch `(running - tok) div budget`.
    *
    * Same in-order contract as [[FunnelProcessor]]: batch equivalence
    * holds when documents arrive in doc_id order within a shard (rows
    * within a micro-batch are sorted here; a cross-batch straggler packs
    * into the CURRENT budget position, which is exactly what a live
    * packer must do — sequences already emitted are immutable).
    *
    * Scale shape: state is one counter per (source, shard) — thousands of
    * keys, not documents; raise nShards with the corpus exactly like the
    * batch operator.
    */
  class SeqPackingProcessor(budget: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(String, Long), PackTok, PackAssign] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var run: ValueState[PackRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      run = getHandle.getValueState[PackRunning](
        "running", org.apache.spark.sql.Encoders.product[PackRunning], TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[PackTok],
                                 timerValues: TimerValues): Iterator[PackAssign] = {
      var running = if (run.exists()) run.get().running else 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[PackAssign]
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        out += PackAssign(d.doc_id, d.source, d.shard, running / budget, d.tok)
        running += d.tok
      }
      run.update(PackRunning(running))
      out.iterator
    }
  }

  /** Keyed [[SeqPackingProcessor]] on transformWithState (RocksDB state
    * store, like the other TWS operators here). Tokenization and shard
    * assignment run stateless upstream of the keyed state.
    */
  def seqPackingStream(docs: Dataset[PackDoc], budget: Int, nShards: Int): Dataset[PackAssign] = {
    import docs.sparkSession.implicits._
    docs.toDF()
      .select(col("doc_id"), col("source"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .as[PackTok]
      .groupByKey(t => (t.source, t.shard))
      .transformWithState(
        new SeqPackingProcessor(budget.toLong),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  case class AnnHit(q_id: Long, n_id: Long, cos_sim: Double, rank: Int)

  /** Streaming ANN serve — [[bm25TopKStream]]'s vector sibling: a stream
    * of query vectors searches the STAGED IVF index
    * ([[graft.functions.AnnIndex.stageOnce]]) with zero training lineage
    * in the streaming plan. The batch serve's nprobe-cell probe is a
    * rank WINDOW over (query × centroid) scores — unsupported on
    * streams — so here the probe is computed entirely in EXPRESSIONS:
    * the ≤4096-row centroid table aggregates to ONE static row holding
    * an array<struct<cell, cv, cnrm>>, the stream cross-joins that
    * 1-row broadcast, and per query `slice(array_sort(transform(...)),
    * 1, nprobe)` picks the nprobe nearest cells — struct sort on
    * (−sim, cell) reproduces the batch window's (sim desc, cell asc)
    * tie-break exactly. Candidates then come from a stream-static
    * equi-join against the stored postings on the probed cell, and the
    * per-query top-k ranks per micro-batch in `flatMapGroupsWithState`
    * (sort by cs desc / n_id asc — the batch serve's window order),
    * with one bit of served-state per q_id making redelivery idempotent
    * (StreamingSpec pins stream ≡ [[graft.functions.AnnIndex
    * .knnIvfStaged]] bit-for-bit and redelivery-safe).
    *
    * Scale shape: per batch the static side reads only probed cells'
    * postings (hive-partitioned store); the centroid array is
    * cells × dim floats ≈ 1 MB broadcast; state is one boolean per
    * distinct query id within the served-once TTL window
    * ([[servedOnce]]) — redelivery-horizon-bounded, never
    * corpus-bounded.
    */
  def knnIvfStream(queries: DataFrame, centroids: DataFrame, postings: DataFrame,
                   k: Int, nprobe: Int,
                   servedTtl: Option[java.time.Duration] =
                     Some(java.time.Duration.ofHours(1))): Dataset[AnnHit] = {
    import queries.sparkSession.implicits._
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val dot = graft.functions.Similarity.dot _
    val centArr = centroids
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
      .agg(collect_list(struct(col("cell").cast("long").as("cell"), col("cv"),
        col("cnrm"))).as("cents"))
    val qn = graft.functions.Similarity.withNorm(queries, "vec_id", "embedding")
      .select(col("vec_id").as("q_id"), col("v").as("vq"), col("nrm").as("nq"))
    val probed = qn.crossJoin(broadcast(centArr))
      .select(col("q_id"), col("vq"), col("nq"),
        explode(slice(array_sort(transform(col("cents"), c =>
          struct((-dot(col("vq"), c.getField("cv")) / (col("nq") * c.getField("cnrm")))
            .as("negsim"), c.getField("cell").as("cell")))), 1, nprobe)).as("pr"))
      .select(col("q_id"), col("vq"), col("nq"), col("pr.cell").as("cell"))
    val cn = graft.functions.Similarity.withNorm(
        postings.withColumn("cell", col("cell").cast("long")),
        "vec_id", "embedding", passthrough = Seq("cell"))
      .select(col("vec_id").as("n_id"), col("v").as("vn"), col("nrm").as("nn"), col("cell"))
    probed.join(cn, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("vq"), col("vn")) / (col("nq") * col("nn"))).as("cs"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, servedTimeoutConf(servedTtl))(
        servedOnce[Long, (Long, Long, Double), AnnHit](servedTtl) { (q, rs) =>
          rs.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.iterator
            .map { case ((_, n, cs), i) =>
              // HALF_UP to match Spark's round(cs, 4) in the batch serve
              AnnHit(q, n, BigDecimal(cs)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1) }
        })
  }

  /** Streaming ANN INGEST — the live half of [[graft.functions.AnnIndex
    * .appendToIndex]]: new vectors arriving on a stream are encoded
    * against the STORED index artifacts (nearest stored centroid; PQ
    * codes against the stored codebooks) with zero retraining and zero
    * state — pure stream-static joins plus per-row expressions, exactly
    * the per-batch cost a live ingest pays. The batch append's
    * `assignCells` argmax is a groupBy aggregation (stateful on a
    * stream), so the argmax here is the [[knnIvfStream]] expression
    * trick instead: centroids aggregate to a 1-row array and
    * `array_sort(transform(...))[1]` picks max-sim/lowest-cell — the
    * identical winner (spec-asserted equal to the batch delta contents
    * row-for-row).
    */
  def ivfAssignStream(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(vectors.sparkSession)
    val dot = graft.functions.Similarity.dot _
    val centArr = centroids
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
      .agg(collect_list(struct(col("cell").cast("long").as("cell"), col("cv"),
        col("cnrm"))).as("cents"))
    graft.functions.Similarity.withNorm(vectors, "vec_id", "embedding")
      .crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("v").as("embedding"),
        element_at(array_sort(transform(col("cents"), c =>
          struct((-dot(col("v"), c.getField("cv")) / (col("nrm") * c.getField("cnrm")))
            .as("negsim"), c.getField("cell").as("cell")))), 1).getField("cell").as("cell"))
  }

  /** PQ encode of a vector stream against the STORED codebooks — the
    * codes half of the streaming ingest (see [[ivfAssignStream]]).
    * Per-(row, subspace) argmin over the per-m codebook array; the
    * distance is the same |x|² − 2·x·c + |c|² expansion as the batch
    * [[graft.functions.Similarity.pqAssign]], and struct sort on
    * (dist, code) is its min(struct(dist, code)) tie-break.
    */
  def pqAssignStream(vectors: DataFrame, codebook: DataFrame,
                     numSub: Int, subDim: Int): DataFrame = {
    graft.functions.VectorExpressions.register(vectors.sparkSession)
    val dot = graft.functions.Similarity.dot _
    val cbArr = codebook.groupBy(col("m"))
      .agg(collect_list(struct(col("code"), col("cv"))).as("codes"))
    val sub = vectors.select(col("vec_id"),
      posexplode(array((0 until numSub).map(m =>
        slice(col("embedding"), m * subDim + 1, subDim)): _*)).as(Seq("m", "sv")))
    sub.join(broadcast(cbArr), Seq("m"))
      .select(col("vec_id"), col("m"),
        element_at(array_sort(transform(col("codes"), c =>
          struct((dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), c.getField("cv")) +
            dot(c.getField("cv"), c.getField("cv"))).as("dist"),
            c.getField("code").as("code")))), 1).getField("code").as("code"))
  }

  case class Bm25Hit(term: String, rnk: Long, doc_id: Long, bm25: Double)
  case class Bm25Served(served: Boolean)

  /** The served-once redelivery gate shared by the streaming serves
    * ([[bm25TopKStream]], [[knnIvfStream]], [[dedupIncrementalStream]]):
    * the FIRST batch carrying a key emits its ranked answer and arms a
    * processing-time TTL; redeliveries inside the TTL window are
    * suppressed (at-least-once upstream delivery cannot duplicate a
    * ranking), and at expiry the state is REMOVED — so state is bounded
    * by the keys seen per TTL window, not the stream's lifetime, and a
    * legitimately repeated query after the window is served again
    * (ADVICE r11: a permanent NoTimeout served-bit was unbounded state
    * AND silently at-most-once-per-key forever). Size `ttl` to the
    * upstream redelivery horizon (checkpoint/retry span), not to query
    * recurrence.
    *
    * `ttl = None` keeps the permanent NoTimeout bit — for BOUNDED
    * replays and tests only (the [[FunnelProcessor]] `ttl = None`
    * convention): with ProcessingTimeTimeout the engine re-batches
    * continuously to fire pending timers
    * (`FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is
    * unconditionally true for that conf), which is correct under a
    * production ProcessingTime trigger but incompatible with
    * `processAllAvailable`-style drain-and-assert harnesses.
    */
  private def servedOnce[K, R, O](ttl: Option[java.time.Duration])(
      emit: (K, Seq[R]) => Iterator[O])
      : (K, Iterator[R], GroupState[Bm25Served]) => Iterator[O] =
    (key, rows, state) => {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else if (state.exists) {
        // Spark CLEARS a group's timeout on every invocation for the
        // key, so the suppression branch must RE-ARM it: otherwise one
        // redelivery inside the TTL window disarms expiry permanently —
        // unbounded state and at-most-once-per-key forever (ADVICE r12).
        // Re-arming slides the window to the LAST delivery, which is the
        // documented contract (ttl = redelivery horizon, not first-serve
        // age).
        ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
        Iterator.empty
      }
      else {
        state.update(Bm25Served(true))
        ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
        emit(key, rows.toSeq)
      }
    }

  /** The timeout conf paired with [[servedOnce]]'s `ttl`. */
  private def servedTimeoutConf(ttl: Option[java.time.Duration]): GroupStateTimeout =
    if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Streaming BM25 serve — retrieval QUERIES as the live side, the
    * staged postings index as the static side: a stream of query terms
    * joins (stream-static, stateless) against the scored candidate frame
    * off the store ([[graft.functions.SigIndex.bm25ScoredStatic]] — the
    * same store read and score arithmetic as the batch serve), and the
    * per-term top-k is ranked per micro-batch in a
    * `flatMapGroupsWithState` group, because rank windows are
    * unsupported on streams (the countTrigger pattern: bare
    * `flatMapGroups` is unsupported too, so the stateful API is the
    * vehicle even where little state is needed). The one bit of state
    * per term makes the serve IDEMPOTENT: a redelivered query term
    * re-emits nothing — at-least-once upstream delivery cannot
    * duplicate a ranking (spec-asserted).
    *
    * The stream-static join keys every batch by `term`, so each arriving
    * query sees exactly its own postings; candidates for one term always
    * land in that term's group in the same micro-batch, which is why
    * per-batch ranking equals the batch serve's window
    * (StreamingSpec-asserted bit-for-bit against [[graft.functions
    * .SigIndex.bm25TopKStaged]]).
    *
    * Scale shape: per batch the static side is pruned by the workload
    * vocabulary at the SCAN (term-sorted store, pushed In(term)); state
    * is one boolean per distinct term queried within the served-once TTL
    * window ([[servedOnce]]) — redelivery-horizon-bounded, never
    * corpus- or lifetime-bounded; a repeat query after the window is
    * served again.
    */
  def bm25TopKStream(queries: DataFrame, scoredStatic: DataFrame,
                     k: Int,
                     servedTtl: Option[java.time.Duration] =
                       Some(java.time.Duration.ofHours(1))): Dataset[Bm25Hit] = {
    import queries.sparkSession.implicits._
    // LEFT join: a query term with no candidate rows — outside the
    // workload vocabulary the static frame was built for, or simply
    // matching no document — still reaches its stateful group, which
    // emits a SENTINEL row (rnk = 0, doc_id = -1, bm25 = 0) instead of
    // vanishing. An inner join made out-of-vocabulary queries silently
    // indistinguishable from never-asked ones (ADVICE r11); real hits
    // always carry rnk >= 1, so the sentinel cannot collide.
    queries.select(col("term"))
      .join(scoredStatic, Seq("term"), "left")
      .select(col("term"), col("doc_id"), col("tfn"), col("bm25"))
      .as[(String, Option[Long], Option[Double], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, servedTimeoutConf(servedTtl))(
        servedOnce[String, (String, Option[Long], Option[Double], Option[Double]),
                   Bm25Hit](servedTtl) { (term, rs) =>
          val hits = rs.collect { case (_, Some(d), Some(tfn), Some(s)) => (d, tfn, s) }
          if (hits.isEmpty) Iterator.single(Bm25Hit(term, 0L, -1L, 0.0))
          else
            // tfn desc, doc_id asc — the batch serve's exact window order
            hits.sortBy(r => (-r._2, r._1)).take(k).zipWithIndex.iterator
              .map { case ((d, _, s), i) => Bm25Hit(term, i + 1L, d, s) }
        })
  }

  case class RetentionHit(cohort_day: Long, day_offset: Long, user_id: Long)
  case class RetentionState(cohortDayS: Long, lastDayS: Long)

  /** Streaming twin of [[graft.operators.Extended.retentionCohorts]]:
    * per-user first-seen-day cohort × day-offset active-user counts.
    * Per-user state is TWO longs — the cohort day (the irreducible state
    * of the computation: forgetting it would re-cohort a returning user)
    * and the last active day, which suffices to emit each (user, day)
    * exactly ONCE when events arrive in event-time order (same-day events
    * are then consecutive per user, so no per-day set is needed). The
    * downstream `groupBy(cohort_day, day_offset).count` therefore counts
    * distinct users without a distinct — its own state is one counter per
    * (cohort, offset) pair, growing with days², not users.
    *
    * Same in-order trade as [[FunnelProcessor]]: a cross-batch straggler
    * older than the user's last emitted day is a documented miss.
    */
  class RetentionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FunnelEvent, RetentionHit] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[RetentionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RetentionState](
        "retention", org.apache.spark.sql.Encoders.product[RetentionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[RetentionHit] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
      var cur = if (st.exists()) Option(st.get()) else None
      rows.toSeq.sortBy(_.us).foreach { e =>
        val dayS = (e.us / 86400000000L) * 86400L
        cur match {
          case None =>
            cur = Some(RetentionState(dayS, dayS))
            out += RetentionHit(dayS, 0L, key)
          case Some(s) if dayS > s.lastDayS =>
            cur = Some(s.copy(lastDayS = dayS))
            out += RetentionHit(s.cohortDayS, (dayS - s.cohortDayS) / 86400L, key)
          case _ => // same (or older straggler) day: already emitted
        }
      }
      cur.foreach(st.update)
      out.iterator
    }
  }

  /** Keyed [[RetentionProcessor]] + the (cohort, offset) count — the
    * full streaming retention report (update/complete mode downstream).
    */
  def retentionStream(events: Dataset[FunnelEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RetentionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}

/** Rate-source ports of the reference's custom SourceFunction generators
  * (reference: Shopping.scala:32-146 — sleep-driven emit loops become
  * `rowsPerSecond`; per-element watermark emission :132-134 is folded into
  * `withWatermark` downstream). Deterministic variants for tests use
  * MemoryStream instead.
  */
object Generators {
  import StreamingOps._

  private val users = Seq("Bob", "Alice", "Sam", "Tom", "Diana") // Shopping.scala:149

  /** ShoppingCartEventsGenerator port: `eventsPerSecond` add-to-cart events,
    * event time = stream start + value seconds (reference: Shopping.scala:
    * 55-63 — sku from a uuid, quantity 0-9, user round-robin).
    */
  def shoppingCartEvents(spark: SparkSession, eventsPerSecond: Int,
                         numPartitions: Int = 1): Dataset[ShoppingCartEvent] = {
    import spark.implicits._
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", eventsPerSecond.toLong)
      .option("numPartitions", numPartitions.toLong)
      .load()
      .select(
        element_at(typedLit(users), (pmod(col("value"), lit(users.size)) + 1).cast("int")).as("user_id"),
        md5(col("value").cast("string")).as("sku"),
        pmod(col("value"), lit(10)).cast("int").as("quantity"),
        col("timestamp").as("time"),
        lit("add").as("event_type"))
      .as[ShoppingCartEvent]
  }

  /** CatalogEventsGenerator port (reference: Shopping.scala:168-182). */
  def catalogEvents(spark: SparkSession, eventsPerSecond: Int): Dataset[CatalogEvent] = {
    import spark.implicits._
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", eventsPerSecond.toLong)
      .load()
      .select(
        element_at(typedLit(users), (pmod(col("value"), lit(users.size)) + 1).cast("int")).as("user_id"),
        col("timestamp").as("time"),
        md5(concat(lit("p"), col("value").cast("string"))).as("product_id"))
      .as[CatalogEvent]
  }
}
