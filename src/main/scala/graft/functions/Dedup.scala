package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  * Beyond the reference's operator set (SURVEY.md §7.3 P7).
  *
  * Scale design notes (the 100 TB story):
  *  - Exact dedup is a single hash-groupBy on a 128-bit content hash —
  *    shuffle volume is one row per document, combine happens map-side.
  *  - MinHash LSH turns all-pairs similarity into |bands| equi-joins on a
  *    band-signature key: candidate volume is sum over buckets of
  *    |bucket|², controlled by band/row tuning — never n².
  *  - The n-gram inverted index caps posting-list length (document
  *    frequency ≤ maxDf): a shingle shared by half the corpus would
  *    otherwise create a quadratic bucket. Dropping ubiquitous shingles is
  *    both a correctness improvement (they carry no signal) and the thing
  *    that bounds the join.
  *  - Oracle-checked variants use md5 (bit-identical in any engine);
  *    [[simhash]] uses xxhash64, the cheap production path.
  */
object Dedup {

  /** Exact dedup by content hash: one group per distinct text, the kept
    * (minimum) id, and the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  val exactSql: String =
    "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_cnt FROM documents GROUP BY 1"

  /** MinHash signatures, one wide aggregation: ONE md5 per shingle, and
    * signature slot j is the min over shingles of an 8-hex-char (32-bit)
    * slice of that digest at offset (j-1)*3+1. Each slice is itself a
    * uniform hash of the shingle, so each slot is a valid min-wise hash;
    * slices overlap (they share digest bits), which only adds estimator
    * variance, never bias, PER SLOT — correlated slots in one LSH band
    * would weaken AND-amplification, which is why banding pairs slots
    * `numBands` apart (disjoint slices at the default config; see
    * [[minhashLshPairsFrom]]). All `numHashes` mins are computed as parallel
    * aggregate expressions over a single pass of the shingle frame — no
    * row multiplication, one shuffle keyed by doc, and 1 hash per shingle
    * instead of `numHashes` (profiled: the 8× md5 was dedup_minhash's
    * whole cost center). md5-slice min is engine-portable (DuckDB computes
    * the identical digest); swap in xxhash64 for raw speed off the oracle
    * path.
    */
  def minhashSignatures(sh: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    require(numHashes >= 1 && numHashes <= 25,
      s"numHashes ($numHashes) 8-hex-char slices must fit one 32-hex-char md5 digest")
    // Slice offsets spread across the digest: stride 3 for the default 8
    // hashes (matching the oracle SQL's (j-1)*3+1), degrading to denser
    // overlap for larger signature counts.
    val stride = if (numHashes == 1) 0 else math.max(1, (32 - 8) / (numHashes - 1))
    val mins = (1 to numHashes).map { j =>
      min(substring(col("d"), (j - 1) * stride + 1, 8)).as(s"mh_$j")
    }
    sh.select(col(idCol), md5(col("sh")).as("d"))
      .groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Row-local signature build straight from document text: ONE pass per
    * document through the compiled [[MinHashSlices]] expression — no
    * shingle explode, no row multiplication, no aggregate shuffle. The
    * canonical signing path for every from-text consumer (inline
    * operators, the sig store build, per-batch ingest signing): at sf100
    * the explode+agg composition pushed ~250 M shingle rows through a
    * hash aggregate and that plumbing was 31.7 s of the 33 s incremental
    * serve (round 16). Output is bit-identical to
    * `minhashSignatures(shingles(docs, distinct = false))` — the
    * expression's parity contract, spec-pinned — so stores, serves, and
    * the DuckDB oracles are all unchanged.
    */
  def minhashSignaturesFromText(docs: DataFrame, idCol: String, textCol: String,
                                numHashes: Int, width: Int = 8,
                                stride: Int = 4): DataFrame = {
    VectorExpressions.register(docs.sparkSession)
    docs.filter(length(col(textCol)) >= width)
      .select(col(idCol),
        VectorExpressions.minhashSlices(col(textCol), numHashes, width, stride).as("mhs"))
      .select(col(idCol) +:
        (1 to numHashes).map(j => element_at(col("mhs"), j).as(s"mh_$j")): _*)
  }

  /** LSH banding over minhash signatures: `numHashes` signature elements in
    * bands of `rowsPerBand`; docs sharing any full band signature become
    * candidate pairs. Pure equi-join on (band, sig) — candidate volume is
    * sum of bucket², tunable via band shape, never n².
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    minhashLshPairsFrom(minhashSignaturesFromText(docs, idCol, textCol, numHashes),
      idCol, numHashes, rowsPerBand)

  val minhashSql: String =
    s"""WITH sh AS (${TextAnalysis.shinglesSql()}),
       |mh AS (
       |  SELECT doc_id, j, min(substr(md5(sh), (j-1)*3+1, 8)) AS mv
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS j) h
       |  GROUP BY 1, 2
       |), bands AS (
       |  SELECT doc_id, CAST((j-1) % 4 AS INT) AS band,
       |         string_agg(mv, ',' ORDER BY j) AS sig
       |  FROM mh GROUP BY 1, 2
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin

  /** MinHash-estimated Jaccard over LSH candidate pairs: similarity is the
    * fraction of agreeing signature slots — no exact pair counting at all.
    * This is the production near-dup shape at 100 TB: candidate generation
    * AND scoring both run off the fixed-size signature table; the corpus
    * text is touched exactly once (to build signatures).
    */
  def minhashEstJaccard(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val mh = minhashSignaturesFromText(docs, idCol, textCol, numHashes).persist()
    val pairs = minhashLshPairsFrom(mh, idCol, numHashes, rowsPerBand)
    val a = mh.select(col(idCol).as("doc_a") +: (1 to numHashes).map(j => col(s"mh_$j").as(s"a_$j")): _*)
    val b = mh.select(col(idCol).as("doc_b") +: (1 to numHashes).map(j => col(s"mh_$j").as(s"b_$j")): _*)
    val agree = (1 to numHashes).map(j => when(col(s"a_$j") === col(s"b_$j"), 1).otherwise(0)).reduce(_ + _)
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), (agree.cast("double") / numHashes).as("est_jacc"))
  }

  /** Band-join candidate pairs from an existing signature frame.
    * Both self-join sides read the band table → persist (|docs|×bands
    * rows of hashes — the LSH "index"; production stages it to storage).
    */
  private def minhashLshPairsFrom(mh: DataFrame, idCol: String,
                                  numHashes: Int, rowsPerBand: Int): DataFrame =
    pairsFromBands(minhashBands(mh, idCol, numHashes, rowsPerBand).persist(), idCol)

  /** Band self-join → distinct candidate pairs, over ANY (id, band, sig)
    * frame — shared by the inline path above and the staged index's
    * serve ([[SigIndex.minhashPairsStaged]]).
    */
  private[functions] def pairsFromBands(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col(idCol).as("doc_b"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, col("band") === col("band_b") && col("sig") === col("sig_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Public (id, band, sig) band index over a document frame — the staged
    * candidate-generation artifact that cross-corpus consumers join a new
    * batch against: [[dedupIncremental]] builds it in-plan, and the
    * streaming leakage monitor
    * ([[graft.streaming.StreamingOps.splitLeakageStream]]) takes it as
    * its static side (at 100 TB it is written to storage once per corpus
    * revision, exactly like the ANN postings).
    */
  def bandIndex(docs: DataFrame, idCol: String, textCol: String,
                numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    minhashBands(minhashSignaturesFromText(docs, idCol, textCol, numHashes),
      idCol, numHashes, rowsPerBand)

  /** (id, band, sig) LSH band index off a signature frame — the shared
    * candidate-generation structure of the self-join ([[minhashLshPairsFrom]])
    * and cross-corpus ([[dedupIncremental]]) paths.
    */
  private[functions] def minhashBands(mh: DataFrame, idCol: String,
                           numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand): " +
        "trailing signature slots would silently never band-join")
    val numBands = numHashes / rowsPerBand
    // Band slot j with j+numBands (modulo banding), NOT adjacent slots:
    // adjacent slots are 8-hex-char digest slices `stride` apart, so they
    // share bits and their band-collision probability exceeds s^rowsPerBand
    // (weakened AND-amplification → extra false-positive candidates).
    // Slots numBands apart sit numBands*stride chars apart — fully disjoint
    // slices for the default 8×stride-3 config (12 ≥ 8).
    val bandStructs = (0 until numBands).map { b =>
      val sig = concat_ws(",", (0 until rowsPerBand).map(r => col(s"mh_${b + 1 + r * numBands}")): _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    mh.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Incremental (cross-corpus) near-dup check: for every document of a
    * NEW batch, find its near-duplicates in the EXISTING corpus — the
    * daily-ingest shape of dedup, where the corpus is already deduped and
    * only new-vs-existing pairs matter (new-vs-new is the regular batch
    * pass). Emits one row per new doc with ≥1 match: match count, the
    * best-matching existing doc (highest estimated Jaccard, min-id
    * tie-break), and its similarity estimate.
    *
    * Scale shape: at 100 TB the existing corpus's signature/band index is
    * staged once and reused every batch (here both sides compute from one
    * shingle pass because the fixture is one table — the persist IS the
    * staged index); the new batch is orders of magnitude smaller, so AQE
    * broadcasts its band side into the candidate join, and nothing about
    * the existing corpus reshuffles per batch. Scoring runs off the
    * fixed-size signature table; text is touched once, on signature
    * construction. The final per-new-doc window partitions by new-doc id
    * over candidate matches only — bounded by the band collision count,
    * never the corpus.
    */
  def dedupIncremental(docs: DataFrame, idCol: String, textCol: String,
                       newPred: Column, threshold: Double = 0.5,
                       numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val mh = minhashSignaturesFromText(docs, idCol, textCol, numHashes).persist()
    val bands = minhashBands(mh, idCol, numHashes, rowsPerBand).persist()
    incrementalMatches(mh.filter(newPred), bands.filter(newPred),
      mh.filter(!newPred), bands.filter(!newPred), idCol, threshold, numHashes)
  }

  /** The batch-vs-corpus match report over EXPLICIT signature/band frames
    * for each side — shared by the inline operator above (both sides
    * sliced from one in-plan signature build) and the staged store's
    * serve ([[SigIndex]] `dedup_incremental_staged`: corpus side off
    * disk, batch side signed on arrival).
    */
  private[functions] def incrementalMatches(mhNew: DataFrame, bandsNew: DataFrame,
                                            mhEx: DataFrame, bandsEx: DataFrame,
                                            idCol: String, threshold: Double,
                                            numHashes: Int,
                                            batchJoin: String = "shuffle"): DataFrame = {
    // Validated at entry (ADVICE r16): a typo'd strategy would silently
    // fall through to the "shuffle" baseline, and an A/B sweep (IncrSweep)
    // would then time three identical plans and report phantom parity.
    require(Set("shuffle", "broadcast", "semi").contains(batchJoin),
      s"batchJoin must be one of shuffle|broadcast|semi, got '$batchJoin'")
    val ex = bandsEx.select(col(idCol).as("doc_ex"), col("band"), col("sig"))
    val nw0 = bandsNew
      .select(col(idCol).as("doc_new"), col("band").as("band_n"), col("sig").as("sig_n"))
    // Candidate-join strategy against the (much larger) existing-corpus
    // band index — the r15 advice lever for the staged ingest serve:
    //  - "shuffle":   both sides exchange on (band, sig) — the baseline.
    //  - "broadcast": the batch's band table broadcasts; the corpus side
    //    is scanned once and NEVER exchanged — rows die at the join right
    //    above the store scan. Payload is |batch|·bands rows.
    //  - "semi":      the corpus side is pre-pruned by a broadcast
    //    LEFT SEMI on the batch's DISTINCT band keys (smaller payload
    //    than "broadcast" — no doc ids), then the survivors (band
    //    collisions only) flow into the regular shuffle join.
    // Winner by measurement (IncrSweep, sf10+sf100): see BASELINE.md.
    val nw = if (batchJoin == "broadcast") broadcast(nw0) else nw0
    val exPruned = if (batchJoin == "semi")
      ex.join(broadcast(nw0.select(col("band_n"), col("sig_n")).distinct()),
        col("band") === col("band_n") && col("sig") === col("sig_n"), "left_semi")
    else ex
    val pairs = exPruned.join(nw, col("band") === col("band_n") && col("sig") === col("sig_n"))
      .select(col("doc_new"), col("doc_ex"))
      .distinct()
    val a = mhNew.select(col(idCol).as("doc_new") +:
      (1 to numHashes).map(j => col(s"mh_$j").as(s"a_$j")): _*)
    val b = mhEx.select(col(idCol).as("doc_ex") +:
      (1 to numHashes).map(j => col(s"mh_$j").as(s"b_$j")): _*)
    val agree = (1 to numHashes).map(j => when(col(s"a_$j") === col(s"b_$j"), 1).otherwise(0)).reduce(_ + _)
    val scored = pairs.join(a, Seq("doc_new")).join(b, Seq("doc_ex"))
      .select(col("doc_new"), col("doc_ex"), (agree.cast("double") / numHashes).as("est"))
      .filter(col("est") >= threshold)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_new"))
    scored
      .withColumn("rn", row_number().over(w.orderBy(col("est").desc, col("doc_ex").asc)))
      .withColumn("n_matches", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("doc_new"), col("n_matches"), col("doc_ex").as("best_match"), col("est").as("best_jacc"))
  }

  /** DuckDB twin of [[dedupIncremental]] with the registered new-batch
    * predicate doc_id % 5 = 0.
    */
  val dedupIncrementalSql: String = {
    val maxes = (1 to 8).map(j => s"max(CASE WHEN j = $j THEN mv END) AS m$j").mkString(", ")
    val agree = (1 to 8).map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sh AS (${TextAnalysis.shinglesSql()}),
       |mh AS (
       |  SELECT doc_id, j, min(substr(md5(sh), (j-1)*3+1, 8)) AS mv
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS j) h
       |  GROUP BY 1, 2
       |), wide AS (SELECT doc_id, $maxes FROM mh GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, CAST((j-1) % 4 AS INT) AS band,
       |         string_agg(mv, ',' ORDER BY j) AS sig
       |  FROM mh GROUP BY 1, 2
       |), pairs AS (
       |  SELECT DISTINCT y.doc_id AS doc_new, x.doc_id AS doc_ex
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.sig = y.sig
       |   AND x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
       |), scored AS (
       |  SELECT p.doc_new, p.doc_ex, CAST($agree AS DOUBLE) / 8 AS est
       |  FROM pairs p JOIN wide a ON a.doc_id = p.doc_new JOIN wide b ON b.doc_id = p.doc_ex
       |  WHERE CAST($agree AS DOUBLE) / 8 >= 0.5
       |), r AS (
       |  SELECT doc_new, doc_ex, est,
       |         row_number() OVER (PARTITION BY doc_new ORDER BY est DESC, doc_ex ASC) AS rn,
       |         count(*) OVER (PARTITION BY doc_new) AS n_matches
       |  FROM scored)
       |SELECT doc_new, n_matches, doc_ex AS best_match, est AS best_jacc FROM r WHERE rn = 1""".stripMargin
  }

  val minhashEstJaccardSql: String = {
    val maxes = (1 to 8).map(j => s"max(CASE WHEN j = $j THEN mv END) AS m$j").mkString(", ")
    val agree = (1 to 8).map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sh AS (${TextAnalysis.shinglesSql()}),
       |mh AS (
       |  SELECT doc_id, j, min(substr(md5(sh), (j-1)*3+1, 8)) AS mv
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS j) h
       |  GROUP BY 1, 2
       |), wide AS (SELECT doc_id, $maxes FROM mh GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, CAST((j-1) % 4 AS INT) AS band,
       |         string_agg(mv, ',' ORDER BY j) AS sig
       |  FROM mh GROUP BY 1, 2
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)
       |SELECT p.doc_a, p.doc_b, CAST($agree AS DOUBLE) / 8 AS est_jacc
       |FROM pairs p JOIN wide a ON a.doc_id = p.doc_a JOIN wide b ON b.doc_id = p.doc_b""".stripMargin
  }

  /** SimHash: 64-bit locality-sensitive content hash. Per whitespace token,
    * xxhash64 gives 64 bits; each bit votes ±1; the sign of each summed bit
    * position forms the fingerprint. Near-dups differ in few bits. All
    * codegen'd array expressions — no UDF, no shuffle beyond the scan.
    * Production pairing: band the 64 bits into 4×16-bit keys and equi-join
    * like MinHash LSH (no engine-portable oracle: xxhash64 seed differs
    * per engine, so this qkey is rows-only checked).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), xxhash64(col("tok")).as("h"))
    // Bit votes accumulate in a typed Aggregator with a primitive 65-slot
    // buffer (64 bit-counters + token count). A 64-wide sum(when(...)) agg
    // generates code past the JIT method limit and runs interpreted
    // (profiled 25 s vs ~2 s at sf0.1); the imperative buffer is the fast
    // partial+final-aggregatable shape.
    val sim = udaf(new SimHashAggregator)
    tokens.groupBy(col(idCol)).agg(sim(col("h")).as("simhash"))
  }

  /** md5-hashed SimHash twin of [[simhash]]: the per-token hash is the
    * first 15 hex chars of md5 (60 bits — fits a signed BIGINT in both
    * engines), so the fingerprint is engine-portable and the band join is
    * DuckDB-hash-checkable. xxhash64 ([[simhash]]) stays the production
    * default (one codegen'd hash vs an md5 + string slice + base-16
    * parse per token); this twin exists so the SimHash *algorithm* —
    * majority-vote fingerprint, band join, hamming distance — has an
    * exact cross-engine oracle rather than a rows-only check.
    */
  def simhashMd5(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val sim = udaf(new SimHashAggregator)
    tokens.groupBy(col(idCol)).agg(sim(col("h")).as("simhash"))
  }

  /** Band join + hamming distance over any 64-bit fingerprint table. */
  private def simhashBandPairs(sh: DataFrame, idCol: String): DataFrame = {
    val banded = sh.select(col(idCol), col("simhash"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, shiftright(simhash, b * 16) & 65535 AS key))")).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
      .persist() // both self-join sides read it — the SimHash band index
    val a = banded.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"), col("band"), col("key"))
    val b = banded.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"), col("band").as("band_b"), col("key").as("key_b"))
    a.join(b, col("band") === col("band_b") && col("key") === col("key_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
  }

  /** SimHash near-dup candidates via 4×16-bit band join. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashBandPairs(simhash(docs, idCol, textCol), idCol)

  /** [[simhashPairs]] over the engine-portable md5 fingerprint. */
  def simhashPairsMd5(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashBandPairs(simhashMd5(docs, idCol, textCol), idCol)

  /** Fingerprint block widths for the block-combination geometry: 64 bits
    * split as evenly as m allows (the first 64 mod m blocks take the
    * extra bit), offsets ascending from bit 0.
    */
  private[graft] def simhashBlockSizes(m: Int): Seq[Int] = {
    val base = 64 / m
    val rem = 64 % m
    (0 until m).map(i => if (i < rem) base + 1 else base)
  }

  private def choose(m: Int, h: Int): Long =
    (1 to h).foldLeft(1L)((acc, i) => acc * (m - i + 1) / i)

  /** Corpus-sized block count for exact hamming ≤ `h` SimHash pairing —
    * the auto-geometry rule VERDICT r16 item 3 asked for, mirroring what
    * `lshBitsFor` does for embedding LSH. The fixed 4×16-bit banding is
    * the m = 4 point of the block-COMBINATION family (Manku/Jarvelin/
    * Sarma, WWW'07 "Detecting Near-Duplicates for Web Crawling"): split
    * the 64 fingerprint bits into m > h blocks and equi-join once per
    * (m−h)-block combination. A pair within hamming h dirties at most h
    * blocks, so some kept-combination matches EXACTLY — the guarantee is
    * geometry-independent, only the candidate volume changes: per-table
    * collisions scale as n²/2^keyBits, and keyBits GROWS with m
    * (16 → 25 → 31 → 40 for m = 4, 5, 6, 8) while the table count C(m,h)
    * grows only polynomially (4 → 10 → 20 → 56). The rule picks the
    * smallest m whose expected total candidate volume stays ≤
    * `targetOcc`·n under a uniform-fingerprint model — the same
    * constant-occupancy posture as `lshBitsFor`:
    *
    *   n ≤ ~260 k  → m = 4 (the reference-parity fixed geometry —
    *                 identical output, identical plan at every gate scale)
    *   n ≤ ~53 M   → m = 5 (25-bit keys, 10 tables — covers sf10/sf100)
    *   n ≤ ~3.4 B  → m = 6 (31-bit keys, 20 tables)
    *   beyond     → m = 8 (40-bit keys, 56 tables)
    */
  def simhashBlocksFor(n: Long, h: Int = 3, targetOcc: Int = 16): Int =
    Seq(4, 5, 6, 8).find { m =>
      val keyBits = 64 - simhashBlockSizes(m).sorted.takeRight(h).sum
      // total candidates ~ n² · C(m,h) / 2^keyBits ≤ targetOcc · n
      math.pow(2.0, keyBits) >= n.toDouble * choose(m, h) / targetOcc
    }.getOrElse(8)

  /** Exact hamming ≤ `h` pairs over any 64-bit fingerprint table via the
    * block-combination join (see [[simhashBlocksFor]]). Output contract
    * is GEOMETRY-INDEPENDENT: exactly the pairs within hamming `h`, with
    * the distance attached — unlike [[simhashBandPairs]], whose raw
    * band-collision superset varies with banding. Every kept-combination
    * key packs into one LONG (≤ 64 bits by construction), so the join is
    * a plain (band, key) equi-join — shuffle volume C(m,h)·n skinny rows,
    * candidate volume sum-of-bucket², never n².
    */
  private[graft] def simhashBlockPairs(sh: DataFrame, idCol: String,
                                           m: Int, h: Int = 3): DataFrame = {
    require(m > h && m <= 64, s"need h < m <= 64 blocks, got m=$m h=$h")
    val sizes = simhashBlockSizes(m)
    val offs = sizes.scanLeft(0)(_ + _)
    val bandCols = (0 until m).combinations(m - h).toSeq.zipWithIndex.map {
      case (kept, ci) =>
        // key = the kept blocks' bits, concatenated big-endian — a pure
        // shift/mask composition, fully codegen'd
        val key = kept.foldLeft(lit(0L)) { (acc, blk) =>
          val mask = if (sizes(blk) == 64) -1L else (1L << sizes(blk)) - 1
          shiftleft(acc, sizes(blk)).bitwiseOR(
            shiftrightunsigned(col("simhash"), offs(blk)).bitwiseAND(lit(mask)))
        }
        struct(lit(ci).as("band"), key.as("key"))
    }
    val banded = sh.select(col(idCol), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .persist() // both self-join sides read it — the block-key index
    val a = banded.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"),
      col("band"), col("key"))
    val b = banded.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"),
      col("band").as("band_b"), col("key").as("key_b"))
    a.join(b, col("band") === col("band_b") && col("key") === col("key_b") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .filter(col("hamming") <= h)
      .distinct()
  }

  /** The corpus-sized SimHash near-dup operator (`dedup_simhash_auto`):
    * row-local [[SimHash60]] md5 fingerprints (no token explode, no
    * aggregate shuffle — the MinHashSlices discipline one family over) +
    * auto block-combination geometry. Exact contract: every pair within
    * hamming ≤ `h`, at ANY corpus size — at gate scales the geometry
    * resolves to the reference-parity m = 4 (the fixed 4×16 banding), at
    * sf10/sf100 it widens keys instead of drowning in the n²/2^16
    * candidate cliff that put the fixed-geometry twins in the bench skip
    * set. md5 keeps the fingerprint engine-portable, so the DuckDB
    * oracle is [[simhashMd5Sql]] restricted to hamming ≤ h.
    */
  def simhashPairsAuto(docs: DataFrame, idCol: String, textCol: String,
                       h: Int = 3): DataFrame = {
    VectorExpressions.register(docs.sparkSession)
    val m = simhashBlocksFor(docs.count(), h)
    val sh = docs.select(col(idCol),
      VectorExpressions.simhash60(col(textCol)).as("simhash"))
    simhashBlockPairs(sh, idCol, m, h)
  }

  /** DuckDB twin of [[simhashPairsAuto]]: the fixed-geometry md5 oracle
    * restricted to hamming ≤ 3 — the 4×16 banding finds EVERY hamming ≤ 3
    * pair (it is the m = 4 block-combination), so its filtered output is
    * the auto operator's exact contract regardless of the m the Spark
    * side picked.
    */
  lazy val simhashAutoSql: String = // lazy: simhashMd5Sql initializes later in the file
    s"SELECT doc_a, doc_b, hamming FROM ($simhashMd5Sql) t WHERE hamming <= 3"

  /** DuckDB twin of [[simhashPairsMd5]]: per-token 60-bit md5-slice hash,
    * per-bit majority vote (strict `2·ones > n`, matching
    * [[SimHashAggregator.finish]]'s tie-to-zero), fingerprint assembly,
    * 4×16-bit band self-join, hamming via `bit_count(xor(...))`.
    */
  val simhashMd5Sql: String = {
    // value of the lowercase hex digit holding bit b of the 15-char md5
    // prefix (digit b/4 counting from the right = 1-based position 15-b/4)
    val hvb = {
      val pos = "CAST(15 - b // 4 AS INT)"
      s"(CASE WHEN ascii(substr(d, $pos, 1)) >= 97 THEN ascii(substr(d, $pos, 1)) - 87 ELSE ascii(substr(d, $pos, 1)) - 48 END)"
    }
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hx AS (SELECT doc_id, md5(tok) AS d FROM tok),
       |votes AS (
       |  SELECT doc_id, b,
       |         sum(($hvb >> CAST(b % 4 AS INT)) & 1) AS ones, count(*) AS n
       |  FROM hx CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bb
       |  GROUP BY 1, 2),
       |fp AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN 2 * ones > n THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY 1),
       |bk AS (
       |  SELECT doc_id, simhash, band, (simhash >> CAST(band * 16 AS INT)) & 65535 AS key
       |  FROM fp CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bb),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS sa, b.simhash AS sb
       |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM pairs""".stripMargin
  }

  /** Winnowing stride shared by [[ngramJaccardPairs]]'s default, the
    * `dedup_ngram` registration, and [[ngramJaccardSql]] — ONE constant so
    * the Scala default and the oracle can never silently diverge. 6 won
    * the round-4 NgramSweep (identical pair output to stride 4 at sf0.01,
    * ~40% less shingle volume).
    */
  val NgramStride: Int = 6

  /** n-gram Jaccard near-dup: inverted-index self-join on stride-sampled
    * character shingles, document frequency capped at `maxDf`, Jaccard
    * over the df-filtered shingle universe, thresholded.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDf: Int = 100, threshold: Double = 0.8,
                        width: Int = 8, stride: Int = NgramStride): DataFrame = {
    // sh feeds the df-filter AND the index join → persist to stop the
    // scan→explode→distinct lineage running twice.
    val sh = TextAnalysis.shingles(docs, idCol, textCol, width, stride).persist()
    ngramJaccardFromShingles(sh, idCol, maxDf, threshold)
  }

  /** [[ngramJaccardPairs]] with the shingle table supplied by the caller —
    * the serve shape when the distinct stride-sampled shingles are staged
    * to storage ([[SigIndex.shingleStore]]): document text is never read,
    * the df-cap and the inverted-index self-join run straight off the
    * stored (doc_id, sh) rows.
    */
  private[functions] def ngramJaccardFromShingles(sh: DataFrame, idCol: String,
                                                  maxDf: Int = 100,
                                                  threshold: Double = 0.8): DataFrame = {
    val keep = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("sh"))
    // The filtered inverted index feeds four branches (both join sides +
    // sizes); persisting it avoids re-running scan→explode→distinct→join
    // per branch. At cluster scale the same role is played by
    // checkpointing/bucketed staging of the index.
    val fsh = sh.join(keep, Seq("sh")).persist()
    val sizes = fsh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = fsh.select(col(idCol).as("doc_a"), col("sh"))
    val b = fsh.select(col(idCol).as("doc_b"), col("sh").as("sh_b"))
    val inter = a.join(b, col("sh") === col("sh_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("c"))
    val jacc = col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .filter(jacc >= threshold)
      .select(col("doc_a"), col("doc_b"), jacc.as("jacc"))
  }

  val ngramJaccardSql: String =
    s"""WITH sh AS (${TextAnalysis.shinglesSql(stride = NgramStride)}),
       |keep AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100),
       |fsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN keep USING (sh)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM fsh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
       |  FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jacc
       |FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.8""".stripMargin

  /** Asymmetric n-gram CONTAINMENT — the dedup shape Jaccard cannot see:
    * containment(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| flags a short document
    * whose content is (almost) wholly quoted inside a much longer one
    * (boilerplate copies, article + quote-reply threads, subset pages),
    * where the union-normalized Jaccard stays near zero. Emits pairs
    * (doc_a < doc_b) whose larger directed containment crosses
    * `threshold`, with both directions' scores.
    *
    * Scale shape: identical to [[ngramJaccardPairs]] — the df-capped
    * inverted shingle index bounds posting lists, the self-join is a pure
    * equi-join on the shingle, and the intersection aggregates map-side.
    * Division is exact-integers-to-double, portable.
    */
  def ngramContainmentPairs(docs: DataFrame, idCol: String, textCol: String,
                            maxDf: Int = 100, threshold: Double = 0.9,
                            width: Int = 8, stride: Int = NgramStride): DataFrame = {
    val sh = TextAnalysis.shingles(docs, idCol, textCol, width, stride).persist()
    ngramContainmentFromShingles(sh, idCol, maxDf, threshold)
  }

  /** [[ngramContainmentPairs]] off a caller-supplied shingle table — the
    * staged-store serve twin (see [[ngramJaccardFromShingles]]).
    */
  private[functions] def ngramContainmentFromShingles(sh: DataFrame, idCol: String,
                                                      maxDf: Int = 100,
                                                      threshold: Double = 0.9): DataFrame = {
    val keep = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("sh"))
    val fsh = sh.join(keep, Seq("sh")).persist()
    val sizes = fsh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = fsh.select(col(idCol).as("doc_a"), col("sh"))
    val b = fsh.select(col(idCol).as("doc_b"), col("sh").as("sh_b"))
    val inter = a.join(b, col("sh") === col("sh_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("c"))
    val contA = col("c").cast("double") / col("sz_a")
    val contB = col("c").cast("double") / col("sz_b")
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .filter(greatest(contA, contB) >= threshold)
      .select(col("doc_a"), col("doc_b"), contA.as("cont_a"), contB.as("cont_b"))
  }

  val ngramContainmentSql: String =
    s"""WITH sh AS (${TextAnalysis.shinglesSql(stride = NgramStride)}),
       |keep AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100),
       |fsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN keep USING (sh)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM fsh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
       |  FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       CAST(c AS DOUBLE) / sa.sz AS cont_a,
       |       CAST(c AS DOUBLE) / sb.sz AS cont_b
       |FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE greatest(CAST(c AS DOUBLE) / sa.sz, CAST(c AS DOUBLE) / sb.sz) >= 0.9""".stripMargin

  /** Dedup QA report — "measure, don't guess" as a first-class operator:
    * score the production approximate path ([[minhashLshPairs]]) against
    * the exact-threshold ground truth ([[ngramJaccardPairs]], Jaccard ≥
    * 0.8 on the df-capped shingle universe) and emit ONE row of
    * candidate/truth/hit counts with precision and recall. A pipeline
    * runs this on a sampled slice per ingest batch to catch silent LSH
    * degradation (wrong band geometry for the corpus, shingle-width
    * drift) before it ships a badly-deduped corpus.
    *
    * Precision here reads low by design: LSH candidates implied by the
    * band curve include sub-0.8 near-dups; recall against the 0.8 bar is
    * the health signal (1.0 on the fixture). Counts are exact integers →
    * the ratio doubles are engine-portable.
    *
    * `sampleMod` is the production cost knob: the report deliberately
    * runs BOTH the approximate and the exact path (cost ≈ their sum), so
    * at scale it runs on a deterministic 1/sampleMod document slice —
    * docs whose xxhash64(id) ≡ 0 (mod sampleMod), a hash-mod, never
    * rand(), so the slice is stable across runs/retries and needs no
    * seed plumbing. Pair metrics are then estimates on the induced
    * subcorpus (a pair survives iff BOTH endpoints do — an unbiased
    * estimator of the pair rates under hash-uniformity; spec-bounded
    * against full truth at sf0.01 in DedupSimilaritySpec). The oracle
    * qkey pins sampleMod = 1, where the filter does not exist in the
    * plan at all.
    *
    * The registered qkey derives the modulus from a corpus count via
    * [[embQaSampleModFor]] (≈ n/500 — the same rule the embedding twin
    * uses), so the expensive exact-truth side is bounded to ~500 docs BY
    * CONSTRUCTION at any corpus size; at the ≤500-doc oracle gates the
    * rule yields 1 and the plan — and hash — are unchanged. The staged
    * serve (`dedup_qa_report_staged`) self-bounds with the SAME rule:
    * its sides come off stored artifacts (no quadratic build), but the
    * exact-truth pair SCAN is still quadratic in the slice, so the
    * stored per-doc rows are filtered to the identical hash slice
    * before serving ([[SigIndex.dedupQaReportStaged]]).
    */
  def dedupQaReport(docs: DataFrame, idCol: String, textCol: String,
                    sampleMod: Long = 1L): DataFrame = {
    require(sampleMod >= 1, "dedupQaReport: sampleMod must be >= 1")
    val slice = if (sampleMod == 1) docs
      else docs.filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
    qaReportFromPairs(minhashLshPairs(slice, idCol, textCol),
      ngramJaccardPairs(slice, idCol, textCol))
  }

  /** The QA-report scoring given already-built candidate and truth pair
    * sets — shared by the inline [[dedupQaReport]] and the staged serve
    * ([[SigIndex]]), where BOTH sides come off stored artifacts (band
    * index for candidates, shingle store for truth) and text is read
    * zero times.
    */
  private[functions] def qaReportFromPairs(cand0: DataFrame, truth0: DataFrame): DataFrame = {
    // both pair sets feed two consumers (their count + the intersection)
    val cand = cand0.select(col("doc_a"), col("doc_b")).persist()
    val truth = truth0.select(col("doc_a"), col("doc_b")).persist()
    val hit = cand.join(truth, Seq("doc_a", "doc_b"))
    cand.agg(count(lit(1)).as("n_cand"))
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_cand"), col("n_truth"), col("n_hit"),
        when(col("n_cand") === 0, lit(null).cast("double"))
          .otherwise(col("n_hit").cast("double") / col("n_cand")).as("precision_vs_exact"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(col("n_hit").cast("double") / col("n_truth")).as("recall_vs_exact"))
  }

  val dedupQaReportSql: String =
    s"""WITH cand AS ($minhashSql),
       |truth AS (SELECT doc_a, doc_b FROM ($ngramJaccardSql)),
       |m AS (SELECT count(*) AS n_cand FROM cand),
       |t AS (SELECT count(*) AS n_truth FROM truth),
       |h AS (SELECT count(*) AS n_hit FROM cand JOIN truth USING (doc_a, doc_b))
       |SELECT n_cand, n_truth, n_hit,
       |       CASE WHEN n_cand = 0 THEN NULL
       |            ELSE CAST(n_hit AS DOUBLE) / n_cand END AS precision_vs_exact,
       |       CASE WHEN n_truth = 0 THEN NULL
       |            ELSE CAST(n_hit AS DOUBLE) / n_truth END AS recall_vs_exact
       |FROM m, t, h""".stripMargin

  /** Embedding-cosine near-dup pairs above `threshold`. All-pairs exact
    * form — the correctness baseline that [[embeddingLshPairs]] (the
    * registered scale path: sign-LSH band candidates, same scoring) is
    * measured against. The theta-join here plans as a
    * BroadcastNestedLoopJoin over the corpus: O(n²), deliberate, never the
    * production shape.
    */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val n = Similarity.withNorm(emb, idCol, vecCol)
    val a = n.select(col(idCol).as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col(idCol).as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    val cos = Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cos.as("cs"))
      .filter(col("cs") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cs"), 4).as("cos_sim"))
  }

  /** Embedding near-dup via sign-LSH band candidates — the scale path that
    * [[embeddingNearDups]] is the exact baseline for. `numPlanes` md5-derived
    * hyperplanes give each vector a sign bit per plane; bits are grouped
    * into bands of `bitsPerBand` and vectors sharing any full band key
    * become candidates (pure equi-join on (band, key) — candidate volume is
    * Σ|bucket|², never n², and the plan has NO BroadcastNestedLoopJoin).
    * Candidates are then scored with the same codegen cosine and threshold
    * as the baseline.
    *
    * Recall is the standard OR-of-ANDs curve 1-(1-s^b)^n over bit-agreement
    * s = 1-θ/π: at a production near-dup threshold (cos ≥ 0.9, s ≈ 0.86)
    * the default 8×4 bands give ~0.97 recall on tiny buckets; on this
    * synthetic uniform corpus at threshold 0.4 (s ≈ 0.63 — the regime LSH
    * is not built for) measured recall vs the exact baseline is ~0.78 with
    * ~41% of the all-pairs candidate volume. The oracle reproduces the
    * identical hyperplanes (md5 is engine-portable), so the DuckDB twin
    * computes the exact same candidate set — the check is a hash match,
    * not a recall bound.
    *
    * SCALING LAW (measured, round-5 sf1 sweep — graft.LshGeometrySweep):
    * hash-uniform candidate volume is ≈ numBands · n² / 2^(bitsPerBand+1) —
    * banding shrinks the n² CONSTANT, not the exponent, so band geometry
    * must be sized to the corpus: growing n by k× needs bitsPerBand to
    * grow by ~2·log2(k) to keep candidate volume flat (production sizing:
    * bitsPerBand ≈ log2(n / targetMeanBucket)). The registered (32, 4)
    * geometry is gate-locked to the oracle at sf0.01; at 10× (20 k
    * vectors) it generates ~100 M candidates (235 s) where (64, 8) costs
    * 16× less. The catch is threshold-dependent: at cos ≥ 0.4 wider bands
    * collapse recall (0.78 → 0.21 measured from 4- to 8-bit), while at
    * production thresholds (cos ≥ 0.9) recall stays ≥ 0.95 (spec-asserted
    * on a twin-pair fixture) — very low similarity thresholds are
    * fundamentally not LSH-serviceable at scale; use [[Similarity.knnIvf]]
    * -style partitioning there instead.
    *
    * The DEFAULT (32, 4) geometry is the oracle gate twin — do not use it
    * at scale. Call [[embeddingLshPairsAuto]] (qkey
    * `dedup_embedding_lsh_auto`), which sizes bitsPerBand to the corpus,
    * for any real workload.
    */
  def embeddingLshPairs(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, numPlanes: Int = 32,
                        bitsPerBand: Int = 4, dim: Int = 64): DataFrame = {
    // id+vector+norm feeds the band table AND both scoring sides → persist
    // (at cluster scale this is the staged normalized-embedding table)
    val n = Similarity.withNorm(emb, idCol, vecCol).persist()
    val bands = embLshBandTable(n, idCol, numPlanes, bitsPerBand, dim).persist()
    embLshScore(bands, n, idCol, threshold)
  }

  /** The sign-LSH band/bucket table (id, band, key) over a normalized
    * embedding frame (`withNorm` output) — the candidate-generation
    * artifact of [[embeddingLshPairs]], split out so the staged serve
    * ([[SigIndex.embeddingLshAutoStaged]]) can build it once per corpus
    * revision and read it from storage thereafter.
    */
  private[graft] def embLshBandTable(n: DataFrame, idCol: String, numPlanes: Int,
                                         bitsPerBand: Int, dim: Int): DataFrame = {
    require(numPlanes % bitsPerBand == 0,
      s"numPlanes ($numPlanes) must be a multiple of bitsPerBand ($bitsPerBand): " +
        "trailing sign bits would silently never band-join")
    require(bitsPerBand <= 62, "band key is packed into one Long")
    // ONE compiled loop for all planes ([[VectorSignBands]]): the old
    // composable form (numPlanes inlined dot expressions per projection)
    // exceeded the JIT method limit at production widths and ran
    // INTERPRETED — 570 of the 597 s sf100 inline run, and the whole of
    // the "vlsh build 688 s" round-13 entry. Keys are bit-identical
    // (same per-element double widening, same accumulation order), so
    // stores and oracles are unchanged. Dim mismatch fails fast inside
    // the expression — banding a prefix would be a silent wrong answer.
    VectorExpressions.register(n.sparkSession)
    val planesFlat = Similarity.md5Hyperplanes(numPlanes, dim).flatMap(_.toSeq)
    // narrow band index (id, band, key); both self-join sides read it
    n.select(col(idCol),
        posexplode(VectorExpressions.vectorSignBands(col("v"), planesFlat, dim, bitsPerBand)))
      .toDF(idCol, "band", "key")
  }

  /** Candidate band self-join + exact cosine scoring over any (id, band,
    * key) bucket table and normalized-vector frame — shared by the inline
    * [[embeddingLshPairs]] and the staged bucket-store serve.
    *
    * Plan shape (round-11 rewrite, measured at the sf10 decade):
    * vectors attach to the band rows BEFORE the self-join, so scoring
    * and thresholding run inside the self-join's stage and the pair
    * stream never re-shuffles. The old shape deduped the ~Σ|bucket|²
    * candidate pairs first and then joined vectors on twice — the
    * second attachment shuffled every candidate row already carrying a
    * 64-float vector (~3 GB at sf10's ~10 M candidates), three pair-
    * stream shuffles in all. Here the only candidate-volume cost is
    * re-scoring the (rare) pairs that collide in several bands — 64
    * codegen flops each — and the distinct collapses the tiny
    * above-threshold survivor set instead of the full candidate set.
    * Output is the identical pair set (cosine per pair is
    * deterministic), so oracles and gate hashes are unchanged.
    */
  private[graft] def embLshScore(bands: DataFrame, n: DataFrame, idCol: String,
                                     threshold: Double): DataFrame =
    embLshScoreProbed(bands, n, idCol, threshold, bitsPerBand = 0, probeFlips = 0)

  /** [[embLshScore]] with optional 1-bit multi-probe: with
    * `probeFlips = 1` the PROBE side of the band self-join additionally
    * emits each band key with every single bit flipped, so a pair is a
    * candidate when its band keys differ by ≤ 1 bit — the recall
    * compensation that lets [[lshGeometryFor]] keep shrinking buckets
    * past the 16-bit clamp. Only one side expands (a 1-bit-apart pair
    * matches exactly once: A's flip meets B's original); the stored band
    * table stays unprobed — the store format is probe-agnostic, the
    * policy is serve-time.
    *
    * Probed plan shape differs from the unprobed one deliberately: the
    * (1+bits)× probe expansion must stay NARROW (id, band, key — the
    * wide vector-attached shape the unprobed path uses would multiply
    * the exchanged vector bytes by the probe factor), so candidates are
    * deduped as bare id pairs first and the two vector attachments run
    * on the deduped pair set. That re-attachment is exactly what the
    * round-11 rewrite removed from the unprobed path — correct there,
    * because without probes the band rows already carry vectors at no
    * expansion; with probes the narrow-first shape exchanges ~20× fewer
    * bytes. Measured A/B in graft.LshGeometrySweep.
    */
  private[graft] def embLshScoreProbed(bands: DataFrame, n: DataFrame, idCol: String,
                                           threshold: Double, bitsPerBand: Int,
                                           probeFlips: Int): DataFrame = {
    require(probeFlips == 0 || probeFlips == 1, "probeFlips beyond 1 bit explodes volume")
    if (probeFlips == 1) {
      require(bitsPerBand > 0, "multi-probe needs the band width to enumerate flips")
      val probes = bands.select(col(idCol).as("vec_a"), col("band"),
        explode(expr(
          s"array_union(array(key), transform(sequence(0, ${bitsPerBand - 1}), " +
            "r -> key ^ shiftleft(1L, r)))")).as("key"))
      val yk = bands.select(col(idCol).as("vec_b"), col("band"), col("key"))
      val cand = probes.join(yk, Seq("band", "key"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct()
      val nv = n.select(col(idCol), col("v"), col("nrm"))
      val cos = Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))
      return cand
        .join(nv.select(col(idCol).as("vec_a"), col("v").as("va"), col("nrm").as("na")), Seq("vec_a"))
        .join(nv.select(col(idCol).as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("vec_b"))
        .filter(cos >= threshold)
        .select(col("vec_a"), col("vec_b"), round(cos, 4).as("cos_sim"))
    }
    val wide = bands.join(n.select(col(idCol), col("v"), col("nrm")), Seq(idCol))
    val x = wide.select(col(idCol).as("vec_a"), col("band"), col("key"),
      col("v").as("va"), col("nrm").as("na"))
    val y = wide.select(col(idCol).as("vec_b"), col("band").as("band_b"),
      col("key").as("key_b"), col("v").as("vb"), col("nrm").as("nb"))
    val cos = Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))
    x.join(y, col("band") === col("band_b") && col("key") === col("key_b") &&
        col("vec_a") < col("vec_b"))
      .filter(cos >= threshold)
      .select(col("vec_a"), col("vec_b"), round(cos, 4).as("cos_sim"))
      .distinct()
  }

  /** DuckDB twin of [[embeddingLshPairs]] at any band geometry: the
    * hyperplanes, band keys, candidate join, and cosine threshold are all
    * recomputed in SQL from the same md5 derivation, so the oracle output
    * is the identical pair set — an exact hash check of an approximate
    * algorithm.
    */
  def embeddingLshSqlFor(numPlanes: Int, bitsPerBand: Int, dim: Int,
                         threshold: String): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |pl AS (
       |  SELECT p.p, list(CASE WHEN ascii(substr(md5(p.p::VARCHAR || '_' || d.d::VARCHAR), 1, 1)) % 2 = 0
       |                        THEN 1.0 ELSE -1.0 END ORDER BY d.d) AS w
       |  FROM (SELECT unnest(generate_series(0, ${numPlanes - 1})) AS p) p
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${dim - 1})) AS d) d
       |  GROUP BY 1
       |), bits AS (
       |  SELECT e.vec_id, pl.p, CASE WHEN list_inner_product(e.v, pl.w) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM e CROSS JOIN pl
       |), bands AS (
       |  SELECT vec_id, CAST(p // $bitsPerBand AS INT) AS band, CAST(sum(bit << (p % $bitsPerBand)) AS BIGINT) AS key
       |  FROM bits GROUP BY 1, 2
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
       |), n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e)
       |SELECT c.vec_a, c.vec_b, round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos_sim
       |FROM cand c JOIN n x ON x.vec_id = c.vec_a JOIN n y ON y.vec_id = c.vec_b
       |WHERE list_inner_product(x.v, y.v) / (x.nrm * y.nrm) >= $threshold""".stripMargin

  /** The gate-locked (32-plane, 4-bit) oracle of `dedup_embedding_lsh`. */
  val embeddingLshSql: String = embeddingLshSqlFor(32, 4, 64, "0.4")

  /** Band width the [[embeddingLshPairsAuto]] sizing rule selects for a
    * corpus of `n` vectors: enough band bits that the mean hash-uniform
    * bucket holds ~`targetBucket` vectors, clamped to [minBits, maxBits].
    * Candidate volume is ≈ numBands·n²/2^(bits+1) (measured, BASELINE.md
    * geometry table), so holding n/2^bits constant holds per-vector
    * candidate work constant as the corpus grows — this rule is what turns
    * the fixed-geometry Θ(n²) cliff into ~linear scaling.
    */
  def lshBitsFor(n: Long, targetBucket: Int = 16, minBits: Int = 4, maxBits: Int = 16): Int = {
    require(n > 0 && targetBucket > 0, "corpus and bucket target must be positive")
    val raw = math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt
    math.max(minBits, math.min(maxBits, raw))
  }

  /** Band geometry PLUS probe policy for a corpus of `n` vectors — the
    * round-14 rule past [[lshBitsFor]]'s 16-bit clamp, CHOSEN FROM
    * MEASUREMENT (graft.LshProbeSweep at sf10 + sf100; BASELINE.md):
    *
    * Default (`probeRecall = false`): bits keep growing with the corpus
    * — `ceil(log2(n/targetBucket))`, UNCLAMPED (62 = the Long-packing
    * bound) — and no probe. Mean bucket occupancy stays ≈ targetBucket
    * at any n, so candidate volume is ~bands·target/2 per vector
    * (linear in n, constant per-vector work) forever. The recall cost
    * of each added bit is real but gentle in the production near-dup
    * regime, measured not modeled: clustered-fixture recall at
    * cos ≥ 0.9 is 0.999 @14 bits, 0.995 @16, 0.991 @18, 0.985 @20,
    * 0.974 @22. (The old 16-bit clamp guarded banding COST, which grew
    * with bits only because the per-plane dot projection ran
    * INTERPRETED — the bottleneck [[VectorSignBands]] removed; with it
    * gone, wider bands are nearly free at build and halve serve
    * candidates per bit.) Identical to the old rule at every n below
    * the clamp — zero geometry/oracle/store churn at the gates and
    * ≤sf10.
    *
    * `probeRecall = true`: 1-bit multi-probe with bits re-sized so
    * probe-INCLUSIVE volume n·(1+b)/2^b ≤ targetBucket — recall 1.000
    * measured at sf100 geometry (vs 0.995 unprobed) but 2.2× the
    * inline wall (1308 vs 597 s at sf100, pre-VectorSignBands: the
    * narrow probe expansion + pair dedup + double vector re-attach
    * dominates). The measured-negative default, kept for
    * recall-critical serving.
    *
    * Returns (bitsPerBand, probeFlips ∈ {0, 1}).
    */
  def lshGeometryFor(n: Long, targetBucket: Int = 16,
                     probeRecall: Boolean = false): (Int, Int) = {
    require(n > 0 && targetBucket > 0, "corpus and bucket target must be positive")
    if (!probeRecall) (lshBitsFor(n, targetBucket, maxBits = 62), 0)
    else {
      val raw = math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt
      if (raw <= 16) (lshBitsFor(n, targetBucket), 0)
      else {
        // smallest b ≥ 17 holding probed volume: n·(1+b)/2^b ≤ target.
        // n·(1+62)/2^62 ≤ target for any conceivable corpus, so the
        // search always terminates.
        val b = (17 to 62).find(b => n.toDouble * (1 + b) / math.pow(2.0, b) <= targetBucket).get
        (b, 1)
      }
    }
  }

  /** [[embeddingLshPairs]] with corpus-sized band geometry (NOTES thread 0):
    * one count() of the embedding table picks bitsPerBand via [[lshBitsFor]]
    * (the count is AQE-style plan-time statistics gathering — a scan of
    * row-group metadata, not data), keeping `numBands` fixed so the recall
    * curve 1-(1-s^bits)^bands degrades only through the AND-width. At the
    * production near-dup regime (cos ≥ 0.9) recall stays ≥ 0.95 through
    * 10-bit bands (spec-asserted on the twin-pair fixture); at low
    * thresholds on uniform vectors wider bands trade recall for the
    * survival of the job — BASELINE.md's sf1 sweep measured the fixed
    * (32, 4) geometry at 155 s/73 k candidate pairs vs 7.2 s at 10-bit on
    * the same data.
    */
  def embeddingLshPairsAuto(emb: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, numBands: Int = 8,
                            targetBucket: Int = 16, dim: Int = 64): DataFrame = {
    // max(1, n): an empty corpus has no meaningful geometry but must
    // still plan (output is empty regardless of band width).
    // Geometry comes from [[lshGeometryFor]]: identical to the old
    // lshBitsFor rule (probe off) at every corpus up to ~1 M vectors —
    // gates and oracles unchanged — and the volume-equalized 1-bit
    // multi-probe regime past the old 16-bit clamp (round 14; A/B in
    // BASELINE.md's LshProbeSweep table).
    val (bits, probe) = lshGeometryFor(math.max(1L, emb.count()), targetBucket)
    val n = Similarity.withNorm(emb, idCol, vecCol).persist()
    val bands = embLshBandTable(n, idCol, numBands * bits, bits, dim).persist()
    embLshScoreProbed(bands, n, idCol, threshold, bits, probe)
  }

  /** Oracle of `dedup_embedding_lsh_auto`, pinned to the geometry the
    * sizing rule derives at the driver's oracle scales: sf0.001 AND sf0.01
    * both ship 500 embeddings, so the adaptive rule lands on the same
    * bits = lshBitsFor(500) at both gates. Derived from the same constant
    * the Spark side computes — the two cannot drift while the fixture
    * keeps 500 vectors (and if it ever changes, the hash gate catches it
    * loudly rather than silently).
    */
  val embeddingLshAutoSql: String = {
    val bits = lshBitsFor(500)
    embeddingLshSqlFor(8 * bits, bits, 64, "0.4")
  }

  /** Deterministic QA sample modulus for [[embeddingDedupQa]]: the
    * smallest hash-mod that brings the sampled slice under `target`
    * vectors — 1 (no filter at all) at or below the target. The exact
    * all-pairs truth side is Θ(slice²), so bounding the slice is what
    * makes the report runnable at ANY corpus size: n²/m² ≤ target².
    */
  def embQaSampleModFor(n: Long, target: Long = 500): Long = {
    require(n > 0 && target > 0, "corpus and target must be positive")
    // returns Long, never truncating to Int: for n ≳ 2³¹·target the Int
    // cast could wrap negative and abort the QA at exactly the corpus
    // sizes the sampling rule exists for (ADVICE r10). Ceil division is
    // written overflow-free — (n + target - 1) itself wraps at the top
    // of the Long range.
    math.max(1L, n / target + (if (n % target == 0) 0L else 1L))
  }

  /** Embedding-dedup QA — the embedding twin of [[dedupQaReport]]: score
    * the production banding ([[embeddingLshPairsAuto]]) against the
    * exact all-pairs truth ([[embeddingNearDups]]) at the same cosine
    * threshold, on a hash-deterministic sampled slice
    * ([[embQaSampleModFor]] — the exact side is quadratic, so the slice
    * is bounded by construction, the [[dedupQaReport]] sampleMod pattern
    * with the modulus derived from the corpus count the way
    * [[lshBitsFor]] derives band geometry). Because the LSH path
    * post-filters candidates by the exact cosine, its pairs are a strict
    * SUBSET of truth — precision is 1.0 by construction — so the report
    * is candidate/truth counts and RECALL, the number that actually
    * degrades when band geometry drifts from the corpus.
    *
    * The oracle pins the gate fixture (500 vectors → sampleMod 1, the
    * filter absent from the plan; auto geometry = lshBitsFor(500)),
    * exactly like `dedup_embedding_lsh_auto`.
    */
  def embeddingDedupQa(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, sampleMod: Long): DataFrame = {
    require(sampleMod >= 1, "embeddingDedupQa: sampleMod must be >= 1")
    val slice = if (sampleMod == 1) emb
      else emb.filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
    val cand = embeddingLshPairsAuto(slice, idCol, vecCol, threshold)
    val truth = embeddingNearDups(slice, idCol, vecCol, threshold)
    cand.agg(count(lit(1)).as("n_cand"))
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .select(col("n_cand"), col("n_truth"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(col("n_cand").cast("double") / col("n_truth")).as("recall_vs_exact"))
  }

  val embeddingDedupQaSql: String = {
    val bits = lshBitsFor(500)
    s"""WITH cand AS (${embeddingLshSqlFor(8 * bits, bits, 64, "0.4")}),
       |truth AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |        FROM embeddings) a
       |  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |        FROM embeddings) b ON a.vec_id < b.vec_id
       |  WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4),
       |m AS (SELECT count(*) AS n_cand FROM cand),
       |t AS (SELECT count(*) AS n_truth FROM truth)
       |SELECT n_cand, n_truth,
       |       CASE WHEN n_truth = 0 THEN NULL
       |            ELSE CAST(n_cand AS DOUBLE) / n_truth END AS recall_vs_exact
       |FROM m, t""".stripMargin
  }

  val embeddingNearDupSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |       round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos_sim
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4""".stripMargin

  /** Cluster assignment over the near-dup candidate graph — the step that
    * turns pairwise dedup output into something a pipeline can act on
    * (keep one canonical doc per cluster): connected components by
    * iterative min-label propagation. Every doc starts as its own label;
    * each round a node adopts the minimum label among itself and its
    * neighbors; fixpoint when no label drops. The cluster id is therefore
    * the minimum doc id in the component — deterministic, engine-portable.
    *
    * Scale shape: each round is one equi-join of the (symmetrized) edge
    * list against the label table plus a min-aggregate — all hash
    * exchanges on ids, no driver-side graph — followed by a pointer-jump
    * (comp := comp(comp), a self-join of the label table) that halves the
    * remaining label-chain depth, giving O(log diameter) rounds instead of
    * O(diameter); rounds are the cost driver both here (per-job overhead)
    * and on a cluster (per-stage barriers). Three scale decisions beyond
    * that: (1) the computation runs over the EDGE-TOUCHED nodes only — a
    * near-dup graph touches a fraction of the corpus, so it costs
    * O(|V(pairs)|), not O(|docs|); the untouched majority joins back once
    * at the end as singleton components. (2) ADAPTIVE ENDGAME: when the
    * candidate graph fits one task (`localMaxEdges`, ~80 MB of long
    * pairs — the common case after banded dedup at ANY corpus scale,
    * because near-dup pairs are rare by construction), the components are
    * finished by an in-task union-find in a single `mapPartitions` job:
    * one shuffle-free pass instead of 5+ iterative rounds of joins. This
    * is the same small-subgraph cutoff every distributed CC implementation
    * uses; work stays on an executor, nothing is collected to the driver.
    * Graphs ABOVE the cutoff first run a per-partition union-find
    * CONTRACTION ([[contractEdges]]): each partition's edges collapse to
    * a spanning star, killing the O(k²) clique redundancy of banded pair
    * lists in one narrow pass — the contracted remainder almost always
    * fits the endgame task, and only a genuinely huge component graph
    * falls through to the iterative path (then over the contracted, not
    * raw, edges).
    * (3) on the iterative path, `localCheckpoint` after each round
    * truncates the growing lineage, and the PREVIOUS round's checkpoint
    * RDD is unpersisted as soon as the new round materializes, so executor
    * storage stays O(1) rounds, not O(iters).
    *
    * The union-find endgame needs an ordered primitive id (cluster id =
    * component minimum); non-long id columns always take the iterative
    * path, which orders through Catalyst's `min`/`least`.
    */
  def connectedComponents(docs: DataFrame, pairs: DataFrame, idCol: String,
                          aCol: String = "doc_a", bCol: String = "doc_b",
                          maxIters: Int = 50,
                          localMaxEdges: Long = 5000000L): DataFrame = {
    // persist the projected pairs BEFORE any multi-consumer use: the
    // candidate-pair plan (minhash signatures + band join) is the most
    // expensive input step and must run exactly once
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst")).persist()
    val nEdges = p.count()
    val idIsLong =
      p.schema.fields.forall(_.dataType == org.apache.spark.sql.types.LongType)
    val (labels, labelsSmall) =
      if (idIsLong && nEdges <= localMaxEdges) (unionFindLocal(p), true)
      else if (idIsLong) {
        // Too many edges for one task — CONTRACT before anything
        // iterative. Banded-LSH pair lists are clique-shaped (a cluster
        // of k near-identical docs emits O(k²) pairs, repeated per
        // band), so a per-partition union-find that replaces each
        // partition's edges with a spanning star of the same node set
        // removes the quadratic redundancy in ONE narrow pass — the
        // round-14 sf100 graph (the 286 s iterative cliff) contracts
        // under the local bound and finishes in a single endgame task.
        val (contracted, nC) = contractEdges(p, localMaxEdges)
        val l = if (nC <= localMaxEdges) (unionFindLocal(contracted), true)
                else (propagateIteratively(contracted, maxIters), false)
        unpersistCheckpoint(contracted)
        l
      }
      else (propagateIteratively(p, maxIters), false)
    p.unpersist() // all paths have materialized their own copy by now
    // singletons never enter the component computation; identity-label
    // them here. The component map broadcasts only when a MEASURED row
    // count says it is genuinely small: the union-find path alone bounds
    // labels by 2×localMaxEdges ≈ 10M rows (hundreds of MB — a legal but
    // nasty driver/executor spike), so "took the local path" is not
    // sufficient. The count is cheap (labels is already localCheckpointed)
    // and everything above the cap takes a shuffle join, where docs only
    // shuffles its id column.
    val bc: DataFrame => DataFrame =
      if (labelsSmall && labels.count() <= 2000000L) broadcast else identity
    docs.select(col(idCol).as("doc_id"))
      .join(bc(labels), col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster_id"))
  }

  /** In-task union-find with path compression and union-by-min (root ==
    * component minimum) — the primitive both the endgame task and the
    * contraction passes run. Instantiated INSIDE mapPartitions closures,
    * so it lives and dies on one executor; nothing is serialized or
    * collected.
    */
  private final class LongUnionFind {
    // Open-addressing long→long map doubling as the seen-set: a slot
    // holds (node, parent); parent == node for roots. Primitive arrays —
    // the previous HashMap/TreeSet implementation boxed every access and
    // paid O(log n) ORDERED inserts per union (2 per edge), which the
    // r20 per-job audit measured as the dominant term of BOTH the
    // contraction pass and the endgame task at sf100 (21.3 s + 12.5 s of
    // the 39.6 s CC machinery over 19 M edges). Iteration order is no
    // longer sorted — emission order was never semantically relevant
    // (labels feed joins/aggregates keyed by id).
    private var cap = 1 << 16
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0

    private def slot(k: Long): Int = {
      // 64→32-bit mix (splitmix64 finalizer) then mask
      var h = k
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      var i = (h.toInt) & mask
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      i
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals; val ou = used
      cap <<= 1; mask = cap - 1; n = 0
      keys = new Array[Long](cap); vals = new Array[Long](cap); used = new Array[Boolean](cap)
      var i = 0
      while (i < ok.length) {
        if (ou(i)) { val s = slot(ok(i)); keys(s) = ok(i); vals(s) = ov(i); used(s) = true; n += 1 }
        i += 1
      }
    }
    /** parent(x), inserting x as its own root on first sight. */
    private def getOrInsert(x: Long): Long = {
      val s = slot(x)
      if (!used(s)) {
        keys(s) = x; vals(s) = x; used(s) = true; n += 1
        if (n * 2 > cap) grow()
        x
      } else vals(s)
    }
    private def set(x: Long, p: Long): Unit = {
      val s = slot(x)
      if (!used(s)) { keys(s) = x; used(s) = true; n += 1 }
      vals(s) = p
      if (n * 2 > cap) grow()
    }

    def find(x: Long): Long = {
      var root = getOrInsert(x)
      while ({ val p = getOrInsert(root); p != root && { root = p; true } }) ()
      var cur = x // path-compress the walked chain
      while ({ val p = getOrInsert(cur); p != cur && { set(cur, root); cur = p; true } }) ()
      root
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      // union-by-min keeps the invariant root == component minimum
      if (ra < rb) set(rb, ra) else if (rb < ra) set(ra, rb)
    }
    /** Every node ever touched, with its representative. */
    def foreachLabeled(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) {
        if (used(i)) f(keys(i), find(keys(i)))
        i += 1
      }
    }
  }

  /** Endgame path: the whole (small) edge list flows into one task; a
    * union-find with path compression and union-by-min labels every
    * touched node with its component minimum in one pass. Runs as a
    * normal executor task — no driver collect — and the result is
    * `localCheckpoint`ed so the persisted pair input can be released.
    */
  private def unionFindLocal(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    p.as[(Long, Long)].coalesce(1).mapPartitions { it =>
      val uf = new LongUnionFind
      it.foreach { case (a, b) => uf.union(a, b) }
      val out = Iterator.newBuilder[(Long, Long)]
      uf.foreachLabeled((x, r) => out += ((x, r)))
      out.result()
    }.toDF("id", "comp").localCheckpoint()
  }

  /** One contraction pass: per PARTITION, union-find the local edges and
    * emit a spanning star of the same node set — (node → local root) for
    * every non-root node. Connectivity-preserving by construction (each
    * partition's edge subset is replaced by an equivalent spanning
    * structure over exactly the same nodes), narrow (no shuffle — it runs
    * on whatever partitioning the input already has), and it is where the
    * clique redundancy of banded-LSH pair lists dies: a k-clique's O(k²)
    * pairs leave as k−1 star edges.
    */
  private def contractPass(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.as[(Long, Long)].mapPartitions { it =>
      val uf = new LongUnionFind
      it.foreach { case (a, b) => uf.union(a, b) }
      val out = Iterator.newBuilder[(Long, Long)]
      uf.foreachLabeled((x, r) => if (r != x) out += ((x, r)))
      out.result()
    }.toDF("src", "dst")
  }

  /** Two-level contraction driver (the round-14 scale fix): pass 0 runs
    * on the pair list's natural partitioning (one narrow job — this is
    * the 10-100× clique-collapse pass); further passes alternate
    * re-hashing on `src` (merges the stars of a node that reached
    * different local roots in different partitions) and on `dst`
    * (co-locates each root's members) until the remainder fits the
    * endgame task or stops shrinking. Each pass `localCheckpoint`s its
    * (long, long) output — megabytes, not corpus-scale — and releases the
    * previous one, so lineage and storage stay O(1) passes. Returns the
    * contracted edges (checkpointed; caller releases) and their count.
    *
    * vs the iterative min-label fallback this replaces in front of: a
    * contraction pass is ONE narrow map over long pairs, where an
    * iterative round is 4 joins + a materialization over the full label
    * set — at sf100 (round 14) the fallback cost 286 s for
    * `dedup_clusters_staged`; the contracted graph fits the single-task
    * endgame instead.
    */
  private def contractEdges(p: DataFrame, localMaxEdges: Long,
                            maxPasses: Int = 4): (DataFrame, Long) = {
    var cur = contractPass(p).localCheckpoint()
    var n = cur.count()
    var pass = 0
    var stalled = false
    while (n > localMaxEdges && pass < maxPasses && !stalled) {
      val key = if (pass % 2 == 0) "src" else "dst"
      val next = contractPass(cur.repartition(col(key))).localCheckpoint()
      val nNext = next.count()
      unpersistCheckpoint(cur)
      // a star list re-contracts to (at best) itself once roots are
      // merged — under 10% reduction means the node count IS the floor,
      // and more passes only add shuffles
      stalled = nNext > (n / 10) * 9
      cur = next; n = nNext; pass += 1
    }
    (cur, n)
  }

  /** Iterative path for graphs too large for [[unionFindLocal]]:
    * min-label propagation with pointer jumping, one checkpointed
    * materialization per round.
    */
  private def propagateIteratively(p: DataFrame, maxIters: Int): DataFrame = {
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .persist() // read once per round
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint()
    var prevRound = labels
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("nbr_comp"))
      // prev rides along so convergence needs no extra join against the
      // previous round — one filter on the already-cached result instead
      val stepped = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
      // pointer jump: comp := comp(comp). Every comp value is a node id,
      // so the self-join hits; min-labels only ever decrease, so jumping
      // stays within the component.
      val next = stepped
        .join(stepped.select(col("id").as("jid"), col("comp").as("jcomp")),
          stepped("comp") === col("jid"), "left")
        .select(stepped("id"), coalesce(col("jcomp"), stepped("comp")).as("comp"), stepped("prev"))
        .localCheckpoint() // eager: one round = one materialization
      converged = next.filter(col("comp") < col("prev")).isEmpty
      unpersistCheckpoint(prevRound) // next is materialized; round N-1's cache is dead weight
      prevRound = next
      // each round references labels FOUR times (nbrMin + stepped + the
      // pointer-jump self-join), so the checkpoint's inherited origin
      // stats would quadruple their BigInt digit count per round —
      // million-digit sizeInBytes products froze sf100 planning for
      // 40+ min before this sever (see Scoped.severPlanMetadata)
      labels = graft.engine.Scoped.severPlanMetadata(next.select(col("id"), col("comp")))
      iters += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIters rounds — label-chain depth exceeds " +
          "the cap; raise maxIters")
    labels
  }

  /** See [[graft.engine.Scoped.unpersistCheckpoint]] — shared per-round
    * checkpoint hygiene.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    graft.engine.Scoped.unpersistCheckpoint(df)

  /** Fixed-point PageRank over the near-dup candidate graph: rank every
    * edge-touched document by its centrality in the [[minhashLshPairs]]
    * similarity graph — the "pick the canonical copy" signal that beats
    * longest-text heuristics when a boilerplate family has one original
    * and many mutated descendants (the original sits central; mutants hang
    * off it). Symmetric edges, damping 0.85, `iters` synchronous rounds.
    *
    * All arithmetic is BIGINT fixed-point at `scale` (rank starts at
    * `scale`; contribution = rank div degree; next rank = 15% teleport +
    * 85% of the contribution sum, both via integer div) — floating-point
    * PageRank can NEVER be oracle-hashed (sum order changes the ulps), but
    * integer division is associative-safe: any engine that agrees on the
    * edges agrees on every rank at every round, bit for bit.
    *
    * Scale shape: the loop is `iters` chained {join on src → groupBy dst}
    * rounds, every one keyed on the SAME doc-id partitioning (one
    * partitioner reused end to end; Spark's shuffle reuse keeps the edge
    * side staged after round 1). Edge list and degree table are persisted
    * once; rank frames are (id, long) pairs — document text never enters
    * the loop. Rounds are fixed (5), so lineage depth is bounded and no
    * checkpointing is needed; a convergence-driven variant would reuse
    * [[connectedComponents]]'s per-round localCheckpoint hygiene.
    */
  def docPagerank(docs: DataFrame, idCol: String, textCol: String,
                  iters: Int = 5, scale: Long = 1000000L): DataFrame =
    pagerankOnPairs(minhashLshPairs(docs, idCol, textCol), idCol, iters, scale)

  /** The rank loop of [[docPagerank]] over an explicit undirected pair
    * frame (doc_a, doc_b) — also the entry point for ranking any other
    * candidate graph (n-gram, embedding-LSH) with the same fixed-point
    * semantics.
    */
  def pagerankOnPairs(pairs: DataFrame, idCol: String,
                      iters: Int, scale: Long): DataFrame = {
    require(iters >= 1 && scale % 100L == 0L, "need iters >= 1 and scale % 100 == 0")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist() // read every round
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    // loop-invariant: (src, dst, deg-of-src) — contribution routing table
    val edgeDeg = edges.join(deg, Seq("src")).persist()
    pagerankOnEdgeDeg(edgeDeg, deg, idCol, iters, scale)
  }

  /** The rank rounds over EXPLICIT (src, dst, deg) routing-table and
    * (src, deg) degree frames — shared by the inline operator above
    * (both derived in-plan from the pair list) and the staged serve
    * ([[graft.functions.SigIndex.docPagerankStaged]]: both read from the
    * clusters store, where they are revision-static artifacts — the
    * graph prep never runs in a serve plan). Integer fixed-point
    * arithmetic makes the two paths bit-identical, so the oracle is
    * shared unchanged.
    */
  /** Dev-sweep window into [[pagerankOnEdgeDeg]] (PrSweep only). */
  private[graft] def pagerankOnEdgeDegForSweep(edgeDeg: DataFrame, deg: DataFrame,
                                               idCol: String, iters: Int,
                                               scale: Long): DataFrame =
    pagerankOnEdgeDeg(edgeDeg, deg, idCol, iters, scale)

  private[functions] def pagerankOnEdgeDeg(edgeDeg: DataFrame, deg: DataFrame,
                                           idCol: String, iters: Int,
                                           scale: Long): DataFrame = {
    require(iters >= 1 && scale % 100L == 0L, "need iters >= 1 and scale % 100 == 0")
    val teleport = 15L * scale / 100L
    var rank = deg.select(col("src").as(idCol), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      rank = rank
        .join(edgeDeg, rank(idCol) === edgeDeg("src"))
        .select(col("dst").as(idCol), expr("pr div deg").as("contrib"))
        .groupBy(col(idCol))
        .agg(sum(col("contrib")).as("s"))
        .select(col(idCol), (lit(teleport) + expr("(85 * s) div 100")).as("pr"))
    }
    rank.join(deg, rank(idCol) === deg("src"))
      .select(col(idCol), col("deg").cast("long").as("deg"), col("pr").cast("long").as("pr"))
  }

  /** DuckDB twin of [[docPagerank]]: the same rounds unrolled as chained
    * CTEs — integer fixed-point makes the unrolling exact, not approximate.
    */
  def docPagerankSqlFor(iters: Int, scale: Long): String = {
    val teleport = 15L * scale / 100L
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS doc_id, $teleport + (85 * sum(r.pr // d.deg)) // 100 AS pr
         |  FROM r${i - 1} r JOIN edges e ON r.doc_id = e.src JOIN deg d ON d.src = r.doc_id
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS ($minhashSql),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |r0 AS (SELECT src AS doc_id, CAST($scale AS BIGINT) AS pr FROM deg),
       |$rounds
       |SELECT r.doc_id, CAST(d.deg AS BIGINT) AS deg, CAST(r.pr AS BIGINT) AS pr
       |FROM r$iters r JOIN deg d ON d.src = r.doc_id""".stripMargin
  }

  /** DuckDB twin of [[connectedComponents]] over the [[minhashSql]] pair
    * graph: a recursive CTE enumerates every (node, reachable-node) pair —
    * min over the reachable set is the component minimum, the same
    * cluster id the propagation converges to.
    */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS ($minhashSql),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, comp) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
       |)
       |SELECT id AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY 1""".stripMargin

  /** End-to-end near-dup dedup pipeline: MinHash-LSH candidate pairs →
    * connected components → one surviving representative per cluster
    * (longest text, doc_id tie-break) with the cluster size — the full
    * "dedup the corpus, keep the best copy" composition a pretraining
    * pipeline actually runs, as one registered plan.
    *
    * Scale shape: everything upstream is the audited dedup_clusters plan
    * (banded equi-join candidates, pointer-jumping components with a
    * union-find endgame); the representative pick adds one window over
    * cluster partitions whose shuffle carries (id, cluster, length)
    * triples — document text never moves.
    */
  def dedupPipeline(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    keepBestOfClusters(docs,
      connectedComponents(docs, minhashLshPairs(docs, idCol, textCol), idCol), idCol, textCol)

  /** The keep-best endgame over an EXPLICIT (id, cluster_id) frame —
    * shared by the inline pipeline above and the staged signature
    * store's serve ([[SigIndex]] `dedup_pipeline_staged`): per cluster,
    * keep the longest member (id-asc tie-break) with its member count.
    */
  private[functions] def keepBestOfClusters(docs: DataFrame, clusters: DataFrame,
                                            idCol: String, textCol: String): DataFrame = {
    val slim = docs.select(col(idCol).as("d_id"), length(col(textCol)).cast("long").as("doc_len"))
    val grp = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    clusters.join(slim, col(idCol) === col("d_id"))
      .select(col(idCol), col("cluster_id"), col("doc_len"))
      .withColumn("rn", row_number().over(grp.orderBy(col("doc_len").desc, col(idCol).asc)))
      .withColumn("n_members", count(lit(1)).over(grp))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cluster_id"), col("doc_len"), col("n_members"))
  }

  val dedupPipelineSql: String =
    s"""WITH RECURSIVE pairs AS ($minhashSql),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, comp) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
       |),
       |clusters AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY 1),
       |m AS (SELECT d.doc_id, c.cluster_id, CAST(length(d.text) AS BIGINT) AS doc_len
       |      FROM documents d JOIN clusters c ON d.doc_id = c.doc_id),
       |r2 AS (SELECT doc_id, cluster_id, doc_len,
       |        row_number() OVER (PARTITION BY cluster_id ORDER BY doc_len DESC, doc_id ASC) AS rn,
       |        count(*) OVER (PARTITION BY cluster_id) AS n_members
       |      FROM m)
       |SELECT doc_id, cluster_id, doc_len, n_members FROM r2 WHERE rn = 1""".stripMargin

  /** SimHash bit-vote accumulator: slot b counts set bits of position b,
    * slot 64 counts tokens; a fingerprint bit is set when set-bits form the
    * majority (2·c_b > n ⟺ the ±1 vote sum is positive). Same
    * zero/reduce/merge/finish shape as the reference's AggregateFunction
    * (reference: WindowFunctions.scala:87-97).
    */
  class SimHashAggregator extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long](65)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < 64) { b(i) += (h >>> i) & 1L; i += 1 }
      b(64) += 1
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 65) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Long = {
      var fp = 0L
      var i = 0
      while (i < 64) { if (2 * b(i) > b(64)) fp |= 1L << i; i += 1 }
      fp
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_exact", (s, dir) => exact(Tables.documents(s, dir), "doc_id", "text"), Some(exactSql)),
    QueryDef("dedup_minhash", (s, dir) => minhashLshPairs(Tables.documents(s, dir), "doc_id", "text"), Some(minhashSql)),
    QueryDef("dedup_minhash_est", (s, dir) => minhashEstJaccard(Tables.documents(s, dir), "doc_id", "text"), Some(minhashEstJaccardSql)),
    // The registry's ONE remaining rows-only qkey, and measurably so by
    // necessity (VERDICT r15 item 6 asked for a deterministic oracle
    // projection): the candidate set is a function of the per-token hash
    // family — even restricted to hamming ≤ 3, the xxhash64 and md5 pair
    // sets differ on every gate fixture (sf0.1: 525 vs 512 pairs, 371/358
    // one-sided — borderline near-dups flip votes differently per
    // family), so no projection of the xxhash64 output is portable. The
    // algorithm is oracle-gated through dedup_simhash_md5 (identical
    // code path over a portable fingerprint) and the exact-dup recall +
    // cardinality pins in DedupSimilaritySpec.
    QueryDef("dedup_simhash", (s, dir) => simhashPairs(Tables.documents(s, dir), "doc_id", "text"), None),
    // oracle-backed twin of dedup_simhash: md5-slice token hash makes the
    // fingerprint engine-portable; xxhash64 stays the production default
    QueryDef("dedup_simhash_md5", (s, dir) => simhashPairsMd5(Tables.documents(s, dir), "doc_id", "text"), Some(simhashMd5Sql)),
    // the corpus-sized twin (VERDICT r16 item 3): exact hamming<=3 pairs
    // via auto block-combination geometry — NOT in the bench skip set;
    // at gate scales the geometry IS the fixed 4x16 banding, at scale it
    // widens keys (m=5: 25-bit keys, 10 tables at sf10/sf100) instead of
    // paying the n^2/2^16 candidate cliff
    QueryDef("dedup_simhash_auto", (s, dir) => simhashPairsAuto(Tables.documents(s, dir), "doc_id", "text"), Some(simhashAutoSql)),
    // NgramStride (6, vs the shingles default 4): the round-4 sweep
    // (NgramSweep) measured 3.0 s vs 5.8 s at sf0.1 with an IDENTICAL
    // pair set at both strides (sym-diff 0 at sf0.01) — sparser
    // winnowing, same recall at the 0.8 threshold. Registration, Scala
    // default, and oracle all read the one constant.
    QueryDef("dedup_ngram", (s, dir) => ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text"), Some(ngramJaccardSql)),
    QueryDef("dedup_containment", (s, dir) => ngramContainmentPairs(Tables.documents(s, dir), "doc_id", "text"), Some(ngramContainmentSql)),
    // self-bounding: the modulus derives from the corpus count (n/500),
    // so the exact-truth side never exceeds ~500 docs; = 1 (filter-free
    // plan, oracle-identical) at the ≤500-doc gate scales
    QueryDef("dedup_qa_report", (s, dir) => {
      val docs = Tables.documents(s, dir)
      dedupQaReport(docs, "doc_id", "text", embQaSampleModFor(docs.count()))
    }, Some(dedupQaReportSql)),
    QueryDef("dedup_embedding", (s, dir) => embeddingNearDups(Tables.embeddings(s, dir), "vec_id", "embedding", 0.4), Some(embeddingNearDupSql)),
    // ORACLE GATE TWIN — do not use at scale. The fixed (32, 4) geometry
    // is Θ(n²) with a 1/2^bits constant (measured 236 s at 10× data vs
    // 5.8 s for the auto geometry); it stays registered only because its
    // oracle is pinned to this exact geometry. Production entry point is
    // dedup_embedding_lsh_auto below.
    QueryDef("dedup_embedding_lsh", (s, dir) => embeddingLshPairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.4), Some(embeddingLshSql)),
    // PRODUCTION embedding near-dup path: band bits sized to the corpus.
    QueryDef("dedup_embedding_lsh_auto", (s, dir) => embeddingLshPairsAuto(Tables.embeddings(s, dir), "vec_id", "embedding", 0.4), Some(embeddingLshAutoSql)),
    QueryDef("embedding_dedup_qa",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        embeddingDedupQa(emb, "vec_id", "embedding", 0.4, embQaSampleModFor(emb.count()))
      },
      Some(embeddingDedupQaSql)),
    QueryDef("dedup_incremental",
      (s, dir) => dedupIncremental(Tables.documents(s, dir), "doc_id", "text", pmod(col("doc_id"), lit(5L)) === 0L),
      Some(dedupIncrementalSql)),
    QueryDef("dedup_clusters", (s, dir) => {
      val docs = Tables.documents(s, dir)
      connectedComponents(docs, minhashLshPairs(docs, "doc_id", "text"), "doc_id")
    }, Some(dedupClustersSql)),
    QueryDef("dedup_pipeline",
      (s, dir) => dedupPipeline(Tables.documents(s, dir), "doc_id", "text"),
      Some(dedupPipelineSql)),
    QueryDef("doc_pagerank",
      (s, dir) => docPagerank(Tables.documents(s, dir), "doc_id", "text"),
      Some(docPagerankSqlFor(5, 1000000L))),
  )
}
