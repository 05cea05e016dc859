package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}

/** Staged MinHash signature index — the document-dedup analogue of
  * [[AnnIndex]]: shingle + md5 + min-aggregate ONCE per corpus revision,
  * persist the signature table and its LSH band index to storage, and
  * serve every candidate-generation consumer from the stored artifacts
  * with zero text lineage in the serve plan. At 100 TB the signature
  * build is the only pass that touches document TEXT; every downstream
  * dedup query (pairs, est-Jaccard, clustering, incremental ingest, the
  * streaming leakage monitor's static side) runs off |docs| × 8 hashes —
  * kilobytes per million documents, rebuilt only when the corpus
  * revision changes.
  *
  * All signature arithmetic is md5-based (engine-identical bytes), so
  * staged serves are bit-for-bit equal to the inline operators and share
  * their DuckDB oracles unchanged — "build the index in Spark, retrain
  * in SQL, hashes must agree" (spec-pinned, same contract as the ANN
  * store).
  *
  * Layout under one (sf-dir, geometry) fingerprint directory:
  *  - `minhash_sigs` (doc_id, mh_1..mh_8) — the signature table
  *  - `band_index`   (doc_id, band, sig)  — the LSH candidate structure
  * with the same `_GRAFT_SIG_OK` self-healing completion-marker protocol
  * as [[AnnIndex.stageOnce]].
  */
object SigIndex {
  val NumHashes = 8
  val RowsPerBand = 2

  private def basePath(spark: SparkSession, dir: String): org.apache.hadoop.fs.Path = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_sig_${tag}_h${NumHashes}b${RowsPerBand}_r1")
  }

  /** Fingerprint directory for the staged SHINGLE store — the exact
    * distinct stride-sampled character shingles the n-gram family
    * (jaccard, containment, QA-report ground truth) computes inline.
    * Separate artifact from the minhash store: different geometry
    * (width 8 / stride [[Dedup.NgramStride]], distinct) and a much
    * larger footprint (per-token rows, not 8 hashes), staged only for
    * the consumers that need EXACT set arithmetic. Still far smaller
    * than text (8-char slices, one per stride), and it turns every
    * exact-dedup pass after the first into a text-free serve.
    */
  private def shingleBasePath(spark: SparkSession, dir: String): org.apache.hadoop.fs.Path = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_shingle_${tag}_w8s${Dedup.NgramStride}_r1")
  }

  /** Build the shingle store once per (corpus dir, geometry) — same
    * `_GRAFT_SHINGLE_OK` self-healing marker protocol as [[stageOnce]].
    */
  def stageShingles(spark: SparkSession, dir: String): String = {
    val base = shingleBasePath(spark, dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(base, "_GRAFT_SHINGLE_OK")
    if (fs.exists(marker)) return base.toString
    if (fs.exists(base)) fs.delete(base, true)
    val docs = Tables.documents(spark, dir)
    TextAnalysis.shingles(docs, "doc_id", "text", width = 8, stride = Dedup.NgramStride)
      .write.mode("overwrite").parquet(s"$base/shingles")
    fs.create(marker).close()
    base.toString
  }

  private def storedShingles(spark: SparkSession, dir: String): DataFrame = {
    val base = stageShingles(spark, dir)
    spark.read.parquet(s"$base/shingles")
  }

  /** Exact n-gram Jaccard near-dup pairs served from the shingle store —
    * df-cap + inverted-index self-join straight off stored (doc_id, sh)
    * rows; document text is read zero times. Same oracle as the inline
    * dedup_ngram (the store holds exactly the shingles the inline path
    * computes).
    */
  def ngramJaccardStaged(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardFromShingles(storedShingles(spark, dir), "doc_id")

  /** Exact n-gram containment pairs off the shingle store (see
    * [[ngramJaccardStaged]]).
    */
  def ngramContainmentStaged(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainmentFromShingles(storedShingles(spark, dir), "doc_id")

  /** The LSH-vs-exact QA report with BOTH sides served from storage:
    * candidates from the minhash band index, ground truth from the
    * shingle store. The per-ingest-batch dedup health check at 100 TB —
    * the one report that deliberately runs the approximate AND the exact
    * path — without re-reading a byte of document text. Same oracle as
    * the inline dedup_qa_report.
    */
  def dedupQaReportStaged(spark: SparkSession, dir: String): DataFrame =
    Dedup.qaReportFromPairs(
      minhashPairsStaged(spark, dir),
      ngramJaccardStaged(spark, dir))

  def stageOnce(spark: SparkSession, dir: String): String = {
    val base = basePath(spark, dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(base, "_GRAFT_SIG_OK")
    if (fs.exists(marker)) return base.toString
    if (fs.exists(base)) fs.delete(base, true)
    val docs = Tables.documents(spark, dir)
    val sh = TextAnalysis.shingles(docs, "doc_id", "text", distinct = false)
    Dedup.minhashSignatures(sh, "doc_id", NumHashes)
      .write.mode("overwrite").parquet(s"$base/minhash_sigs")
    // bands derive from the STORED signatures so the index is internally
    // consistent even if the signature lineage were ever to change
    val sigsStored = spark.read.parquet(s"$base/minhash_sigs")
    Dedup.minhashBands(sigsStored, "doc_id", NumHashes, RowsPerBand)
      .write.mode("overwrite").parquet(s"$base/band_index")
    fs.create(marker).close()
    base.toString
  }

  /** LSH candidate pairs served from the STORED band index — the
    * dedup_minhash serve that never touches document text: one equi-join
    * over (band, sig) rows already on disk. Bit-for-bit equal to the
    * inline [[Dedup.minhashLshPairs]] (same oracle).
    */
  def minhashPairsStaged(spark: SparkSession, dir: String): DataFrame = {
    val base = stageOnce(spark, dir)
    Dedup.pairsFromBands(spark.read.parquet(s"$base/band_index"), "doc_id")
  }

  /** Estimated-Jaccard scoring served ENTIRELY from the store: candidate
    * pairs from the stored band index, similarity as the agreeing-slot
    * fraction over the stored signature table. The production near-dup
    * report at 100 TB — text is never read (same oracle as the inline
    * dedup_minhash_est).
    */
  def estJaccardStaged(spark: SparkSession, dir: String): DataFrame = {
    val base = stageOnce(spark, dir)
    val mh = spark.read.parquet(s"$base/minhash_sigs")
    val pairs = Dedup.pairsFromBands(spark.read.parquet(s"$base/band_index"), "doc_id")
    val a = mh.select(col("doc_id").as("doc_a") +:
      (1 to NumHashes).map(j => col(s"mh_$j").as(s"a_$j")): _*)
    val b = mh.select(col("doc_id").as("doc_b") +:
      (1 to NumHashes).map(j => col(s"mh_$j").as(s"b_$j")): _*)
    val agree = (1 to NumHashes)
      .map(j => when(col(s"a_$j") === col(s"b_$j"), 1).otherwise(0)).reduce(_ + _)
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), (agree.cast("double") / NumHashes).as("est_jacc"))
  }

  /** Near-dup clustering off the store: stored-band candidate pairs →
    * the same union-find/iterative connected components as the inline
    * dedup_clusters — the full corpus-dedup decision, with text read
    * zero times.
    */
  def dedupClustersStaged(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(Tables.documents(spark, dir),
      minhashPairsStaged(spark, dir), "doc_id")

  /** Duplicate-graph PageRank off the store: stored-band candidate graph
    * → the same integer fixed-point rank rounds as the inline
    * doc_pagerank.
    */
  def docPagerankStaged(spark: SparkSession, dir: String): DataFrame =
    Dedup.pagerankOnPairs(minhashPairsStaged(spark, dir), "doc_id", 5, 1000000L)

  /** Split-leakage audit off the store: stored-band candidate pairs
    * joined against the hash-deterministic split assignment — the
    * quarantine list, with text read zero times.
    */
  def splitLeakageStaged(spark: SparkSession, dir: String): DataFrame =
    Curation.splitLeakageFromPairs(Tables.documents(spark, dir),
      minhashPairsStaged(spark, dir), "doc_id")

  /** The full keep-best dedup DECISION off the store: stored-band pairs →
    * components → longest-member-per-cluster — the end-to-end pipeline a
    * curation pass applies, amortized onto the staged signature build
    * (text is read only for the keep-best length lookup, one pruned
    * column scan).
    */
  def dedupPipelineStaged(spark: SparkSession, dir: String): DataFrame =
    Dedup.keepBestOfClusters(Tables.documents(spark, dir),
      dedupClustersStaged(spark, dir), "doc_id", "text")

  /** Daily-ingest near-dup check off the store: the CORPUS side's
    * signatures and bands come from disk (filtered to the existing
    * slice); only the NEW batch's text is shingled and signed — exactly
    * what a live ingest pays per batch. md5 determinism makes the match
    * report bit-for-bit equal to the inline [[Dedup.dedupIncremental]]
    * (same oracle).
    */
  def dedupIncrementalStaged(spark: SparkSession, dir: String,
                             newPred: org.apache.spark.sql.Column =
                               pmod(col("doc_id"), lit(5L)) === 0L,
                             threshold: Double = 0.5): DataFrame = {
    val base = stageOnce(spark, dir)
    val batch = Tables.documents(spark, dir).filter(newPred)
    val mhB = Dedup.minhashSignatures(
      TextAnalysis.shingles(batch, "doc_id", "text", distinct = false), "doc_id", NumHashes)
      .persist()
    val bandsB = Dedup.minhashBands(mhB, "doc_id", NumHashes, RowsPerBand)
    val mhEx = spark.read.parquet(s"$base/minhash_sigs").filter(!newPred)
    val bandsEx = spark.read.parquet(s"$base/band_index").filter(!newPred)
    Dedup.incrementalMatches(mhB, bandsB, mhEx, bandsEx, "doc_id", threshold, NumHashes)
  }

  /** Same oracles as the inline twins: the index contents are
    * md5-deterministic, so "hash in SQL, serve the store in Spark" must
    * produce identical bytes.
    */
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dedup_minhash_staged",
      (s, dir) => minhashPairsStaged(s, dir),
      Some(Dedup.minhashSql)),
    QueryDef(
      "dedup_minhash_est_staged",
      (s, dir) => estJaccardStaged(s, dir),
      Some(Dedup.minhashEstJaccardSql)),
    QueryDef(
      "dedup_clusters_staged",
      (s, dir) => dedupClustersStaged(s, dir),
      Some(Dedup.dedupClustersSql)),
    QueryDef(
      "doc_pagerank_staged",
      (s, dir) => docPagerankStaged(s, dir),
      Some(Dedup.docPagerankSqlFor(5, 1000000L))),
    QueryDef(
      "split_leakage_staged",
      (s, dir) => splitLeakageStaged(s, dir),
      Some(Curation.splitLeakageSql)),
    QueryDef(
      "dedup_pipeline_staged",
      (s, dir) => dedupPipelineStaged(s, dir),
      Some(Dedup.dedupPipelineSql)),
    QueryDef(
      "dedup_incremental_staged",
      (s, dir) => dedupIncrementalStaged(s, dir),
      Some(Dedup.dedupIncrementalSql)),
    QueryDef(
      "dedup_ngram_staged",
      (s, dir) => ngramJaccardStaged(s, dir),
      Some(Dedup.ngramJaccardSql)),
    QueryDef(
      "dedup_containment_staged",
      (s, dir) => ngramContainmentStaged(s, dir),
      Some(Dedup.ngramContainmentSql)),
    QueryDef(
      "dedup_qa_report_staged",
      (s, dir) => dedupQaReportStaged(s, dir),
      Some(Dedup.dedupQaReportSql)),
  )
}
