package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed plan-audit artifact (PLANS.txt, written by
  * `runMain graft.Explain`) to the query registry: every registered
  * query must have a plan section, no stale sections may linger, and no
  * section may be a failed explain. Round 4 shipped a 97-plan PLANS.txt
  * against a 101-query registry and nothing noticed — this spec is the
  * guard that makes that gap loud.
  *
  * Pure file check, no SparkSession: sbt forks tests with the repo root
  * as the working directory, where PLANS.txt lives.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val plans: String = {
    val p = java.nio.file.Paths.get("PLANS.txt")
    assert(java.nio.file.Files.exists(p),
      "PLANS.txt missing — run: sbt \"runMain graft.Explain /root/testdata/sf0.001 PLANS.txt\"")
    java.nio.file.Files.readString(p)
  }

  private lazy val sectionKeys: Set[String] =
    "(?m)^== (\\S+)$".r.findAllMatchIn(plans).map(_.group(1)).toSet

  test("PLANS.txt section keys == registry keys") {
    val registry = SparkEntry.queries.keySet
    val missing = registry -- sectionKeys
    val stale = sectionKeys -- registry
    assert(missing.isEmpty && stale.isEmpty,
      s"re-run graft.Explain — missing plans: ${missing.toSeq.sorted.mkString(",")}; " +
        s"stale plans: ${stale.toSeq.sorted.mkString(",")}")
  }

  test("no plan section is a failed explain") {
    assert(!plans.contains("EXPLAIN FAILED"),
      "PLANS.txt contains EXPLAIN FAILED sections — fix the query or the fixture dir and re-run graft.Explain")
  }

  /** section = everything from "== <key>" to the next bare key header.
    * The keyed regex deliberately excludes "== Physical Plan ==" (trailing
    * marker), so a section spans its whole explain output — a raw
    * `split("(?m)^== ")` would truncate every section two lines in, at its
    * own Physical Plan header (the round-17 staged-QA test bug).
    */
  private def parseSections(text: String): Map[String, String] = {
    val keyRe = "(?m)^== ([a-z0-9_]+)$".r
    val ms = keyRe.findAllMatchIn(text).toSeq
    ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.size) ms(i + 1).start else text.length
      m.group(1) -> text.substring(m.end, end)
    }.toMap
  }

  private lazy val sections: Map[String, String] = parseSections(plans)

  test("staged ANN searches carry no Lloyd training lineage; inline twins do") {
    // the entire point of AnnIndex: train once at staging time, serve
    // every search from the store. Training's fingerprints in a formatted
    // plan are the floor(v·10⁶) quantized-mean constant and the
    // ObjectHashAggregate that assembles centroid/codebook arrays —
    // neither may appear in a staged search plan (the only 10⁶-free
    // constant there is the ADC table's 10⁹ quantizer). The inline gate
    // twins must KEEP the lineage: they are the self-contained shapes the
    // oracle retrains against.
    val lloydMarks = Seq("1000000.0", "ObjectHashAggregate")
    for (k <- Seq("knn_ivf_staged", "pq_knn_staged", "pq_knn_rerank_staged",
                  "pq_recon_error", "ivf_cell_stats", "semdedup_pairs",
                  "ivfpq_knn_staged", "ivfpq_recon_error", "ivfpq_knn_rerank_staged",
                  "knn_ivf_staged_incr", "pq_knn_staged_incr",
                  "ivf_drift_report_staged", "ann_recall_report",
                  "knn_ivf_auto_staged", "semdedup_auto_staged",
                  "hard_negatives_staged");
         m <- lloydMarks)
      assert(!sections(k).contains(m),
        s"$k plan contains training lineage '$m' — staged search must read the store only")
    for (k <- Seq("knn_ivf", "knn_ivf_auto", "knn_ivf_incremental", "pq_knn", "pq_codes",
                  "pq_codes_incremental", "ivfpq_knn", "ivf_drift_report", "semdedup_auto"))
      assert(lloydMarks.forall(sections(k).contains),
        s"$k (inline oracle twin) lost its training lineage — did it silently switch to the store?")
  }

  test("staged signature serves carry no text lineage; inline minhash twins do") {
    // the SigIndex contract: signature derivation runs at staging time
    // only — a serve plan reading the store must never re-derive
    // signatures from document text. Since r16 the from-text signing
    // path is the compiled row-local expression, so its plan fingerprint
    // is `minhash_slices(` (the pre-r16 explode+min composition's
    // `md5(cast(substring` died with the rewrite — same fingerprint
    // migration as the r14 LSH banding expression).
    val sigMark = "minhash_slices("
    for (k <- Seq("dedup_minhash_staged", "dedup_minhash_est_staged",
                  "dedup_clusters_staged", "doc_pagerank_staged", "split_leakage_staged",
                  "dedup_pipeline_staged"))
      assert(!sections(k).contains(sigMark),
        s"$k plan re-computes signatures — staged serve must read the store only")
    // dedup_clusters is absent from this list deliberately: its component
    // labels localCheckpoint eagerly, severing the explained plan's
    // lineage above the final join — the mark cannot appear either way
    for (k <- Seq("dedup_minhash", "dedup_minhash_est",
                  "doc_pagerank", "split_leakage"))
      assert(sections(k).contains(sigMark),
        s"$k (inline oracle twin) lost its signature lineage — did it silently switch to the store?")
    // positive direction: every staged serve must actually SCAN its
    // store (the fingerprint prefix appears in the plan's file
    // locations); inline twins must not. Since the r16 pairs artifact,
    // the pair CONSUMERS read the clusters store's stored pair list
    // (the band self-join runs once per revision, at staging):
    // dedup_minhash_staged / doc_pagerank_staged / split_leakage_staged
    // read graft_clusters_ only; the est serve additionally scores off
    // the signature table (graft_sig_). dedup_incremental_staged signs
    // the NEW batch inline by design (that is the per-batch cost a live
    // ingest pays) and joins the signature store.
    for (k <- Seq("dedup_minhash_staged", "dedup_minhash_est_staged",
                  "doc_pagerank_staged", "split_leakage_staged"))
      assert(sections(k).contains("graft_clusters_"),
        s"$k plan does not read the staged pair list")
    for (k <- Seq("dedup_minhash_est_staged", "dedup_incremental_staged"))
      assert(sections(k).contains("graft_sig_"),
        s"$k plan does not read the signature store")
    for (k <- Seq("dedup_minhash_staged", "doc_pagerank_staged", "split_leakage_staged"))
      assert(!sections(k).contains("graft_sig_"),
        s"$k plan still re-derives pairs from the band index — it must read the stored pair list")
    for (k <- Seq("dedup_minhash", "dedup_minhash_est", "doc_pagerank",
                  "split_leakage", "dedup_pipeline", "dedup_incremental"))
      assert(!sections(k).contains("graft_sig_"),
        s"$k (inline oracle twin) reads the store — it must stay self-contained")
  }

  test("staged shingle serves carry no text lineage; inline n-gram twins do") {
    // the shingle-store contract (SigIndex.stageShingles): the distinct
    // stride-sampled shingles are derived from document text ONCE at
    // staging time — a serve plan must read stored (doc_id, sh) rows,
    // never re-run the substring explode. The shingle derivation's
    // fingerprint in a formatted plan is `substring(text`.
    val textMark = "substring(text"
    for (k <- Seq("dedup_ngram_staged", "dedup_containment_staged",
                  "dedup_qa_report_staged")) {
      assert(!sections(k).contains(textMark),
        s"$k plan re-shingles document text — staged serve must read the store only")
      assert(sections(k).contains("graft_shingle_"),
        s"$k plan does not read the shingle store")
    }
    // the fully-staged QA report serves BOTH sides from storage:
    // candidates from the minhash band index, truth from the shingle store
    assert(sections("dedup_qa_report_staged").contains("graft_sig_"),
      "dedup_qa_report_staged must take its LSH candidates from the signature store")
    assert(!sections("dedup_qa_report_staged").contains("md5(cast(substring"),
      "dedup_qa_report_staged must not re-compute minhash signatures")
    for (k <- Seq("dedup_ngram", "dedup_containment", "dedup_qa_report")) {
      assert(sections(k).contains(textMark),
        s"$k (inline oracle twin) lost its shingle lineage — did it silently switch to the store?")
      assert(!sections(k).contains("graft_shingle_"),
        s"$k (inline oracle twin) reads the store — it must stay self-contained")
    }
    // the embedding bucket store: hyperplane banding — whose plan
    // fingerprint since round 14 is the compiled `vector_sign_bands`
    // expression (the old dim-guard raise_error message lived in the
    // inlined per-plane projection that expression replaced) — runs at
    // staging time only; the serve reads stored buckets + the embedding
    // table
    val planeMark = "vector_sign_bands"
    assert(sections("dedup_embedding_lsh_auto_staged").contains("graft_vlsh_"),
      "dedup_embedding_lsh_auto_staged plan does not read the bucket store")
    assert(!sections("dedup_embedding_lsh_auto_staged").contains(planeMark),
      "dedup_embedding_lsh_auto_staged plan re-computes hyperplane bands — staged serve must read the store only")
    assert(sections("dedup_embedding_lsh_auto").contains(planeMark),
      "dedup_embedding_lsh_auto (inline oracle twin) lost its banding lineage — did it silently switch to the store?")
    assert(!sections("dedup_embedding_lsh_auto").contains("graft_vlsh_"),
      "dedup_embedding_lsh_auto (inline oracle twin) reads the store — it must stay self-contained")
    // the BM25 postings store: the serve must read the term-sorted store
    // with the query-term In-filter PUSHED INTO the scan (that pushdown
    // is what makes retrieval a row-group read, not a corpus pass), and
    // must never re-tokenize documents; the inline twin keeps the
    // tokenization and never touches the store
    assert(sections("bm25_topk_staged").contains("graft_bm25_"),
      "bm25_topk_staged plan does not read the postings store")
    assert(sections("bm25_topk_staged").contains("PushedFilters: [In(term"),
      "bm25_topk_staged query-term filter is not pushed into the postings scan")
    assert(!sections("bm25_topk_staged").contains("split(text"),
      "bm25_topk_staged plan re-tokenizes document text — staged serve must read the store only")
    assert(sections("bm25_topk").contains("split(text"),
      "bm25_topk (inline oracle twin) lost its tokenization lineage — did it silently switch to the store?")
    assert(!sections("bm25_topk").contains("graft_bm25_"),
      "bm25_topk (inline oracle twin) reads the store — it must stay self-contained")
  }

  test("funnel_steps is one declarative plan, every shuffle keyed on user_id") {
    // funnel used to run per-step driver count()s and explain as a bare
    // LocalTableScan — unauditable. Now it is a single union-of-aggregates
    // plan: each step's first-hit table aggregates and joins on user_id,
    // so ONE hash partitioning carries the whole chain; per-step
    // event_type predicates must reach the parquet scan.
    val s = sections("funnel_steps")
    assert(!s.contains("LocalTableScan"),
      "funnel must be a distributed plan, not a driver-computed local result")
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"),
      "step gating must stay an equi-join")
    val parts = "hashpartitioning\\(([A-Za-z_0-9]+#)".r.findAllMatchIn(s).map(_.group(1)).toSet
    assert(parts.nonEmpty && parts.forall(_.startsWith("user_id#")),
      s"funnel shuffles on non-user_id keys: $parts")
    for (t <- Seq("view", "click", "purchase"))
      assert(s.contains(s"EqualTo(event_type,$t)"),
        s"step filter for '$t' must push into the parquet scan")
  }

  test("no scale-killer strategies in ANY plans artifact: CartesianProduct and " +
      "single-partition exchanges only where semantics are global") {
    // The hand audit the round-13 verdict ran, locked in as a spec: a
    // CartesianProduct evaluates every partition PAIR (quadratic tasks),
    // and an Exchange SinglePartition funnels the stage through one task
    // — either one appearing in a new query at any recorded scale is a
    // regression unless the operator's SEMANTICS are global.
    //
    // CartesianProduct allowlist: the deliberately-registered exact
    // all-pairs oracle baselines ONLY (vector pairs with a non-equi
    // cosine-threshold condition; gate-scale correctness anchors,
    // config-skipped by Bench at scale). Everything else — including
    // every report/profile — must stay broadcast or equi-join.
    val cartesianOk = Set("dedup_embedding", "embedding_dedup_qa")
    // SinglePartition allowlist: ops whose CONTRACT is one global result
    // or one global ordering — global-window emulations of the
    // reference's parallelism-1 AllWindowed streams (count_window,
    // session_count), global-scalar aggregates and TPC-H scalar
    // subqueries (coprocess_ratio, funnel_steps, q6/q11/q14/q15/q17/
    // q19/q22, corpus-constant aggregates in bm25/tfidf/token stats),
    // one-row QA/profile reports, and global curriculum/rank orderings.
    // contamination_bloom joined in r19: its corpus Bloom bitset is ONE
    // global 64-long row (bit_or over one packed row per benchmark doc,
    // partial-aggregated map-side — the single partition receives only
    // per-task partials), the definitional corpus-constant aggregate;
    // contamination_check shares the same broadcast bitset since its
    // bloom-prefilter rewrite.
    // semdedup_auto joined with it: above HierAssignMinCells its
    // assignment takes the hierarchical path, whose branch-table attach
    // is the same √cells→1-row collect_list that already puts
    // knn_ivf_auto on this list. The PQ inline twins joined when
    // pqAssign switched to the compiled row-local scan: the whole
    // codebook (numSub × numCodes = 128 rows) collapses to ONE sorted
    // broadcast array row — the definitional constant-size
    // broadcast-attach aggregate.
    val singlePartOk = Set(
      "ann_recall_report", "bm25_topk", "cms_counters", "contamination_bloom",
      "contamination_check", "coprocess_ratio", "semdedup_auto",
      "pq_codes", "pq_codes_incremental", "pq_knn", "pq_knn_rerank", "ivfpq_knn",
      "count_window", "curriculum_order", "dedup_qa_report",
      "dedup_qa_report_staged", "embedding_dedup_qa", "funnel_steps",
      "key_skew_profile", "knn_ivf_auto", "mrl_recall", "packing_stats",
      "pq_knn_rerank", "q11_important_parts", "q14_promo",
      "q15_top_supplier", "q17_small_qty", "q19_disjunct",
      "q22_idle_custs", "q6_forecast", "quality_token_budget",
      "session_count", "stratified_sample", "tfidf_top_terms",
      "token_rarity", "token_surprisal")
    val keyRe = "(?m)^== ([a-z0-9_]+)$".r
    // present artifacts are all checked FIRST; a missing one then cancels
    // (assume) rather than silently passing — a deleted/never-generated
    // artifact must surface as a skip, not disable the tripwire (ADVICE r15)
    val missing = scala.collection.mutable.ListBuffer.empty[String]
    for (name <- Seq("PLANS.txt", "PLANS_sf1.txt", "PLANS_sf10.txt", "PLANS_sf100.txt")) {
      val p = java.nio.file.Paths.get(name)
      if (!java.nio.file.Files.exists(p)) missing += name
      else {
        val txt = java.nio.file.Files.readString(p)
        val ms = keyRe.findAllMatchIn(txt).toSeq
        val secs = ms.zipWithIndex.map { case (m, i) =>
          val end = if (i + 1 < ms.size) ms(i + 1).start else txt.length
          m.group(1) -> txt.substring(m.end, end)
        }
        val cartesianBad = secs.collect {
          case (k, s) if s.contains("CartesianProduct") && !cartesianOk(k) => k }
        assert(cartesianBad.isEmpty,
          s"$name: CartesianProduct outside the exact all-pairs baselines: " +
            cartesianBad.distinct.sorted.mkString(","))
        // match single-partition EXCHANGES only (an `(N) Exchange` node
        // whose Arguments line is SinglePartition) — a `Scan ExistingRDD`
        // whose stored partitioning happens to be single (the CC
        // endgame's one-task union-find output, by design) is a scan
        // property, not a stage funnel: the join above it immediately
        // re-exchanges to hash partitioning
        val singleExchange =
          "(?m)^\\(\\d+\\) Exchange\\s*\\n(?:(?!^\\(\\d).*\\n)*?^Arguments: SinglePartition".r
        val singleBad = secs.collect {
          case (k, s) if singleExchange.findFirstIn(s).isDefined && !singlePartOk(k) => k }
        assert(singleBad.isEmpty,
          s"$name: single-partition exchange in a non-global-semantics op: " +
            singleBad.distinct.sorted.mkString(","))
      }
    }
    assume(missing.isEmpty,
      s"plan artifacts absent, census skipped for: ${missing.mkString(",")}")
  }

  test("PLANS_sf1.txt (when present) also covers the registry with no failed explains") {
    // the at-scale audit artifact, regenerated on demand against the
    // ScaleUp-built data/sf1 — optional because that dataset is not
    // committed, but when the artifact exists it must not drift
    val p = java.nio.file.Paths.get("PLANS_sf1.txt")
    assume(java.nio.file.Files.exists(p), "PLANS_sf1.txt not present — skipping")
    val sf1 = java.nio.file.Files.readString(p)
    val keys = "(?m)^== (\\S+)$".r.findAllMatchIn(sf1).map(_.group(1)).toSet
    assert(keys === SparkEntry.queries.keySet && !sf1.contains("EXPLAIN FAILED"),
      "PLANS_sf1.txt drifted from the registry — re-run graft.ScaleUp + graft.Explain data/sf1 PLANS_sf1.txt")
  }

  test("PLANS_sf10.txt (when present) covers the registry; strategy selection degrades with scale") {
    // third-decade audit artifact (data/sf10 via graft.ScaleUp ×100).
    // Beyond registry coverage it pins the de-hinting CONTRACT: with
    // broadcast hints restricted to fixed-cardinality frames, growing
    // sides must shift from broadcast to SHUFFLE joins as data scales.
    // "Shuffle join" counts SortMergeJoin AND ShuffledHashJoin: the
    // runners prefer the hash build when broadcast is off the table
    // (RunnerSession, preferSortMergeJoin=false — the round-14 SHJ
    // adoption, q9 73.0 vs 99.8 s at sf100), so which of the two a plan
    // shows is a cost choice, not the de-hinting contract under test.
    val p = java.nio.file.Paths.get("PLANS_sf10.txt")
    assume(java.nio.file.Files.exists(p), "PLANS_sf10.txt not present — skipping")
    val sf10 = java.nio.file.Files.readString(p)
    val keys = "(?m)^== (\\S+)$".r.findAllMatchIn(sf10).map(_.group(1)).toSet
    assert(keys === SparkEntry.queries.keySet && !sf10.contains("EXPLAIN FAILED"),
      "PLANS_sf10.txt drifted from the registry — re-run graft.ScaleUp ×100 + graft.Explain data/sf10 PLANS_sf10.txt")
    val tiny = java.nio.file.Files.readString(java.nio.file.Paths.get("PLANS.txt"))
    def cnt(s: String, m: String) = m.r.findAllMatchIn(s).size
    def shuffleJoins(s: String) = cnt(s, "SortMergeJoin") + cnt(s, "ShuffledHashJoin")
    assert(shuffleJoins(sf10) > shuffleJoins(tiny),
      "sf10 plans should carry MORE shuffle joins than gate-scale plans")
    assert(cnt(sf10, "BroadcastHashJoin") < cnt(tiny, "BroadcastHashJoin"),
      "sf10 plans should carry FEWER broadcast joins than gate-scale plans")
  }

  test("PLANS_sf100.txt (when present) covers the registry; degradation continues a fourth decade") {
    // fourth-decade audit artifact (data/sf100 via graft.ScaleUp ×1000).
    // Beyond the sf10 assertions, the decade's signature is the
    // LOST-BROADCAST CLIFF: part (20 M rows) and supplier (1 M) cross
    // the broadcast threshold, so the census must degrade FURTHER than
    // sf10's — strictly more shuffle joins, strictly fewer broadcasts.
    val p = java.nio.file.Paths.get("PLANS_sf100.txt")
    assume(java.nio.file.Files.exists(p), "PLANS_sf100.txt not present — skipping")
    val sf100 = java.nio.file.Files.readString(p)
    val keys = "(?m)^== (\\S+)$".r.findAllMatchIn(sf100).map(_.group(1)).toSet
    assert(keys === SparkEntry.queries.keySet && !sf100.contains("EXPLAIN FAILED"),
      "PLANS_sf100.txt drifted from the registry — re-run graft.ScaleUp ×1000 + graft.Explain data/sf100 PLANS_sf100.txt")
    def cnt(s: String, m: String) = m.r.findAllMatchIn(s).size
    def shuffleJoins(s: String) = cnt(s, "SortMergeJoin") + cnt(s, "ShuffledHashJoin")
    val sf10p = java.nio.file.Paths.get("PLANS_sf10.txt")
    assume(java.nio.file.Files.exists(sf10p), "PLANS_sf10.txt not present — skipping")
    val sf10 = java.nio.file.Files.readString(sf10p)
    assert(shuffleJoins(sf100) > shuffleJoins(sf10),
      "sf100 plans should carry MORE shuffle joins than sf10 plans")
    assert(cnt(sf100, "BroadcastHashJoin") < cnt(sf10, "BroadcastHashJoin"),
      "sf100 plans should carry FEWER broadcast joins than sf10 plans")
  }

  test("staged QA report reads only hash-slice-filtered store partitions at scale") {
    // VERDICT r16 item 6: the sampled presets are the production audit;
    // the staged QA plan's exact-truth side is self-bounded by the
    // round-12 doc-slice filter (pmod(xxhash64(doc_id), n/500) = 0) on
    // BOTH stored sides — the band index (minhashPairsStaged) and the
    // shingle store (storedShingles). A refactor that drops either
    // filter silently reintroduces a full-corpus exact pass that spills
    // >50 GB at sf100; this fingerprint makes that a red suite. The
    // filter only exists above 500 docs (mod = 1 at the gate scale by
    // design — PLANS.txt is exempt), so the pin runs against every
    // present at-scale artifact. Downstream InMemoryTableScan nodes
    // legitimately read unfiltered CACHED frames; the slice contract is
    // about the store-facing Filter conditions, identified by the band
    // and shingle columns they guard.
    def sliceConds(section: String): Seq[String] = section.linesIterator
      .filter(l => l.contains("Condition :") && l.contains("pmod(xxhash64(doc_id")).toSeq
    for (name <- Seq("PLANS_sf1.txt", "PLANS_sf10.txt", "PLANS_sf100.txt")) {
      val p = java.nio.file.Paths.get(name)
      if (java.nio.file.Files.exists(p)) {
        val text = java.nio.file.Files.readString(p)
        val section = parseSections(text).getOrElse("dedup_qa_report_staged",
          fail(s"$name has no dedup_qa_report_staged section"))
        val conds = sliceConds(section)
        assert(conds.exists(_.contains("(band#")),
          s"$name: staged QA plan lost the doc-slice filter on the BAND INDEX side — " +
            "the full-corpus minhash pair pass is back")
        assert(conds.exists(_.contains("(sh#")),
          s"$name: staged QA plan lost the doc-slice filter on the SHINGLE STORE side — " +
            "the full-corpus exact-truth pass is back")
        // prove the guard guards: THE REAL ASSERTIONS (band/sh membership
        // over sliceConds) must fail on a degraded artifact. The strip
        // predicate is deliberately LOOSER than sliceConds' own (any
        // doc-slice mention, not just Condition lines), so this is not
        // `f(x -- f's matches) is empty` by construction (ADVICE r18):
        // a sliceConds that matched, say, section headers would survive
        // the strip and turn this self-check red
        val stripped = section.linesIterator
          .filterNot(_.contains("pmod(xxhash64(doc_id"))
          .mkString("\n")
        val strippedConds = sliceConds(stripped)
        assert(!strippedConds.exists(_.contains("(band#")) &&
          !strippedConds.exists(_.contains("(sh#")),
          s"$name: tripwire self-check failed — the band/shingle guard " +
            "still passes on a slice-filter-stripped artifact")
      }
    }
  }

  test("artifact freshness tripwire: registered rewrites fingerprint every plans artifact") {
    // Round 14 failed its own suite on STALE artifacts: the code fixed a
    // CartesianProduct hazard but three of the four PLANS files were
    // never regenerated, so the committed evidence contradicted HEAD for
    // a full round. This test pins a plan-shape fingerprint for each
    // registered rewrite, so a code/artifact drift fails the suite in
    // the session that introduces it:
    //  - resample_locf is the lead-range LOCF form (map-side
    //    `sequence(`-exploded grid, NO Union of scans);
    //  - LSH banding is the compiled `vector_sign_bands` expression
    //    (the inlined per-plane projection ran interpreted past the JIT
    //    method limit — 597 vs 56.7 s at sf100);
    //  - key_skew_profile pins its 1-row rank-pick frames with
    //    `broadcast()` → BroadcastNestedLoopJoin, never CartesianProduct
    //    (also covered by the scale-killer census above);
    //  - the clusters/pipeline staged serves READ the staged cluster map
    //    (graft_clusters_*) instead of recomputing components per serve.
    val keyRe = "(?m)^== ([a-z0-9_]+)$".r
    // present artifacts checked first, then missing ones surface as a
    // cancel instead of a silent pass (ADVICE r15 — same shape as the
    // census test above)
    val missing = scala.collection.mutable.ListBuffer.empty[String]
    for (name <- Seq("PLANS.txt", "PLANS_sf1.txt", "PLANS_sf10.txt", "PLANS_sf100.txt")) {
      val p = java.nio.file.Paths.get(name)
      if (!java.nio.file.Files.exists(p)) missing += name
      else {
        val txt = java.nio.file.Files.readString(p)
        val ms = keyRe.findAllMatchIn(txt).toSeq
        val secs = ms.zipWithIndex.map { case (m, i) =>
          val end = if (i + 1 < ms.size) ms(i + 1).start else txt.length
          m.group(1) -> txt.substring(m.end, end)
        }.toMap
        assert(secs("resample_locf").contains("sequence("),
          s"$name: resample_locf lost the lead-range grid (`sequence(`) — stale artifact or regressed rewrite")
        assert(!secs("resample_locf").contains("Union"),
          s"$name: resample_locf shows the old union-of-scans plan — stale artifact or regressed rewrite")
        assert(txt.contains("vector_sign_bands"),
          s"$name: no plan uses the compiled vector_sign_bands banding expression — stale artifact or regressed rewrite")
        assert(secs("key_skew_profile").contains("BroadcastNestedLoopJoin"),
          s"$name: key_skew_profile rank-pick frames are not broadcast-pinned — stale artifact or regressed hint")
        for (k <- Seq("dedup_clusters_staged", "dedup_pipeline_staged"))
          assert(secs(k).contains("graft_clusters_"),
            s"$name: $k does not read the staged cluster map — stale artifact or regressed serve")
        // r16: from-text signing is the compiled row-local minhash_slices
        // expression (the explode+min composition shuffled ~250 M shingle
        // rows at sf100 — 31.7 of the 33 s incremental serve); the pair
        // CONSUMERS read the stored pair list instead of re-banding
        assert(secs("dedup_minhash").contains("minhash_slices("),
          s"$name: dedup_minhash lost the compiled row-local signing expression — stale artifact or regressed rewrite")
        for (k <- Seq("dedup_minhash_staged", "doc_pagerank_staged", "split_leakage_staged"))
          assert(secs(k).contains("graft_clusters_"),
            s"$name: $k does not read the staged pair list — stale artifact or regressed serve")
      }
    }
    assume(missing.isEmpty,
      s"plan artifacts absent, fingerprints skipped for: ${missing.mkString(",")}")
  }
}
