package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.QueryDef
import graft.functions.{AnnIndex, Curation, Dedup, IvfPq, SigIndex, Similarity, TextAnalysis}
import graft.operators.{Extended, KeyedAggs, MultiStream, Relational, Scale, Stateless, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family registers its qkeys as [[graft.engine.QueryDef]]s;
  * this object is just the aggregation point. Column names are aliased
  * identically in the Spark builders and the DuckDB oracle SQL (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    Stateless.defs ++ KeyedAggs.defs ++ Windows.defs ++ MultiStream.defs ++
      Relational.defs ++ Extended.defs ++ TextAnalysis.defs ++ Dedup.defs ++
      SigIndex.defs ++
      Similarity.defs ++ AnnIndex.defs ++ IvfPq.defs ++ Scale.defs ++
      graft.multimodal.Multimodal.defs ++ Curation.defs

  require(allDefs.map(_.key).distinct.size == allDefs.size, "duplicate qkeys")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("tumbling_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.key -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Exactly ONE key is deliberately omitted —
    * `dedup_simhash`, whose xxhash64 token fingerprints have no DuckDB
    * counterpart → the driver records a weaker rows-only check
    * (`err: no_oracle` in CORRECTNESS_r*.json is expected for it, and
    * only it). Its semantics are still oracle-gated through two
    * hash-green twins: `dedup_simhash_md5` (same fixed 4×16 geometry,
    * md5 slices) and `dedup_simhash_auto` (geometry-independent exact
    * hamming≤3), plus the spec pinning the xxhash64 pair set against the
    * md5 twin (DedupSimilaritySpec).
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(k, _, Some(sql)) => k -> sql }.toMap
}
