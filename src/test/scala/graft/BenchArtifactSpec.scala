package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwires over the committed bench evidence in `bench_out/` — the
  * bench-side twin of PlanAuditSpec's PLANS freshness checks (VERDICT
  * r15 item 3). Two failure classes actually happened in round 15 and
  * both would have been a red suite under these tests:
  *
  *  - `bench_sf100.json` was committed with 155 of 173 queries in its
  *    `failed` list (an ENOSPC cascade) — a mass-failure run presented
  *    as evidence. Rule: every committed artifact has `failed: []`.
  *  - `bench_sf0.1.json` was clobbered by a 2-query SPARK_GRAFT_ONLY
  *    dev run (Bench now suffixes dev runs `_dev`, and `_dev` files are
  *    gitignored AND exempt here). Rule: a full-registry artifact must
  *    cover the registry — `queries + skipped >= SparkEntry.queries.size`
  *    — so a subset scrap can never pass as full-registry evidence, and
  *    a grown registry flags stale artifacts for regeneration.
  *
  * Family artifacts (`bench_<sf>_<family>.json`, e.g. `_tpch`,
  * `_events`, `_staged`) are deliberately partial: they get the
  * failed-empty rule but not the coverage rule.
  */
class BenchArtifactSpec extends AnyFunSuite {

  private val dir = java.nio.file.Paths.get("bench_out")

  /** Committed artifacts: every bench_*.json except the gitignored
    * `_dev` scraps.
    */
  private def artifacts(): Seq[java.nio.file.Path] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Seq.empty
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("bench_") && n.endsWith(".json") && !n.endsWith("_dev.json")
        }
        .sortBy(_.getFileName.toString)
    } finally s.close()
  }

  // Bench.scala emits one flat machine-generated JSON line; these
  // extractors parse exactly that shape (string-keyed arrays/objects,
  // no nesting inside the extracted spans) — no JSON library on the
  // classpath, and pulling one in for our own fixed format would be a
  // heavier dependency than the format warrants. If the format ever
  // gains nesting (per-query objects, names with commas), the
  // scan-to-first-close extraction would silently UNDERCOUNT — weakening
  // exactly the coverage guarantee this spec enforces — so each span is
  // required flat: a format change turns the suite red, not quietly
  // wrong (ADVICE r16).
  private def flatSpan(body: String, what: String): String = {
    require(!body.exists(c => c == '{' || c == '['),
      s"$what span contains nesting — Bench's JSON format changed; update these extractors")
    body
  }

  private def stringArray(json: String, field: String): Seq[String] = {
    val start = json.indexOf("\"" + field + "\":[")
    require(start >= 0, s"artifact has no $field array")
    val open = json.indexOf('[', start)
    val close = json.indexOf(']', open)
    val body = flatSpan(json.substring(open + 1, close).trim, s"$field array")
    if (body.isEmpty) Seq.empty
    else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  private def queryCount(json: String): Int = {
    val start = json.indexOf("\"queries\":{")
    require(start >= 0, "artifact has no queries object")
    val open = json.indexOf('{', start)
    val close = json.indexOf('}', open)
    val body = flatSpan(json.substring(open + 1, close).trim, "queries object")
    if (body.isEmpty) 0 else body.split(",").length
  }

  private def isFullRegistry(name: String): Boolean =
    name.matches("bench_sf[0-9.]+\\.json")

  test("every committed bench artifact has an empty failed list") {
    val offenders = artifacts().flatMap { p =>
      val failed = stringArray(java.nio.file.Files.readString(p), "failed")
      if (failed.nonEmpty)
        Some(s"${p.getFileName}: ${failed.size} failed (${failed.take(5).mkString(", ")}…)")
      else None
    }
    assert(offenders.isEmpty,
      s"mass-failure runs committed as evidence — re-run and replace: ${offenders.mkString("; ")}")
  }

  test("full-registry bench artifacts cover the whole registry (queries + skipped)") {
    val registry = SparkEntry.queries.size
    val fulls = artifacts().filter(p => isFullRegistry(p.getFileName.toString))
    val offenders = fulls.flatMap { p =>
      val json = java.nio.file.Files.readString(p)
      val covered = queryCount(json) + stringArray(json, "skipped").size
      if (covered < registry)
        Some(s"${p.getFileName}: $covered of $registry qkeys — subset scrap or stale registry")
      else None
    }
    assert(offenders.isEmpty,
      s"full-registry artifacts with partial coverage — regenerate via graft.Bench: ${offenders.mkString("; ")}")
  }

  test("the driver-scale artifact bench_sf0.1.json is present") {
    // The one artifact that is ALWAYS committed (the driver benches at
    // sf0.1 every round) — its absence means the evidence chain broke,
    // not that a scale decade wasn't exercised this round.
    assert(java.nio.file.Files.exists(dir.resolve("bench_sf0.1.json")),
      "bench_out/bench_sf0.1.json missing — the committed full-registry evidence is gone")
  }

  test("every generated scale decade has a committed full-registry artifact") {
    // The round-16 failure mode this closes (VERDICT r16 item 2): the
    // docs claimed a committed bench_sf100.json that did not exist —
    // the empty-failed and coverage rules above only validate files
    // that ARE there, so a claimed-but-missing artifact passed silently
    // two rounds running. The manifest is derived, not hand-listed:
    // every sf* dir under data/ (the generated decades) must have its
    // full-registry bench_<sf>.json in bench_out/, alongside the two
    // driver-scale artifacts. Deleting an artifact without replacing it
    // — or generating a new decade without benching it — reds the suite
    // the session it happens.
    val dataDir = java.nio.file.Paths.get("data")
    val decadeDirs: Seq[String] =
      if (!java.nio.file.Files.isDirectory(dataDir)) Seq.empty
      else {
        val s = java.nio.file.Files.list(dataDir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq
            .filter(p => java.nio.file.Files.isDirectory(p) &&
              p.getFileName.toString.matches("sf[0-9.]+"))
            .map(_.getFileName.toString)
        } finally s.close()
      }
    val required = Seq("sf0.001", "sf0.1") ++ decadeDirs.sorted
    val missing = required.map(sf => s"bench_$sf.json")
      .filterNot(n => java.nio.file.Files.exists(dir.resolve(n)))
    assert(missing.isEmpty,
      s"claimed/expected full-registry artifacts missing from bench_out/ — " +
        s"run graft.Bench at each scale and commit: ${missing.mkString(", ")}")
  }
}
