package graft

import graft.functions.Stores

/** The staged-store layout protocol ([[graft.functions.Stores]]) that
  * every index family shares: fingerprinted paths and the
  * completion-marker build-once contract — including the crash paths
  * (interrupted build, failing build) that production staging must
  * self-heal from.
  */
class StoresSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path(
    spark.conf.get("spark.sql.warehouse.dir"))
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("storePath fingerprints by corpus dir, kind, and geometry — and only by them") {
    val a = Stores.storePath(spark, "/data/corpA", "sig", "h8b2_r1")
    assert(a === Stores.storePath(spark, "/data/corpA", "sig", "h8b2_r1"),
      "same inputs must resolve to the same store")
    assert(a !== Stores.storePath(spark, "/data/corpB", "sig", "h8b2_r1"),
      "a different corpus dir must resolve to a different store")
    assert(a !== Stores.storePath(spark, "/data/corpA", "ann", "h8b2_r1"),
      "a different store kind must resolve to a different store")
    assert(a !== Stores.storePath(spark, "/data/corpA", "sig", "h8b2_r2"),
      "a geometry/layout revision drift must resolve to a different store")
    assert(a.getName === s"graft_sig_${Stores.dirTag("/data/corpA")}_h8b2_r1")
  }

  test("buildOnce: builds cold, skips on marker, and self-heals partial or failed builds") {
    val base = Stores.storePath(spark, "/tmp/stores-spec-corpus", "test", "g1_r1")
    if (fs.exists(base)) fs.delete(base, true)
    var builds = 0
    def build(): String = Stores.buildOnce(spark, base, "_TEST_OK") { b =>
      builds += 1
      fs.create(new org.apache.hadoop.fs.Path(b, "artifact")).close()
    }
    // cold: builds once, marker written AFTER the artifact
    assert(build() === base.toString && builds === 1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(base, "artifact")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(base, "_TEST_OK")))
    // warm: the marker short-circuits — no rebuild
    build()
    assert(builds === 1, "a marker-valid store must not rebuild")

    // interrupted build: directory exists, marker absent (the crash
    // window) — plus stale garbage that a correct rebuild must remove
    fs.delete(new org.apache.hadoop.fs.Path(base, "_TEST_OK"), false)
    fs.create(new org.apache.hadoop.fs.Path(base, "stale_partial_file")).close()
    build()
    assert(builds === 2, "a marker-less partial directory must rebuild")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "stale_partial_file")),
      "rebuild must wipe the partial directory, not layer on top of it")
    assert(fs.exists(new org.apache.hadoop.fs.Path(base, "_TEST_OK")))

    // failing build: no marker lands, so the NEXT call tries again
    fs.delete(base, true)
    intercept[RuntimeException] {
      Stores.buildOnce(spark, base, "_TEST_OK")(_ => throw new RuntimeException("boom"))
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(base, "_TEST_OK")),
      "a failed build must not leave a completion marker")
    assert(build() === base.toString && builds === 3,
      "the store must rebuild after a failed attempt")
    fs.delete(base, true)
  }
}
