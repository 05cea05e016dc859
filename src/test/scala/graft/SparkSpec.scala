package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  /** Offset seconds from the reference's serverStartTime
    * (reference: WindowFunctions.scala:21 — 2022-02-02T00:00:00Z).
    */
  def at(offsetSec: Double): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.Instant.parse("2022-02-02T00:00:00Z").plusMillis((offsetSec * 1000).toLong))
}

/** The reference's canonical deterministic fixture: 12 gaming events —
  * 6 PlayerRegistered + 6 PlayerOnline at offsets 2-10 s
  * (reference: WindowFunctions.scala:24-37; expected 3 s tumbling
  * registration counts [0,3)→1, [3,6)→3, [6,9)→2 per the discussion at
  * :51-52).
  */
object GamingFixture {
  case class ServerEvent(event_time: java.sql.Timestamp, event_type: String, player_id: String)

  val base: java.time.Instant = java.time.Instant.parse("2022-02-02T00:00:00Z")

  private def t(off: Long) = java.sql.Timestamp.from(base.plusSeconds(off))

  // (offset, type, player) — reference: WindowFunctions.scala:24-37
  val events: Seq[ServerEvent] = Seq(
    ServerEvent(t(2), "PlayerRegistered", "bob"),
    ServerEvent(t(3), "PlayerRegistered", "sam"),
    ServerEvent(t(4), "PlayerRegistered", "rob"),
    ServerEvent(t(4), "PlayerRegistered", "alice"),
    ServerEvent(t(6), "PlayerRegistered", "mary"),
    ServerEvent(t(8), "PlayerRegistered", "carl"),
    ServerEvent(t(3), "PlayerOnline", "bob"),
    ServerEvent(t(4), "PlayerOnline", "sam"),
    ServerEvent(t(5), "PlayerOnline", "rob"),
    ServerEvent(t(6), "PlayerOnline", "alice"),
    ServerEvent(t(7), "PlayerOnline", "mary"),
    ServerEvent(t(10), "PlayerOnline", "carl"),
  )
}
