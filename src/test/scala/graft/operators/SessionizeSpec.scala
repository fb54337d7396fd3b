package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class SessionizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000) // whole-ms fixtures

  // (event_id, user, ts, value) — user 1: three sessions; user 2: one;
  // includes an exact-gap boundary (600s is NOT a new session: rule is >)
  private val gap = 600L
  private val events = Seq(
    (0L, 1L, 0L, 1.25),
    (1L, 1L, 10_000_000L, 2.50),          // +10 s, same session
    (2L, 1L, 610_000_000L, 0.75),          // exactly 600 s after e1: same
    (3L, 1L, 1_300_000_000L, 4.00),        // 690 s gap: NEW
    (4L, 1L, 5_000_000_000L, 1.00),        // NEW
    (5L, 2L, 0L, 3.00),
    (6L, 2L, 599_000_000L, 1.50))          // same session

  private def df = events.map { case (e, u, t, v) => (e, u, ts(t), v) }
    .toDF("event_id", "user_id", "ts", "value")

  /** Brute session assignment mirroring the > gap rule. */
  private def bruteSeq: Map[Long, Long] = events.groupBy(_._2).flatMap { case (_, es) =>
    val sorted = es.sortBy(e => (e._3, e._1))
    var seq = 0L; var prev = Long.MinValue
    sorted.map { e =>
      if (prev == Long.MinValue || e._3 - prev > gap * 1000000L) seq += 1
      prev = e._3
      e._1 -> seq
    }
  }

  test("label matches the brute-force gap rule, exact-gap stays in session") {
    val got = Sessionize.label(df, "user_id", "ts", "event_id", gap)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == bruteSeq)
    assert(got(2L) == got(1L)) // exactly 600 s: same session
    assert(got(3L) == got(2L) + 1)
  }

  test("stats equals aggregating the labeled events; end = last + gap") {
    val lab = Sessionize.label(df, "user_id", "ts", "event_id", gap)
      .groupBy("user_id", "session_seq")
      .agg(min(unix_micros(col("ts"))).as("session_start_us"),
        (max(unix_micros(col("ts"))) + gap * 1000000L).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "value_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val got = Sessionize.stats(df, "user_id", "ts", "value", gap)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == lab)
    assert(got.count(_._1 == 1L) == 3 && got.count(_._1 == 2L) == 1)
  }

  test("ties on ts are ordered by event id (deterministic labels)") {
    val tied = Seq((7L, 9L, ts(0L), 1.0), (8L, 9L, ts(0L), 1.0),
      (9L, 9L, ts(700L * 1000000L), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Sessionize.label(tied, "user_id", "ts", "event_id", gap)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 1L, 8L -> 1L, 9L -> 2L))
  }

  test("invalid gap rejected") {
    intercept[IllegalArgumentException] { Sessionize.label(df, "user_id", "ts", "event_id", 0) }
    intercept[IllegalArgumentException] { Sessionize.stats(df, "user_id", "ts", "value", -5) }
  }
}
