package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // deterministic fixture: ~40 keys, states unique per (key, ts), probes
  // including exact-tie timestamps, keys with no states, and null-ts rows
  private lazy val probes: DataFrame = spark.range(0, 2000).select(
    col("id").as("pid"),
    pmod(col("id") * 13, lit(40)).as("k"),
    when(col("id") % 97 === 0, lit(null).cast("long"))
      .otherwise(pmod(col("id") * 7919, lit(1000))).as("t"),
    (col("id") * 3).as("payload"))

  private lazy val states: DataFrame = spark.range(0, 600).select(
    pmod(col("id") * 17, lit(35)).as("k"), // keys 35..39 have no states
    pmod(col("id") * 104729, lit(1000)).as("t"),
    when(col("id") % 41 === 0, lit(null).cast("long"))
      .otherwise(col("id") * 11).as("sv"))
    .groupBy("k", "t").agg(max("sv").as("sv")) // unique per (k, t)
    .withColumn("state_t", col("t"))

  private case class P(pid: Long, k: Long, t: Option[Long], payload: Long)
  private case class S(k: Long, t: Long, sv: Option[Long])

  /** Reference semantics, computed naively on the driver. */
  private def expected(strict: Boolean, forward: Boolean): Map[Long, Option[S]] = {
    val ss = states.select("k", "t", "sv").as[(Long, Long, Option[Long])]
      .collect().map { case (k, t, sv) => S(k, t, sv) }
    val pp = probes.select("pid", "k", "t", "payload")
      .as[(Long, Long, Option[Long], Long)].collect()
      .map { case (pid, k, t, pay) => P(pid, k, t, pay) }
    pp.map { p =>
      val best = p.t.flatMap { pt =>
        val cand = ss.filter(s => s.k == p.k && (
          if (forward) { if (strict) s.t > pt else s.t >= pt }
          else { if (strict) s.t < pt else s.t <= pt }))
        if (cand.isEmpty) None
        else Some(if (forward) cand.minBy(_.t) else cand.maxBy(_.t))
      }
      p.pid -> best
    }.toMap
  }

  private def run(strict: Boolean, forward: Boolean): Map[Long, Option[S]] =
    AsofJoin(probes, states, Seq("k"), "t", "t", Seq("state_t", "sv"),
      strict = strict, forward = forward)
      .select("pid", "k", "state_t", "sv")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map { case (pid, k, st, sv) => pid -> st.map(t => S(k, t, sv)) }
      .toMap

  for (strict <- Seq(false, true); forward <- Seq(false, true)) {
    val name = (if (forward) "forward" else "backward") +
      (if (strict) " strict" else " inclusive")
    test(s"$name matches the naive point-in-time semantics") {
      val got = run(strict, forward)
      val want = expected(strict, forward)
      assert(got.size == want.size)
      val diffs = want.collect { case (pid, w) if got(pid) != w => (pid, w, got(pid)) }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(5).mkString("; ")}")
      // the fixture must actually exercise matches, misses, and null values
      assert(want.values.count(_.isDefined) > 100)
      assert(want.values.count(_.isEmpty) > 10)
      assert(want.values.exists(s => s.isDefined && s.get.sv.isEmpty),
        "need a matched state with a null value column to pin ignoreNulls semantics")
    }
  }

  test("a matched state whose value is null is NOT skipped for an older one") {
    val p = Seq((1L, 10L)).toDF("k", "t").withColumn("pid", lit(0L))
    val s = Seq((1L, 2L, Some(5L)), (1L, 8L, None)).toDF("k", "t", "sv")
      .withColumn("state_t", col("t"))
    val out = AsofJoin(p, s, Seq("k"), "t", "t", Seq("state_t", "sv"))
      .select("state_t", "sv").as[(Option[Long], Option[Long])].head()
    assert(out == (Some(8L), None)) // the ts-8 null-valued state wins
  }

  test("the plan is join-free: one exchange for the window, no join operator") {
    val plan = AsofJoin(probes, states, Seq("k"), "t", "t", Seq("state_t", "sv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("type/name preconditions fail fast") {
    intercept[IllegalArgumentException] { // ts type mismatch
      AsofJoin(probes, states.withColumn("t", col("t").cast("int")),
        Seq("k"), "t", "t", Seq("sv"))
    }
    intercept[IllegalArgumentException] { // value column collides with left
      AsofJoin(probes, states.withColumn("payload", col("sv")),
        Seq("k"), "t", "t", Seq("payload"))
    }
    intercept[IllegalArgumentException] { // value column missing on right
      AsofJoin(probes, states, Seq("k"), "t", "t", Seq("nope"))
    }
  }
}
