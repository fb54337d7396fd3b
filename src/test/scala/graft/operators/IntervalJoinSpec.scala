package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // deterministic fixture crossing zero (negative floor-div regime),
  // with degenerate (lo == hi), inverted (lo > hi) and null rows
  private lazy val points = spark.range(0, 4000).select(
    col("id").as("pid"),
    when(col("id") % 251 === 0, lit(null).cast("long"))
      .otherwise(pmod(col("id") * 7919, lit(20000)) - 10000L).as("v"))

  private lazy val intervals = spark.range(0, 800).select(
    col("id").as("iid"),
    (pmod(col("id") * 104729, lit(19000)) - 9500L).as("lo"))
    .withColumn("hi",
      when(col("iid") % 13 === 0, col("lo") - 100L) // inverted: empty
        .when(col("iid") % 7 === 0, col("lo")) // degenerate point-interval
        .otherwise(col("lo") + pmod(col("iid") * 31, lit(900))))
    .withColumn("lo", when(col("iid") % 97 === 0, lit(null).cast("long")).otherwise(col("lo")))

  private def brute: Set[(Long, Long)] = {
    val ps = points.as[(Long, Option[Long])].collect()
    val is = intervals.select("iid", "lo", "hi")
      .as[(Long, Option[Long], Option[Long])].collect()
    (for {
      (pid, Some(v)) <- ps
      (iid, Some(lo), Some(hi)) <- is
      if lo <= v && v <= hi
    } yield (pid, iid)).toSet
  }

  for (w <- Seq(1L, 64L, 1000L, 1000000L)) {
    test(s"bandWidth=$w matches the brute-force containment join exactly once per pair") {
      val got = IntervalJoin(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      // no duplicates: each (point, interval) pair produced exactly once
      assert(got.length == got.toSet.size, "duplicate pairs emitted")
      assert(got.toSet == brute)
      assert(got.nonEmpty)
    }
  }

  test("band arithmetic is exact at the far ends of the long range") {
    val far = Seq(Long.MaxValue - 3, Long.MinValue + 3, -1L, 0L, 1L).toDF("v")
      .withColumn("pid", monotonically_increasing_id())
    val ivs = Seq(
      (1L, Long.MaxValue - 10, Long.MaxValue - 1),
      (2L, Long.MinValue + 1, Long.MinValue + 10),
      (3L, -2L, 2L)).toDF("iid", "lo", "hi")
    val got = IntervalJoin(far, ivs, "v", "lo", "hi", 1000L)
      .select("v", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set(
      (Long.MaxValue - 3, 1L), (Long.MinValue + 3, 2L),
      (-1L, 3L), (0L, 3L), (1L, 3L)))
  }

  test("the plan is a shuffle hash/sort-merge join — no nested loop, no cartesian") {
    val plan = IntervalJoin(points, intervals, "v", "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("type and name preconditions fail fast") {
    intercept[IllegalArgumentException] {
      IntervalJoin(points.withColumn("v", col("v").cast("int")),
        intervals, "v", "lo", "hi", 10L)
    }
    intercept[IllegalArgumentException] { // colliding column names
      IntervalJoin(points.withColumn("lo", col("v")), intervals, "v", "lo", "hi", 10L)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin(points, intervals, "v", "lo", "hi", 0L)
    }
  }
}
