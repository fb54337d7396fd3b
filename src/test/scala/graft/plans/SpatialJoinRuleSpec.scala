package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{point_in_polygon, SparkTestSession}
import graft.geo.Geometry
import graft.sources.Fixtures

class SpatialJoinRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val pts = (0L until 300L).flatMap { i =>
    Fixtures.pageEntities(i).zipWithIndex.map { case (p, e) => (i, e, p.lat, p.lon) }
  }
  private lazy val polys = Fixtures.polygons(30)
  private lazy val ptsDf = pts.toDF("page_id", "entity_idx", "lat", "lon")
  private lazy val polysDf = spark.createDataFrame(
    spark.sparkContext.parallelize(polys.map(p => org.apache.spark.sql.Row(p.polygon_id, p.ring)), 2),
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("polygon_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ring",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))

  private lazy val want = (for {
    (pid, e, lat, lon) <- pts
    poly <- polys
    if Geometry.pointInPolygon(lon, lat, poly.ring)
  } yield (pid, e, poly.polygon_id)).toSet

  test("rule rewrites a naive PIP theta-join into the cell-blocked equi-join") {
    SpatialJoinRule.install(spark)
    try {
      val naive = ptsDf.join(polysDf, point_in_polygon($"lon", $"lat", $"ring"))
      val plan = naive.queryExecution.optimizedPlan.toString
      assert(plan.contains("cellcoverexpr") && plan.contains("__graft_cell"), plan)
      val phys = naive.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoopJoin"), phys)
      val got = naive.select("page_id", "entity_idx", "polygon_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(got == want && want.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialJoinRule)
    }
  }

  test("without the rule the same query is a nested-loop join (the problem being solved)") {
    val naive = ptsDf.join(polysDf, point_in_polygon($"lon", $"lat", $"ring"))
    val phys = naive.queryExecution.executedPlan.toString
    assert(phys.contains("CartesianProduct") || phys.contains("BroadcastNestedLoopJoin"), phys)
    // row set identical either way (the rewrite is semantics-preserving)
    val got = naive.select("page_id", "entity_idx", "polygon_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want)
  }

  test("composite conditions are left alone (rule fires only on pure PIP)") {
    SpatialJoinRule.install(spark)
    try {
      val mixed = ptsDf.join(polysDf,
        point_in_polygon($"lon", $"lat", $"ring") && $"page_id" =!= $"polygon_id")
      val plan = mixed.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_cell"), plan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialJoinRule)
    }
  }

  test("resolution is configurable and result-invariant") {
    SpatialJoinRule.install(spark)
    try {
      spark.conf.set(SpatialJoinRule.ResConfKey, "4")
      val got = ptsDf.join(polysDf, point_in_polygon($"lon", $"lat", $"ring"))
        .select("page_id", "entity_idx", "polygon_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(got == want)
    } finally {
      spark.conf.unset(SpatialJoinRule.ResConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SpatialJoinRule)
    }
  }
}
