package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.geo.CellIndex
import graft.parse.Extractor

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val page1 = ("""<html><head><title>One</title>
      |<meta name="geo.position" content="52.52;13.405"></head>
      |<body><h1>Hello</h1><a href="geo:48.85,2.35">p</a>
      |<a href="x.html">link</a><p>text &amp; more</p></body></html>""".stripMargin).getBytes("UTF-8")

  test("cell_id matches the pure kernel and survives codegen") {
    val df = Seq((52.52, 13.405), (-33.86, 151.2), (0.0, 0.0))
      .toDF("lat", "lon")
      .withColumn("cell", cell_id($"lat", $"lon", 12))
    val got = df.select("cell").as[Long].collect().toSeq
    val want = Seq(
      CellIndex.latLonToCell(52.52, 13.405, 12),
      CellIndex.latLonToCell(-33.86, 151.2, 12),
      CellIndex.latLonToCell(0.0, 0.0, 12))
    assert(got == want)
    // stays inside whole-stage codegen over a real (non-local) source —
    // scale requirement, SURVEY §7.3
    val rangeDf = spark.range(1000)
      .withColumn("lat", $"id" % 170 - 85.0)
      .withColumn("lon", $"id" % 360 - 180.0)
      .withColumn("cell", cell_id($"lat", $"lon", 12))
    // "*(1)" prefixes = operators fused into WholeStageCodegen stage 1
    val plan = rangeDf.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("cellidexpr"), plan)
    val sample = rangeDf.where($"id" === 999).select("cell").as[Long].head()
    assert(sample == CellIndex.latLonToCell(999 % 170 - 85.0, 999 % 360 - 180.0, 12))
  }

  test("cell_parent/cell_center round trip in SQL and Column form") {
    graft.functions.registerAll(spark)
    val row = spark.sql(
      "SELECT cell_parent(cell_id(CAST(52.52 AS DOUBLE), CAST(13.405 AS DOUBLE), 12), 5) AS p," +
        " cell_center_lat(cell_id(CAST(52.52 AS DOUBLE), CAST(13.405 AS DOUBLE), 12)) AS cla")
      .collect().head
    assert(row.getLong(0) == CellIndex.latLonToCell(52.52, 13.405, 5))
    assert(math.abs(row.getDouble(1) - 52.52) < 0.05)
  }

  test("point_in_polygon over array<double> rings") {
    val diamond = Array(9.0, 5.0, 5.0, 9.0, 1.0, 5.0, 5.0, 1.0)
    val df = Seq((5.0, 5.0), (8.5, 8.5)).toDF("x", "y")
      .withColumn("ring", typedLit(diamond))
      .withColumn("in", point_in_polygon($"x", $"y", $"ring"))
    assert(df.select("in").as[Boolean].collect().toSeq == Seq(true, false))
  }

  test("extract_text byte identity through Catalyst (invalid UTF-8 survives)") {
    val bad = "<p>ok".getBytes("UTF-8") ++ Array[Byte](-1, -2) ++ "rest</p>".getBytes("UTF-8")
    val df = Seq(Tuple1(bad)).toDF("html")
      .select(extract_text_bytes($"html").as("t"), extract_text($"html").as("s"))
    val (tBytes, sStr) = df.as[(Array[Byte], String)].collect().head
    assert(tBytes.sameElements(Extractor.extractTextBytes(bad))) // byte-identical
    assert(sStr == "ok��rest")
  }

  test("parse_html_nodes generator emits the flattened node table") {
    val df = Seq(Tuple1(page1)).toDF("html")
      .select(parse_html_nodes($"html").as(Seq(
        "node_id", "parent_id", "depth", "kind", "name", "attrs",
        "start_byte", "end_byte", "start_row", "start_col", "end_row", "end_col",
        "path", "children_count")))
    val names = df.where($"kind" === "element").select("name").as[String].collect()
    assert(names.count(_ == "a") == 2)
    assert(names.contains("h1") && names.contains("meta"))
    // positions are within document bounds and parent ids resolve
    val ids = df.select("node_id").as[Long].collect().toSet
    val parents = df.where($"depth" > 0).select("parent_id").as[Long].collect().toSet
    assert(parents.subsetOf(ids))
  }

  test("node path column is consistent with parent_id and depth") {
    val df = Seq(Tuple1(page1)).toDF("html")
      .select(parse_html_nodes($"html").as(Seq(
        "node_id", "parent_id", "depth", "kind", "name", "attrs",
        "start_byte", "end_byte", "start_row", "start_col", "end_row", "end_col",
        "path", "children_count")))
    val rows = df.select("node_id", "parent_id", "depth", "kind", "name", "path")
      .as[(Long, Long, Int, String, String, Seq[String])].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (_, parentId, depth, kind, name, path) =>
      assert(path.size == depth + 1, s"path len vs depth: $path / $depth")
      val self = if (kind == "element") name else kind
      assert(path.last == self)
      if (parentId != -1L) {
        val p = byId(parentId)
        assert(path.init == p._6, s"parent path mismatch: $path vs ${p._6}")
      } else assert(path == Seq("document"))
    }
  }

  test("extract_captures generator with plan-time spec validation") {
    val df = Seq(Tuple1(page1)).toDF("html")
    val caps = df.select(extract_captures($"html", "links").as(Seq(
      "capture", "text", "sb", "eb", "sr", "sc", "er", "ec")))
      .select("capture", "text").as[(String, String)].collect().toSeq
    assert(caps.contains(("link.href", "geo:48.85,2.35")))
    assert(caps.contains(("link.href", "x.html")))
    val err = intercept[Exception] {
      df.select(extract_captures($"html", "bogus")).collect()
    }
    assert(err.getMessage.contains("bogus") || err.getCause != null)
  }

  test("extract_geo generator") {
    val rows = Seq(Tuple1(page1)).toDF("html")
      .select(extract_geo($"html").as(Seq("entity_idx", "source", "lat", "lon")))
      .as[(Int, String, Double, Double)].collect().toSeq
    assert(rows == Seq((0, "meta", 52.52, 13.405), (1, "uri", 48.85, 2.35)))
  }

  test("cell_ring generator fan-out") {
    val c = CellIndex.latLonToCell(10, 10, 8)
    val rings = Seq(Tuple1(c)).toDF("cell")
      .select(cell_ring($"cell", lit(1)).as("rc"))
      .as[Long].collect().toSeq
    assert(rings.length == 8)
    assert(rings.toSet == CellIndex.ring(c, 1).toSet)
  }

  test("null inputs produce null/empty, not crashes") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(3.0))).toDF("lat", "lon")
      .withColumn("cell", cell_id($"lat", $"lon", 8))
    assert(df.where($"cell".isNull).count() == 1)
    val empty = spark.sql("SELECT CAST(NULL AS BINARY) AS html")
      .select(extract_geo(col("html")))
    assert(empty.count() == 0)
  }
}
