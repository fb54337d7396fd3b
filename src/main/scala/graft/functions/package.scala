package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.functions.lit

/**
 * Column-level API over the custom Catalyst expressions — the engine's
 * scalar/generator function surface (the Spark analogue of the reference's
 * MCP tool surface, SURVEY §2.13).
 */
package object functions {

  /** Encode (lat, lon) into a 64-bit hierarchical cell id at `res`. */
  def cell_id(lat: Column, lon: Column, res: Int): Column =
    column(CellIdExpr(expression(lat.cast("double")), expression(lon.cast("double")),
      expression(lit(res))))

  def cell_parent(cell: Column, parentRes: Int): Column =
    column(CellParentExpr(expression(cell), expression(lit(parentRes))))

  def cell_center_lat(cell: Column): Column = column(CellCenterLatExpr(expression(cell)))
  def cell_center_lon(cell: Column): Column = column(CellCenterLonExpr(expression(cell)))

  /** Codegen'd dot product over array<float>/array<double> columns. */
  def dot_product(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  /** Exact ray-casting PIP; ring = array<double> interleaved [x,y,…]. */
  def point_in_polygon(x: Column, y: Column, ring: Column): Column =
    column(PointInPolygonExpr(expression(x), expression(y), expression(ring)))

  /** Y-banded edge interval index of a ring (build once per polygon). */
  def polygon_y_index(ring: Column, bands: Int): Column =
    column(PolygonYIndexExpr(expression(ring), expression(lit(bands))))

  /** Exact PIP via the edge index (north rule's indexed refinement). */
  def point_in_polygon_indexed(x: Column, y: Column, ring: Column, idx: Column): Column =
    column(PointInPolygonIndexedExpr(
      expression(x), expression(y), expression(ring), expression(idx)))

  /** BINARY html → BINARY extracted text (byte-identity kernel). */
  def extract_text_bytes(html: Column): Column =
    column(ExtractedTextExpr(expression(html)))

  /** BINARY html → STRING extracted text (replace-decoded). */
  def extract_text(html: Column): Column =
    column(Utf8ReplaceDecodeExpr(ExtractedTextExpr(expression(html))))

  /** BINARY → STRING with CPython errors="replace" semantics. */
  def utf8_decode_replace(bin: Column): Column =
    column(Utf8ReplaceDecodeExpr(expression(bin)))

  /** Generator: flattened HTML node table (use inside select with explode
   * semantics: df.select($"url", parse_html_nodes($"html"))). */
  def parse_html_nodes(html: Column): Column =
    column(ParseHtmlNodesExpr(expression(html)))

  /** Generator: capture rows for a named extraction spec. */
  def extract_captures(html: Column, spec: String): Column =
    column(ExtractCapturesExpr(expression(html), expression(lit(spec))))

  /** Generator: (entity_idx, source, lat, lon) geo entities per page. */
  def extract_geo(html: Column): Column =
    column(ExtractGeoEntitiesExpr(expression(html)))

  /** Generator: Chebyshev ring cells at radius k. */
  def cell_ring(cell: Column, k: Column): Column =
    column(CellRingExpr(expression(cell), expression(k)))

  /** kNN ring-expansion termination bound (squared degrees). */
  def cell_disk_bound(lat: Column, lon: Column, res: Int, k: Column): Column =
    column(CellDiskBoundExpr(expression(lat), expression(lon),
      expression(lit(res)), expression(k)))

  /** Cells with Chebyshev distance in [kFrom, kTo], exploded one per row.
   * Built-in explode over a codegen'd array scalar — NOT a custom
   * Generator — so the surrounding pipeline stays in whole-stage codegen
   * (see [[CellDiskBandExpr]]). */
  def cell_disk_band(cell: Column, kFrom: Column, kTo: Column): Column =
    org.apache.spark.sql.functions.explode(
      column(CellDiskBandExpr(expression(cell), expression(kFrom), expression(kTo))))

  /** Generator: covering cells of a polygon ring at `res`. */
  def cell_cover(ring: Column, res: Int): Column =
    column(CellCoverExpr(expression(ring), expression(lit(res))))

  /** SQL name → expression builder, the single source for both
   * [[registerAll]] (live session) and `GraftExtensions.injectFunction`
   * (builder-time registration for spark-submit deployments). */
  private[graft] val sqlFunctionBuilders: Seq[
      (String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "cell_id" -> (es => CellIdExpr(es(0), es(1), es(2))),
    "cell_parent" -> (es => CellParentExpr(es(0), es(1))),
    "cell_center_lat" -> (es => CellCenterLatExpr(es.head)),
    "cell_center_lon" -> (es => CellCenterLonExpr(es.head)),
    "point_in_polygon" -> (es => PointInPolygonExpr(es(0), es(1), es(2))),
    "polygon_y_index" -> (es => PolygonYIndexExpr(es(0), es(1))),
    "point_in_polygon_indexed" -> (es => PointInPolygonIndexedExpr(es(0), es(1), es(2), es(3))),
    "extract_text_bytes" -> (es => ExtractedTextExpr(es.head)),
    "extract_text" -> (es => Utf8ReplaceDecodeExpr(ExtractedTextExpr(es.head))),
    "utf8_decode_replace" -> (es => Utf8ReplaceDecodeExpr(es.head)),
    "parse_html_nodes" -> (es => ParseHtmlNodesExpr(es.head)),
    "extract_captures" -> (es => ExtractCapturesExpr(es(0), es(1))),
    "extract_geo" -> (es => ExtractGeoEntitiesExpr(es.head)),
    "cell_ring" -> (es => CellRingExpr(es(0), es(1))),
    "cell_cover" -> (es => CellCoverExpr(es(0), es(1))),
    "dot_product" -> (es => DotProductExpr(es(0), es(1))),
    // bloom probe for SQL callers (the builder aggregate stays on the
    // Column API — Bloom.bloomAgg — since a bare AggregateFunction can't
    // ride createOrReplaceTempFunction)
    "bloom_might_contain" -> (es =>
      graft.operators.BloomMightContainExpr(es(0), es(1))))

  /** Register SQL names so spark.sql can call the engine functions. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctionBuilders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
