package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Utf8
import graft.geo.{CellIndex, Geometry}
import graft.parse.{Extractor, HtmlParser}

/**
 * Custom Catalyst expressions (SURVEY.md §7.3). Design rules:
 *  - cell arithmetic is `doGenCode`-ed (pure static calls → stays inside
 *    whole-stage codegen; hot at 10^12 rows);
 *  - the HTML parser is eval-only (a parser can't be usefully inlined into
 *    generated Java), exposed as scalar kernels + Generators (the UDTF
 *    slot, reference: tools/search.py:205-211 query-execute fan-out);
 *  - extraction output stays BinaryType until the last moment so invalid
 *    UTF-8 survives Catalyst boundaries byte-identically (SURVEY §7.4-1).
 */

// ---------------------------------------------------------------------------
// Scalar: cell index (codegen'd — the 10^12-row hot path)
// ---------------------------------------------------------------------------

case class CellIdExpr(lat: Expression, lon: Expression, res: Expression)
    extends TernaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(la: Any, lo: Any, r: Any): Any =
    CellIndex.latLonToCell(la.asInstanceOf[Double], lo.asInstanceOf[Double], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, r) => s"graft.geo.CellIndex.latLonToCell($la, $lo, $r)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(lat = f, lon = s, res = t)
}

case class CellParentExpr(cell: Expression, parentRes: Expression) extends BinaryExpression {
  override def left: Expression = cell
  override def right: Expression = parentRes
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, r: Any): Any =
    CellIndex.parent(c.asInstanceOf[Long], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.geo.CellIndex.parent($c, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(cell = l, parentRes = r)
}

case class CellCenterLatExpr(cell: Expression) extends UnaryExpression {
  override def child: Expression = cell
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any): Any = CellIndex.centerLat(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geo.CellIndex.centerLat($c)")
  override protected def withNewChildInternal(c: Expression) = copy(cell = c)
}

case class CellCenterLonExpr(cell: Expression) extends UnaryExpression {
  override def child: Expression = cell
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any): Any = CellIndex.centerLon(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.geo.CellIndex.centerLon($c)")
  override protected def withNewChildInternal(c: Expression) = copy(cell = c)
}

/** Codegen'd dot product of two numeric-array columns (Array[Float] or
 * Array[Double] in any combination), double accumulation left-to-right —
 * the ANN hot loop (bits×dim per row in sign-LSH bucketing). Replaces the
 * interpreted `aggregate(zip_with(...))` HOF pair (no codegen, per-element
 * lambda dispatch; CLAUDE.md gotcha). */
case class DotProductExpr(a: Expression, b: Expression) extends BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product needs array<float> or array<double> inputs, got $t")
  }
  private lazy val aF = isFloatArray(a)
  private lazy val bF = isFloatArray(b)
  override protected def nullSafeEval(av: Any, bv: Any): Any =
    graft.core.VecOps.dot(
      av.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], aF,
      bv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.core.VecOps.dot($x, $aF, $y, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(a = l, b = r)
}

/** Exact point-in-polygon predicate (the post-equi-join refinement of the
 * two-phase spatial join, SURVEY §2.3 J5). Ring = ArrayType(DoubleType)
 * interleaved [x0,y0,x1,y1,…]. Codegen'd: one static call per row. */
/** Runtime kernels reading Catalyst ArrayData DIRECTLY (no
 * `.toDoubleArray()` copy per candidate row — the copy is exactly the
 * per-row cost the index exists to remove on many-edge rings). Math is
 * the same crossing rule as [[graft.geo.Geometry.pointInPolygon]];
 * decision equality with the pure-array kernels is property-pinned in
 * GeometrySpec. */
object PipRt {
  import org.apache.spark.sql.catalyst.util.ArrayData
  def pointInRingIndexed(x: Double, y: Double,
      ring: ArrayData, idx: ArrayData): Boolean = {
    val n = ring.numElements() / 2
    if (n < 3) return false
    val yMin = idx.getDouble(0); val yMax = idx.getDouble(1)
    val bands = idx.getDouble(2).toInt
    if (y < yMin || y > yMax) return false
    val h = (yMax - yMin) / bands
    val b =
      if (h <= 0) 0
      else math.min(bands - 1, math.max(0, ((y - yMin) / h).toInt))
    val from = idx.getDouble(3 + b).toInt
    val until = idx.getDouble(3 + b + 1).toInt
    var inside = false
    var e = from
    while (e < until) {
      val i = idx.getDouble(3 + bands + 1 + e).toInt
      val j = (i + n - 1) % n
      val xi = ring.getDouble(2 * i); val yi = ring.getDouble(2 * i + 1)
      val xj = ring.getDouble(2 * j); val yj = ring.getDouble(2 * j + 1)
      if ((yi > y) != (yj > y)) {
        val xCross = (xj - xi) * (y - yi) / (yj - yi) + xi
        if (x < xCross) inside = !inside
      }
      e += 1
    }
    inside
  }
}

/** Y-banded edge interval index of a ring (see
 * [[graft.geo.Geometry.yBandIndex]] for the encoding and the exactness
 * argument) — built ONCE per polygon row (cold side), consumed per
 * candidate pair by [[PointInPolygonIndexedExpr]]. */
case class PolygonYIndexExpr(ring: Expression, bands: Expression)
    extends BinaryExpression {
  override def left: Expression = ring
  override def right: Expression = bands
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // SQL-registered (functions.registerAll) → type-check at analysis, not
  // as a runtime ClassCastException on the first row
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ring.dataType == ArrayType(DoubleType, containsNull = false) ||
        ring.dataType == ArrayType(DoubleType, containsNull = true))
      if (bands.dataType == IntegerType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polygon_y_index bands must be INT, got ${bands.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"polygon_y_index ring must be ARRAY<DOUBLE>, got ${ring.dataType.sql}")
  override protected def nullSafeEval(rv: Any, bv: Any): Any =
    new GenericArrayData(Geometry.yBandIndex(
      rv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray(),
      bv.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (rv, bv) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.geo.Geometry.yBandIndex($rv.toDoubleArray(), $bv))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(ring = l, bands = r)
}

/** Indexed exact PIP refinement (north rule: "ray-casting with
 * interval-tree edge index") — codegen'd, reads ring AND index straight
 * from ArrayData (zero per-candidate copies; the plain
 * [[PointInPolygonExpr]] copies the ring per row, fine for small rings). */
case class PointInPolygonIndexedExpr(
    x: Expression, y: Expression, ring: Expression, idx: Expression)
    extends QuaternaryExpression {
  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = ring
  override def fourth: Expression = idx
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isDoubleArray(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (x.dataType == DoubleType && y.dataType == DoubleType &&
        isDoubleArray(ring.dataType) && isDoubleArray(idx.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "point_in_polygon_indexed requires (DOUBLE x, DOUBLE y, ARRAY<DOUBLE> ring, " +
        s"ARRAY<DOUBLE> idx), got (${x.dataType.sql}, ${y.dataType.sql}, " +
        s"${ring.dataType.sql}, ${idx.dataType.sql})")
  }
  override protected def nullSafeEval(xv: Any, yv: Any, rv: Any, iv: Any): Any =
    PipRt.pointInRingIndexed(xv.asInstanceOf[Double], yv.asInstanceOf[Double],
      rv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      iv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xv, yv, rv, iv) =>
      s"graft.functions.PipRt.pointInRingIndexed($xv, $yv, $rv, $iv)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression) =
    copy(x = f, y = s, ring = t, idx = q)
}

case class PointInPolygonExpr(x: Expression, y: Expression, ring: Expression)
    extends TernaryExpression {
  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = ring
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(xv: Any, yv: Any, rv: Any): Any =
    Geometry.pointInPolygon(xv.asInstanceOf[Double], yv.asInstanceOf[Double],
      rv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xv, yv, rv) =>
      s"graft.geo.Geometry.pointInPolygon($xv, $yv, $rv.toDoubleArray())")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(x = f, y = s, ring = t)
}

// ---------------------------------------------------------------------------
// Scalar: extraction kernels (eval-only; parser not codegen-able)
// ---------------------------------------------------------------------------

/** Byte-identity text extraction: BINARY html → BINARY extracted text
 * (reference kernel: utils/tree_sitter_helpers.py:239-261; the per-url
 * invariant of BASELINE.json input_hint). */
case class ExtractedTextExpr(html: Expression) extends UnaryExpression {
  override def child: Expression = html
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(h: Any): Any =
    Extractor.extractTextBytes(h.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.parse.Extractor.extractTextBytes($h)")
  override protected def withNewChildInternal(c: Expression) = copy(html = c)
}

/** UTF-8 decode with CPython errors="replace" parity (SURVEY §2.11). */
case class Utf8ReplaceDecodeExpr(bin: Expression) extends UnaryExpression {
  override def child: Expression = bin
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    UTF8String.fromString(Utf8.decodeReplace(b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.core.Utf8.decodeReplace($b))")
  override protected def withNewChildInternal(c: Expression) = copy(bin = c)
}

// ---------------------------------------------------------------------------
// Generators (the UDTF slot — one html row in, many rows out)
// ---------------------------------------------------------------------------

/** Flattened node table of one document (reference: get_ast →
 * node_to_dict_cursor, tools/ast_operations.py:17-66 + models/
 * ast_cursor.py:12-183 — relational encoding per SURVEY §2.9 T1). */
case class ParseHtmlNodesExpr(html: Expression) extends UnaryExpression with Generator with CodegenFallback {
  override def child: Expression = html
  override def elementSchema: StructType = ParseHtmlNodesExpr.schema
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val h = html.eval(input)
    if (h == null) return Nil
    val res = HtmlParser.parse(h.asInstanceOf[Array[Byte]])
    res.nodes.iterator.zipWithIndex.map { case (n, i) =>
      val keys = new GenericArrayData(n.attrs.map(a => UTF8String.fromString(a._1)).toArray[Any])
      val vals = new GenericArrayData(n.attrs.map(a => UTF8String.fromString(a._2)).toArray[Any])
      val path = new GenericArrayData(res.paths(i).map(UTF8String.fromString).toArray[Any])
      InternalRow(n.id, n.parentId, n.depth,
        UTF8String.fromString(n.kind), UTF8String.fromString(n.name),
        new ArrayBasedMapData(keys, vals),
        n.startByte, n.endByte, n.startRow, n.startCol, n.endRow, n.endCol,
        path, n.childrenCount)
    }.toSeq
  }
  override protected def withNewChildInternal(c: Expression) = copy(html = c)
}
object ParseHtmlNodesExpr {
  val schema: StructType = StructType(Seq(
    StructField("node_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = false),
    StructField("start_byte", IntegerType, nullable = false),
    StructField("end_byte", IntegerType, nullable = false),
    StructField("start_row", IntegerType, nullable = false),
    StructField("start_col", IntegerType, nullable = false),
    StructField("end_row", IntegerType, nullable = false),
    StructField("end_col", IntegerType, nullable = false),
    StructField("path", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("children_count", IntegerType, nullable = false)))
}

/** Capture rows for one or more named extraction specs (reference row
 * shape: tools/search.py:233-249; spec ≈ query template, SURVEY §2.8
 * Q1-Q3). `spec` may be a comma-separated list ("headings,links,…"): the
 * document is parsed ONCE and every listed template runs over the same
 * parse — the multi-template analogue of the reference's get_symbols
 * without one parse per template (parse dominates the pipeline cost).
 * The spec list is compiled/validated ONCE at plan time (driver),
 * mirroring the reference's compile-before-loop discipline (SURVEY §4). */
case class ExtractCapturesExpr(html: Expression, spec: Expression)
    extends BinaryExpression with Generator with CodegenFallback {
  override def left: Expression = html
  override def right: Expression = spec
  private lazy val specNames: Seq[String] = {
    require(spec.foldable, "extraction spec must be a literal (plan-time compiled)")
    val s = spec.eval(InternalRow.empty).asInstanceOf[UTF8String].toString
    val names = s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "extraction spec list must name at least one spec")
    names.foreach(n => require(Extractor.SpecNames.contains(n),
      s"unknown extraction spec '$n' (known: ${Extractor.SpecNames.mkString(", ")})"))
    names
  }
  override def elementSchema: StructType = ExtractCapturesExpr.schema
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val h = html.eval(input)
    if (h == null) return Nil
    val res = HtmlParser.parse(h.asInstanceOf[Array[Byte]])
    Extractor.capturesMulti(res, specNames).map { c =>
      InternalRow(UTF8String.fromString(c.capture), UTF8String.fromString(c.text),
        c.startByte, c.endByte, c.startRow, c.startCol, c.endRow, c.endCol)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(html = l, spec = r)
}
object ExtractCapturesExpr {
  val schema: StructType = StructType(Seq(
    StructField("capture", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("start_byte", IntegerType, nullable = false),
    StructField("end_byte", IntegerType, nullable = false),
    StructField("start_row", IntegerType, nullable = false),
    StructField("start_col", IntegerType, nullable = false),
    StructField("end_row", IntegerType, nullable = false),
    StructField("end_col", IntegerType, nullable = false)))
}

/** Geo entities of one page (SURVEY §7.2 — feeds cell encode + join). */
case class ExtractGeoEntitiesExpr(html: Expression) extends UnaryExpression with Generator with CodegenFallback {
  override def child: Expression = html
  override def elementSchema: StructType = ExtractGeoEntitiesExpr.schema
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val h = html.eval(input)
    if (h == null) return Nil
    Extractor.geoEntities(h.asInstanceOf[Array[Byte]]).map { e =>
      InternalRow(e.entityIdx, UTF8String.fromString(e.source), e.lat, e.lon)
    }
  }
  override protected def withNewChildInternal(c: Expression) = copy(html = c)
}
object ExtractGeoEntitiesExpr {
  val schema: StructType = StructType(Seq(
    StructField("entity_idx", IntegerType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false)))
}

/** k-ring fan-out for kNN (SURVEY §2.11 "CellRing generator"). Emits the
 * Chebyshev ring at exactly radius k (k=0 → the cell itself). */
case class CellRingExpr(cell: Expression, k: Expression)
    extends BinaryExpression with Generator with CodegenFallback {
  override def left: Expression = cell
  override def right: Expression = k
  override def elementSchema: StructType =
    StructType(Seq(StructField("ring_cell", LongType, nullable = false)))
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val c = cell.eval(input)
    val kv = k.eval(input)
    if (c == null || kv == null) return Nil
    CellIndex.ring(c.asInstanceOf[Long], kv.asInstanceOf[Int]).map(InternalRow(_))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(cell = l, k = r)
}

/** Polygon → covering cells at `res` (the build side of the two-phase
 * spatial join, SURVEY §2.3 J5). Superset-guaranteed cover (tested in
 * GeometrySpec); ring = ArrayType(DoubleType) interleaved [x,y,…]. */
case class CellCoverExpr(ring: Expression, res: Expression)
    extends BinaryExpression with Generator with CodegenFallback {
  override def left: Expression = ring
  override def right: Expression = res
  override def elementSchema: StructType =
    StructType(Seq(StructField("cover_cell", LongType, nullable = false)))
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val r = ring.eval(input)
    val rs = res.eval(input)
    if (r == null || rs == null) return Nil
    val arr = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    Geometry.cellCover(arr, rs.asInstanceOf[Int]).map(InternalRow(_))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(ring = l, res = r)
}

/** Lower bound on squared degree-distance from (lat, lon) to anything
 * OUTSIDE the Chebyshev disk of radius k around its cell — the kNN
 * ring-expansion termination criterion (SURVEY §7.4-4). Codegen'd. */
case class CellDiskBoundExpr(lat: Expression, lon: Expression, res: Expression, k: Expression)
    extends QuaternaryExpression {
  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = res
  override def fourth: Expression = k
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(la: Any, lo: Any, r: Any, kk: Any): Any =
    CellIndex.minDistSqBeyondDisk(la.asInstanceOf[Double], lo.asInstanceOf[Double],
      r.asInstanceOf[Int], kk.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, r, kk) =>
      s"graft.geo.CellIndex.minDistSqBeyondDisk($la, $lo, $r, $kk)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression) =
    copy(lat = f, lon = s, res = t, k = q)
}

/** All cells with Chebyshev distance in [kFrom, kTo] of `cell`, as an
 * ARRAY column exploded by the BUILT-IN `explode` (see
 * [[graft.functions.cell_disk_band]]) — deliberately a codegen'd scalar
 * rather than a custom Generator: a custom Generator is CodegenFallback,
 * which severs whole-stage codegen for the entire generate→join→aggregate
 * chain around it, leaving every ring-cell and join-candidate row an
 * interpreted-path heap allocation. Measured on the kNN scaling bench at
 * 16 cores that allocation rate (~9 GB/s) made GC the scaling ceiling;
 * built-in explode keeps the chain in ONE WholeStageCodegen span and this
 * expression allocates one long[] per input row. */
case class CellDiskBandExpr(cell: Expression, kFrom: Expression, kTo: Expression)
    extends TernaryExpression {
  override def first: Expression = cell
  override def second: Expression = kFrom
  override def third: Expression = kTo
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, f: Any, t: Any): Any =
    new GenericArrayData(CellIndex.diskBand(
      c.asInstanceOf[Long], f.asInstanceOf[Int], t.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, f, t) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.geo.CellIndex.diskBand($c, $f, $t))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(cell = f, kFrom = s, kTo = t)
}
