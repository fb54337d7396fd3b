package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Mutable bounded top-k state: the first `n` slots of `scores`/`keys` are
 * live, sorted by (score desc, key asc); capacity-k arrays are allocated
 * ONCE per group, accepted rows shift in place, rejected rows touch
 * nothing — this state IS the hot path it exists to optimize.
 *
 * Ordering contract (identical to the `row_number` window it replaces):
 * score descending, key ascending on ties, compared with
 * `java.lang.Double.compare` semantics — NaN sorts as the LARGEST score
 * and -0.0 < 0.0, exactly Spark's double ordering, so the order is total
 * and merge stays associative even with NaN scores (0/0 cosines).
 */
final class TopKAggState(val k: Int) {
  var n: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val keys: Array[Long] = new Array[Long](k)

  /** (s1, k1) strictly before (s2, k2) in output order. */
  @inline private def better(s1: Double, k1: Long, s2: Double, k2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2) // total: NaN largest, -0.0 < 0.0
    c > 0 || (c == 0 && k1 < k2)
  }

  def insert(s: Double, key: Long): Unit = {
    var pos = 0
    while (pos < n && !better(s, key, scores(pos), keys(pos))) pos += 1
    if (pos >= k) return
    val newN = math.min(n + 1, k)
    val shift = newN - pos - 1 // live entries moving right (drops the last if full)
    if (shift > 0) {
      System.arraycopy(scores, pos, scores, pos + 1, shift)
      System.arraycopy(keys, pos, keys, pos + 1, shift)
    }
    scores(pos) = s
    keys(pos) = key
    n = newN
  }

  /** Absorb every live entry of `other` (other is left untouched). */
  def mergeFrom(other: TopKAggState): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.keys(i)); i += 1 }
  }
}

/**
 * Map-side partial top-k aggregation as a NATIVE Catalyst
 * TypedImperativeAggregate — the scale fix for the ANN/kNN ranking
 * stages. A `row_number` window shuffles EVERY scored candidate row
 * (corpus × |queries| at 100 TB); this aggregate runs inside
 * ObjectHashAggregate with partial aggregation, so each map task ships at
 * most k (score, key) pairs per query into the exchange, and the final
 * merge is k-bounded per group.
 *
 * Why native instead of a Dataset `Aggregator` via `udaf()` (the previous
 * shape): ScalaAggregator deserializes every input row into a boxed
 * `(Double, Long)` tuple before the reduce — ~3 heap allocations per
 * candidate row, hundreds of millions per kNN round. Allocation rate was
 * the measured 16-core scaling limiter of the iterative kNN bench (the
 * young gen fills faster than GC threads can clear it as cores grow).
 * Here the common case (bound attribute children, the only shape the
 * engine's callers produce) reads the two primitives straight off the
 * InternalRow: zero allocation for a rejected candidate, zero for an
 * accepted one (in-place shift).
 */
case class TopKAggExpr(
    k: Int,
    score: Expression,
    key: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAggState] {
  require(k >= 1)

  override def children: Seq[Expression] = Seq(score, key)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("scores", ArrayType(DoubleType, containsNull = false)),
    StructField("keys", ArrayType(LongType, containsNull = false))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && key.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk requires (DOUBLE score, BIGINT key), got (${score.dataType.sql}, ${key.dataType.sql})")

  override def createAggregationBuffer(): TopKAggState = new TopKAggState(k)

  // after planning the children are BoundReferences (the engine's callers
  // pass plain columns); read primitives directly — no per-row boxing.
  // The eval fallback keeps arbitrary expressions correct.
  @transient private lazy val updateFn: (TopKAggState, InternalRow) => Unit =
    (score, key) match {
      case (sb: BoundReference, kb: BoundReference) =>
        (b, row) =>
          if (!row.isNullAt(sb.ordinal) && !row.isNullAt(kb.ordinal))
            b.insert(row.getDouble(sb.ordinal), row.getLong(kb.ordinal))
      case _ =>
        (b, row) => {
          val s = score.eval(row)
          val kk = key.eval(row)
          if (s != null && kk != null)
            b.insert(s.asInstanceOf[Double], kk.asInstanceOf[Long])
        }
    }

  override def update(b: TopKAggState, input: InternalRow): TopKAggState = {
    updateFn(b, input)
    b
  }

  override def merge(x: TopKAggState, y: TopKAggState): TopKAggState = {
    x.mergeFrom(y)
    x
  }

  override def eval(b: TopKAggState): Any = // trim to live length for output
    InternalRow(b.n,
      new GenericArrayData(java.util.Arrays.copyOf(b.scores, b.n)),
      new GenericArrayData(java.util.Arrays.copyOf(b.keys, b.n)))

  /** Spill/exchange format: [n:int][n doubles][n longs] (k rides the
   * expression, not the bytes). */
  override def serialize(b: TopKAggState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.scores(i)); i += 1 }
    i = 0
    while (i < b.n) { bb.putLong(b.keys(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAggState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new TopKAggState(k)
    st.n = bb.getInt
    var i = 0
    while (i < st.n) { st.scores(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < st.n) { st.keys(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggExpr =
    copy(score = newChildren(0), key = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** Column form: top-k (score desc, key asc) → struct(n, scores, keys). */
  def topK(k: Int)(score: Column, key: Column): Column =
    GraftBridge.column(
      TopKAggExpr(k, GraftBridge.expression(score), GraftBridge.expression(key))
        .toAggregateExpression())

  /** Column form of [[MaxScoreMinKey]]: → struct(best_score, best_key). */
  def best(score: Column, key: Column): Column =
    GraftBridge.column(
      MaxScoreMinKey(GraftBridge.expression(score), GraftBridge.expression(key))
        .toAggregateExpression())
}

/**
 * The k = 1 case as a DECLARATIVE aggregate: (max score, min key among
 * max-score rows) over (DOUBLE, BIGINT) — i.e. the same (score desc,
 * key asc) contract as [[TopKAggExpr]], specialized to nearest-neighbor.
 *
 * Why it exists when TopKAggExpr already handles k = 1: buffer shape.
 * A typed-imperative aggregate forces ObjectHashAggregate, and the
 * whole-stage-codegen span feeding it must COPY every candidate row at
 * the span boundary (BufferedRowIterator materializes multi-output
 * spans) — profiled at ~100 GB of UnsafeRow copies per kNN bench child,
 * with the resulting GC a core-count-independent cost that capped N→4N
 * scaling. This aggregate's buffer is two mutable primitives, so
 * HashAggregateExec fuses the partial aggregation INTO the codegen span:
 * scan → explode → join → partial agg is one generated loop, zero
 * per-candidate allocation.
 *
 * Semantics notes: plain SQL comparisons — a NaN score never wins and
 * -0.0 ties 0.0 (callers must pre-filter NaN, as Knn does; TopKAggExpr
 * uses the total Double.compare order instead). Empty/never-updated
 * group ⇒ best_score = -Infinity — Knn's sentinel convention.
 */
case class MaxScoreMinKey(
    score: Expression,
    key: Expression)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {
  import org.apache.spark.sql.catalyst.dsl.expressions._
  import org.apache.spark.sql.catalyst.expressions._

  override def children: Seq[Expression] = Seq(score, key)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("best_score", DoubleType, nullable = false),
    StructField("best_key", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && key.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"best requires (DOUBLE score, BIGINT key), got (${score.dataType.sql}, ${key.dataType.sql})")

  private lazy val bs = AttributeReference("bs", DoubleType, nullable = false)()
  private lazy val bk = AttributeReference("bk", LongType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bs, bk)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.NegativeInfinity), Literal(Long.MaxValue))

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = score.isNull || key.isNull
    Seq(
      If(skip, bs, If(GreaterThan(score, bs), score, bs)),
      If(skip, bk,
        If(GreaterThan(score, bs), key,
          If(EqualTo(score, bs), Least(Seq(bk, key)), bk))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(GreaterThan(bs.right, bs.left), bs.right, bs.left),
    If(GreaterThan(bs.right, bs.left), bk.right,
      If(EqualTo(bs.right, bs.left), Least(Seq(bk.left, bk.right)), bk.left)))

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("best_score"), bs, Literal("best_key"), bk))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MaxScoreMinKey =
    copy(score = newChildren(0), key = newChildren(1))
  override def prettyName: String = "max_score_min_key"
}
