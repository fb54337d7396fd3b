package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/**
 * Vector kernels called from codegen'd Catalyst expressions (see
 * [[graft.functions.DotProductExpr]]). Static, allocation-free, branch
 * constants resolved at plan time — the generated Java is one tight loop,
 * replacing the interpreted `aggregate(zip_with(...))` higher-order
 * function chain (no codegen, per-element lambda dispatch).
 */
object VecOps {

  /**
   * Left-to-right double-accumulated dot product. `aFloat`/`bFloat` select
   * the element accessor (ArrayType(FloatType) vs ArrayType(DoubleType));
   * they are plan-time constants so the JIT drops the dead branch. The
   * accumulation order matches DuckDB's list_dot_product over DOUBLE[]
   * exactly (the oracle contract).
   */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
