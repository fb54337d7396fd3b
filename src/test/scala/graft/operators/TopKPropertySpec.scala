package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Algebraic laws of the bounded top-k state: any split of the input
 * into insert/merge trees must equal sort-take — this is exactly what
 * Spark's partial aggregation assumes when it reduces map-side and
 * merges post-shuffle in arbitrary order. (Property-style over seeded
 * deterministic draws; no scalatestplus bridge in the offline cache.)
 */
class TopKPropertySpec extends AnyFunSuite {

  /** Spark's double ordering: NaN largest, -0.0 < 0.0 (Double.compare). */
  private def sortTake(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith { case ((s1, k1), (s2, k2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && k1 < k2)
    }.take(k)

  private def buf(k: Int, xs: Seq[(Double, Long)]): TopKAggState = {
    val b = new TopKAggState(k)
    xs.foreach { case (s, key) => b.insert(s, key) }
    b
  }

  private def toSeq(b: TopKAggState): Seq[(Double, Long)] =
    b.scores.take(b.n).zip(b.keys.take(b.n)).toSeq

  /** Deterministic draw: n pairs with coarse scores (forces ties), a
   * small key space (forces equal keys across chunks), and occasional
   * NaN scores (0/0 cosines must keep the order total). */
  private def draw(seed: Long): Seq[(Double, Long)] = {
    val rnd = new scala.util.Random(seed)
    val n = rnd.nextInt(60)
    Seq.fill(n) {
      val s = if (rnd.nextInt(12) == 0) Double.NaN else (rnd.nextInt(21) - 10) / 10.0
      (s, rnd.nextInt(30).toLong)
    }
  }

  // NaN != NaN under ==, so compare on the bit pattern
  private def eq(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Boolean =
    a.size == b.size && a.zip(b).forall { case ((s1, k1), (s2, k2)) =>
      java.lang.Double.doubleToLongBits(s1) == java.lang.Double.doubleToLongBits(s2) && k1 == k2
    }

  test("sequential insert equals sort-take for any k") {
    for (seed <- 0 until 300) {
      val xs = draw(seed)
      val k = 1 + (seed % 10)
      assert(eq(toSeq(buf(k, xs)), sortTake(xs, k)), s"seed=$seed k=$k")
    }
  }

  test("any partition into insert+merge equals sort-take (partial-agg law)") {
    for (seed <- 0 until 300) {
      val xs = draw(seed + 1000)
      val k = 1 + (seed % 8)
      val parts = 1 + (seed % 5)
      val chunks =
        if (xs.isEmpty) Seq(Seq.empty[(Double, Long)])
        else xs.grouped(math.max(1, xs.size / parts)).toSeq
      val merged = new TopKAggState(k)
      chunks.foreach(c => merged.mergeFrom(buf(k, c)))
      assert(eq(toSeq(merged), sortTake(xs, k)), s"seed=$seed k=$k parts=$parts")
    }
  }

  test("merge is associative and order-insensitive") {
    for (seed <- 0 until 200) {
      val k = 1 + (seed % 6)
      val (a, b, c) = (draw(seed + 2000), draw(seed + 3000), draw(seed + 4000))
      // mergeFrom mutates its receiver (the contract ObjectHashAggregate
      // relies on), so rebuild fresh states for each expression
      def m(parts: Seq[Seq[(Double, Long)]]): Seq[(Double, Long)] = {
        val acc = new TopKAggState(k)
        parts.foreach(p => acc.mergeFrom(buf(k, p)))
        toSeq(acc)
      }
      val left = m(Seq(a, b, c))
      val right = m(Seq(a, c, b))
      val swapped = m(Seq(c, a, b))
      assert(eq(left, right) && eq(left, swapped), s"seed=$seed k=$k")
      assert(eq(left, sortTake(a ++ b ++ c, k)))
    }
  }

  test("serialize/deserialize round-trips the live prefix (spill format)") {
    for (seed <- 0 until 100) {
      val k = 1 + (seed % 7)
      val b = buf(k, draw(seed + 5000))
      val expr = TopKAggExpr(k,
        org.apache.spark.sql.GraftBridge.expression(org.apache.spark.sql.functions.lit(0.0)),
        org.apache.spark.sql.GraftBridge.expression(org.apache.spark.sql.functions.lit(0L)))
      val back = expr.deserialize(expr.serialize(b))
      assert(eq(toSeq(back), toSeq(b)), s"seed=$seed k=$k")
    }
  }
}
