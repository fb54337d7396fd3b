package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Algebraic laws of the bounded top-k buffer: any split of the input
 * into reduce/merge trees must equal sort-take — this is exactly what
 * Spark's partial aggregation assumes when it reduces map-side and
 * merges post-shuffle in arbitrary order. (Property-style over seeded
 * deterministic draws; no scalatestplus bridge in the offline cache.)
 */
class TopKPropertySpec extends AnyFunSuite {

  private def sortTake(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (s, key) => (-s, key) }.take(k)

  private def buf(agg: TopKByScore, xs: Seq[(Double, Long)]): TopKBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def toSeq(b: TopKBuf): Seq[(Double, Long)] = b.scores.zip(b.keys).toSeq

  /** Deterministic draw: n pairs with coarse scores (forces ties) and a
   * small key space (forces equal keys across chunks). */
  private def draw(seed: Long): Seq[(Double, Long)] = {
    val rnd = new scala.util.Random(seed)
    val n = rnd.nextInt(60)
    Seq.fill(n)(((rnd.nextInt(21) - 10) / 10.0, rnd.nextInt(30).toLong))
  }

  test("sequential reduce equals sort-take for any k") {
    for (seed <- 0 until 300) {
      val xs = draw(seed)
      val k = 1 + (seed % 10)
      assert(toSeq(buf(new TopKByScore(k), xs)) == sortTake(xs, k), s"seed=$seed k=$k")
    }
  }

  test("any partition into reduce+merge equals sort-take (partial-agg law)") {
    for (seed <- 0 until 300) {
      val xs = draw(seed + 1000)
      val k = 1 + (seed % 8)
      val parts = 1 + (seed % 5)
      val agg = new TopKByScore(k)
      val chunks =
        if (xs.isEmpty) Seq(Seq.empty[(Double, Long)])
        else xs.grouped(math.max(1, xs.size / parts)).toSeq
      val merged = chunks.map(c => buf(agg, c)).foldLeft(agg.zero)(agg.merge)
      assert(toSeq(merged) == sortTake(xs, k), s"seed=$seed k=$k parts=$parts")
    }
  }

  test("merge is associative and order-insensitive") {
    for (seed <- 0 until 200) {
      val k = 1 + (seed % 6)
      val agg = new TopKByScore(k)
      val (a, b, c) = (draw(seed + 2000), draw(seed + 3000), draw(seed + 4000))
      val (ba, bb, bc) = (buf(agg, a), buf(agg, b), buf(agg, c))
      val left = toSeq(agg.merge(agg.merge(ba, bb), bc))
      val right = toSeq(agg.merge(ba, agg.merge(bb, bc)))
      val swapped = toSeq(agg.merge(agg.merge(bc, ba), bb))
      assert(left == right && left == swapped, s"seed=$seed k=$k")
      assert(left == sortTake(a ++ b ++ c, k))
    }
  }
}
