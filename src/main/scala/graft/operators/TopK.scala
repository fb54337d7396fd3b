package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k buffer: the first `n` slots of `scores`/`keys` are live,
 * sorted by (score desc, key asc); arrays are fixed capacity k once
 * allocated, so accepted rows shift in place instead of reallocating
 * (this aggregator IS the hot path it was built to optimize). `n` is
 * carried explicitly because the buffer can be spilled/serialized
 * mid-aggregation — the encoder must not mistake capacity for length.
 */
case class TopKBuf(n: Int, scores: Array[Double], keys: Array[Long])

/**
 * Map-side partial top-k aggregation — the scale fix for the ANN family's
 * ranking stage. A `row_number` window shuffles EVERY scored candidate row
 * (corpus × |queries| at 100 TB); this Aggregator runs as an
 * ObjectHashAggregate with partial aggregation, so each map task ships at
 * most k (score, key) pairs per query into the exchange, and the final
 * merge is k-bounded per group.
 *
 * Ordering contract (identical to the window it replaced): score
 * descending, key ascending on ties, compared with
 * `java.lang.Double.compare` semantics — NaN sorts as the LARGEST score
 * and -0.0 < 0.0, exactly Spark's double ordering, so the order is total
 * and merge stays associative even with NaN scores (0/0 cosines).
 * Keys must be numeric (cast to long by the caller).
 */
class TopKByScore(k: Int) extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
  require(k >= 1)

  /** (s1, k1) strictly before (s2, k2) in output order. */
  private def better(s1: Double, k1: Long, s2: Double, k2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2) // total: NaN largest, -0.0 < 0.0
    c > 0 || (c == 0 && k1 < k2)
  }

  /** Insert in place when the buffer already owns capacity-k arrays;
   * `zero`'s shared empty arrays are never mutated (first insert
   * allocates). Aggregator.reduce/merge may mutate and return b. */
  private def insert(b: TopKBuf, s: Double, key: Long): TopKBuf = {
    val n = b.n
    var pos = 0
    while (pos < n && !better(s, key, b.scores(pos), b.keys(pos))) pos += 1
    if (pos >= k) return b
    val target =
      if (b.scores.length == k) b
      else { // first growth: allocate capacity k once, copy live prefix
        val t = TopKBuf(n, new Array[Double](k), new Array[Long](k))
        System.arraycopy(b.scores, 0, t.scores, 0, n)
        System.arraycopy(b.keys, 0, t.keys, 0, n)
        t
      }
    val newN = math.min(n + 1, k)
    val shift = newN - pos - 1 // live entries moving right (drops the last if full)
    if (shift > 0) {
      System.arraycopy(target.scores, pos, target.scores, pos + 1, shift)
      System.arraycopy(target.keys, pos, target.keys, pos + 1, shift)
    }
    target.scores(pos) = s
    target.keys(pos) = key
    if (target.n == newN) target else target.copy(n = newN)
  }

  override def zero: TopKBuf = TopKBuf(0, Array.empty, Array.empty)
  override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = insert(b, in._1, in._2)
  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var r = x
    var i = 0
    while (i < y.n) { r = insert(r, y.scores(i), y.keys(i)); i += 1 }
    r
  }
  override def finish(b: TopKBuf): TopKBuf = // trim to live length for output
    TopKBuf(b.n, b.scores.take(b.n), b.keys.take(b.n))
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKByScore {
  /** Column form: top-k (score desc, key asc) → struct(n, scores, keys). */
  def topK(k: Int)(score: Column, key: Column): Column =
    udaf(new TopKByScore(k)).apply(score, key)
}
