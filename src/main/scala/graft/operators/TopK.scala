package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k buffer: scores/keys kept sorted by (score desc, key asc),
 * never longer than k. A flat pair of primitive arrays so the buffer
 * encoder is a cheap product encoder (no Kryo).
 */
case class TopKBuf(scores: Array[Double], keys: Array[Long])

/**
 * Map-side partial top-k aggregation — the scale fix for the ANN family's
 * ranking stage. A `row_number` window shuffles EVERY scored candidate row
 * (corpus × |queries| at 100 TB); this Aggregator runs as an
 * ObjectHashAggregate with partial aggregation, so each map task ships at
 * most k (score, key) pairs per query into the exchange, and the final
 * merge is k-bounded per group.
 *
 * Ordering contract (identical to the window it replaces): score
 * descending, key ascending on ties — a total, deterministic order given
 * distinct keys. Keys must be numeric (cast to long by the caller).
 */
class TopKByScore(k: Int) extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
  require(k >= 1)

  private def better(s1: Double, k1: Long, s2: Double, k2: Long): Boolean =
    s1 > s2 || (s1 == s2 && k1 < k2)

  private def insert(b: TopKBuf, s: Double, key: Long): TopKBuf = {
    val n = b.scores.length
    var pos = 0
    while (pos < n && !better(s, key, b.scores(pos), b.keys(pos))) pos += 1
    if (pos >= k) return b
    val m = math.min(n + 1, k)
    val ss = new Array[Double](m)
    val kk = new Array[Long](m)
    System.arraycopy(b.scores, 0, ss, 0, pos)
    System.arraycopy(b.keys, 0, kk, 0, pos)
    ss(pos) = s
    kk(pos) = key
    val rest = math.min(n - pos, m - pos - 1)
    if (rest > 0) {
      System.arraycopy(b.scores, pos, ss, pos + 1, rest)
      System.arraycopy(b.keys, pos, kk, pos + 1, rest)
    }
    TopKBuf(ss, kk)
  }

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)
  override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = insert(b, in._1, in._2)
  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var r = x
    var i = 0
    while (i < y.scores.length) { r = insert(r, y.scores(i), y.keys(i)); i += 1 }
    r
  }
  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKByScore {
  /** Column form: top-k (score desc, key asc) → struct(scores, keys). */
  def topK(k: Int)(score: Column, key: Column): Column =
    udaf(new TopKByScore(k)).apply(score, key)
}
