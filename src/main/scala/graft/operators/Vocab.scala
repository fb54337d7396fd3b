package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Vocabulary and co-occurrence statistics over the corpus — the two
 * corpus passes that precede tokenizer training and embedding training
 * in an LLM data pipeline (term frequencies → top-V vocabulary;
 * windowed co-occurrence counts → PMI/word-vector inputs).
 *
 * Scale shapes:
 *  - [[vocabulary]]: explode → partial-aggregated count per term (one
 *    narrow (term, n) shuffle) → global top-V as TakeOrderedAndProject
 *    (each partition forwards V rows; no single-partition global sort).
 *    Ordering (freq desc, term asc) is total, so the cut is
 *    deterministic under ties — the property that makes a vocabulary
 *    reproducible run-to-run.
 *  - [[cooccurrence]]: pairs are generated PER ROW inside an array
 *    expression (O(len·window) per doc, bounded by the doc itself) and
 *    only then exploded into the (pair, n) aggregation — no positional
 *    self-join, no range-join blowup; the exchange carries canonical
 *    `(min_term ++ ' ' ++ max_term, count)` partial aggregates whose
 *    cardinality is bounded by vocabulary², not corpus size.
 */
object Vocab {

  /** Top-V terms by corpus frequency: `(term, freq)`, the deterministic
   * (freq desc, term asc) prefix. */
  def vocabulary(docs: DataFrame, textCol: String, topV: Int): DataFrame = {
    require(topV >= 1, s"topV must be >= 1 (got $topV)")
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(topV)
  }

  /**
   * Unordered within-`window` co-occurrence counts: `(pair, n)` where
   * pair = `least(a,b) ++ ' ' ++ greatest(a,b)` for token positions at
   * distance 1..window inside the same document, n ≥ `minCount`.
   * Overlap semantics: every qualifying position pair counts (the
   * word2vec/GloVe accumulation rule), including equal tokens.
   */
  def cooccurrence(docs: DataFrame, textCol: String, window: Int,
      minCount: Long = 1L): DataFrame = {
    require(window >= 1, s"window must be >= 1 (got $window)")
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    // inner sequence bounds: i ≤ n−1 ⇒ i+1 ≤ n and i+1 ≤ least(i+window, n)
    // — always ascending; only the outer sequence needs the n ≥ 2 guard
    // (sequence(1, 0) DESCENDS in Spark)
    val ts = col("__ts")
    val pairs = when(size(ts) >= 2,
      flatten(transform(sequence(lit(1), size(ts) - 1), i =>
        transform(sequence(i + 1, least(i + window, size(ts))), j =>
          concat_ws(" ",
            least(element_at(ts, i), element_at(ts, j)),
            greatest(element_at(ts, i), element_at(ts, j)))))))
      .otherwise(array().cast("array<string>"))
    docs.select(TextAnalysis.tokens(col(textCol)).as("__ts"))
      .select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
