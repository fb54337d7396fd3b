package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a web-scale training-data pipeline, built
 * purely from codegen'd `functions._` (no UDFs — SURVEY §2.11 discipline).
 * Each operator mirrors a reference semantics class:
 *  - textSearch   ← find_text per-line scan (reference: tools/search.py:12-136)
 *  - sliceLines   ← get_file start_line/max_lines slicing (file_operations.py:77-173)
 *  - lineStats    ← complexity line counts (analysis.py:803-927)
 *  - langId/quality/tokenCount/fingerprint ← the training-data additions
 *    (driver instructions), all with exact SQL-oracle equivalents.
 */
object TextAnalysis {

  /** Whitespace tokens. Mirrors DuckDB string_split(text, ' '). */
  def tokens(text: Column): Column = split(text, " ")

  /** Sorted distinct word 3-gram shingles (the dedup/similarity unit).
   * Guard: Spark's sequence(1,0) DESCENDS, so short docs get array().
   * DuckDB mirror: list_sort(list_distinct(list_transform(
   *   generate_series(1, greatest(len(ts)-2,0)), i -> …))).
   *
   * PERF: call shinglesOf over a MATERIALIZED token column. Higher-order
   * functions are interpreted (no codegen, no subexpression elimination),
   * so element_at(split(text), i) inside the lambda re-splits the text per
   * element — O(n²) splits per row (measured 10× slowdown on dedup ops).
   * A column reference makes it O(1) per element. */
  def shingles(text: Column): Column = shinglesOf(tokens(text))

  def shinglesOf(ts: Column): Column = ngramsOf(ts, 3)

  /** Sorted distinct word n-grams over a MATERIALIZED token column (see
   * the perf note on [[shingles]] — never pass `tokens(text)` inline).
   * Same guards as the 3-gram form: `sequence(1, 0)` DESCENDS in Spark,
   * so rows shorter than n tokens take the explicit empty branch. */
  def ngramsOf(ts: Column, n: Int): Column = {
    require(n >= 1, s"n-gram width must be >= 1 (got $n)")
    array_sort(array_distinct(
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(j => element_at(ts, i + j)): _*)))
        .otherwise(array().cast("array<string>"))))
  }

  /** Per-line search hits: (key, line, line_text) for lines containing
   * `term`. Modes mirror the reference: plain contains / case-insensitive /
   * whole-word / raw regex (reference: search.py:19,43-84 — find_text's
   * use_regex flag compiles with re.IGNORECASE when case-insensitive).
   *
   * Regex dialect contract (SURVEY §2.10): patterns must stay inside the
   * portable subset — literal chars, char classes, `. * + ? | ( ) { }`
   * quantifiers and anchors — which behaves identically in Java regex,
   * RE2 (DuckDB) and Python re. No inline flags, backreferences or
   * lookaround (Java-only features would silently diverge from the
   * reference's `re`). */
  def textSearch(df: DataFrame, key: String, text: String, term: String,
      caseInsensitive: Boolean = false, wholeWord: Boolean = false,
      regex: Boolean = false, maxPerKey: Int = Int.MaxValue): DataFrame = {
    require(!(wholeWord && regex),
      "wholeWord and regex are mutually exclusive: in regex mode put \\b in the pattern")
    val lines = df.select(col(key),
      posexplode(split(col(text), "\n")).as(Seq("line0", "line_text")))
      .withColumn("line", (col("line0") + 1).cast("long")).drop("line0")
    val hit =
      if (regex)
        col("line_text").rlike(if (caseInsensitive) "(?i)" + term else term)
      else if (wholeWord)
        // the reference compiles \b…\b WITH re.IGNORECASE when both flags
        // are set (tools/search.py:52-54) — mirror it with (?i)
        col("line_text").rlike((if (caseInsensitive) "(?i)" else "") +
          "\\b" + java.util.regex.Pattern.quote(term) + "\\b")
      else if (caseInsensitive) lower(col("line_text")).contains(term.toLowerCase)
      else col("line_text").contains(term)
    val hits = lines.where(hit)
    // per-document result budget (reference: per-file max_results break,
    // search.py:111-112) — first maxPerKey hits in line order per key
    if (maxPerKey == Int.MaxValue) hits
    else hits.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(key).orderBy("line")))
      .where(col("__rn") <= maxPerKey).drop("__rn")
  }

  /** Count of matching lines per doc — the aggregate flavour used when the
   * per-line fan-out isn't wanted. DuckDB mirror: len(list_filter(...)). */
  def matchLineCount(df: DataFrame, key: String, text: String, term: String): DataFrame =
    df.select(col(key),
      size(filter(split(col(text), "\n"), l => l.contains(term))).cast("long").as("n_match"))

  /** Lines [start, start+n) re-joined (reference get_file slicing). */
  def sliceLines(df: DataFrame, key: String, text: String, start: Int, n: Int): DataFrame =
    df.select(col(key),
      concat_ws("\n", slice(split(col(text), "\n"), start + 1, n)).as("sliced"))

  /** Language ID by stopword voting. Deterministic tie-break: language
   * list order. Output (key, pred_lang, best_score). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de"))

  def langId(df: DataFrame, key: String, text: String): DataFrame = {
    val ts = tokens(lower(col(text)))
    val scored = LangStopwords.foldLeft(df.select(col(key), ts.as("__ts"))) {
      case (acc, (lang, sw)) =>
        acc.withColumn(s"__s_$lang",
          size(filter(col("__ts"), t => t.isInCollection(sw))).cast("long"))
    }
    val best = LangStopwords.map { case (l, _) => col(s"__s_$l") }.reduce(greatest(_, _))
    // right-fold so the FIRST language in list order wins ties
    val pred = LangStopwords.foldRight(lit("und")) { case ((l, _), other) =>
      when(col(s"__s_$l") === best && best > 0, lit(l)).otherwise(other)
    }
    scored.select(col(key), pred.as("pred_lang"), best.as("best_score"))
  }

  /** Quality score: token count, mean token length, stopword ratio,
   * uppercase ratio — all exact integer/4-dp arithmetic. */
  def quality(df: DataFrame, key: String, text: String): DataFrame = {
    val sw = LangStopwords.flatMap(_._2).distinct
    df.select(col(key), col(text), tokens(lower(col(text))).as("__lts"))
      .select(col(key),
        size(tokens(col(text))).cast("long").as("n_tokens"),
        length(col(text)).cast("long").as("n_chars"),
        round(length(col(text)).cast("double") / size(tokens(col(text))), 4).as("mean_token_len"),
        round(size(filter(col("__lts"), t => t.isInCollection(sw))).cast("double")
          / size(tokens(col(text))), 4).as("stopword_ratio"))
  }

  /** Token counts: whitespace + regex word-ish (BPE-ish proxy). */
  def tokenCount(df: DataFrame, key: String, text: String): DataFrame =
    df.select(col(key),
      size(tokens(col(text))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(text), lit("[a-z]+|[0-9]+"), lit(0))).cast("long").as("re_tokens"))

  /** Rolling polynomial fingerprint over tokens, mod 1e9+7. Exactly
   * mirrors DuckDB list_reduce with a '0' sentinel head (both sides fold
   * left over the same token sequence with the same integer ops). */
  def fingerprint(df: DataFrame, key: String, text: String): DataFrame =
    df.select(col(key),
      aggregate(tokens(col(text)), lit(0L),
        (acc, t) => pmod(acc * 31 + length(t).cast("long") * 7 + ascii(substring(t, 1, 1)).cast("long"),
          lit(1000000007L))).as("fp"))
}
