package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Derive a `pages`-shaped table (BASELINE.json input_hint: url, warc_ts,
 * html BINARY, text, lang) deterministically FROM the driver's
 * `documents` table, using only engine-portable expressions (integer
 * arithmetic + string concat) so a DuckDB oracle can independently
 * compute every derived value — this is what makes the html-extraction
 * pipeline end-to-end checkable by the driver's correctness gate.
 *
 * Template (single line — no inter-tag whitespace, so the only text nodes
 * are title, h1, anchor labels, and the body paragraph):
 *
 *   <!doctype html><html><head><title>Doc {id}</title>
 *   <meta name="geo.position" content="{lat};{lon}">
 *   </head><body><h1>{source}</h1>
 *   {doc_id % 3 anchors: <a href="https://ex.com/{id}/{j}">l{j}</a>}
 *   {if doc_id % 2 == 0: <h2>s{id}</h2>}
 *   <p>{text with & and < escaped}</p></body></html>
 *
 * Coordinates are integer hundredths (sign handled textually) so the
 * string is exactly reproducible in SQL and parses to the identical
 * double in both engines.
 */
object PagesFromDocs {

  /** lat/lon in integer hundredths from doc_id (mirrored in oracle SQL). */
  def latHundredths(id: Column): Column = (id * 7919) % 17000 - 8500
  def lonHundredths(id: Column): Column = (id * 104729) % 36000 - 18000

  /** Signed hundredths → decimal string, e.g. -581 → "-5.81". */
  def coordStr(v: Column): Column = concat(
    when(v < 0, lit("-")).otherwise(lit("")),
    (abs(v) / 100).cast("long").cast("string"),
    lit("."),
    lpad((abs(v) % 100).cast("string"), 2, "0"))

  /** The same derivation as SQL text, for oracle queries. */
  def coordStrSql(v: String): String =
    s"(CASE WHEN $v < 0 THEN '-' ELSE '' END || (abs($v)//100)::VARCHAR || '.' || " +
      s"lpad((abs($v)%100)::VARCHAR, 2, '0'))"
  def latSql(id: String): String = s"(($id * 7919) % 17000 - 8500)"
  def lonSql(id: String): String = s"(($id * 104729) % 36000 - 18000)"

  def htmlString(docId: Column, source: Column, text: Column): Column = {
    val latS = coordStr(latHundredths(docId))
    val lonS = coordStr(lonHundredths(docId))
    val escaped = regexp_replace(regexp_replace(text, "&", "&amp;"), "<", "&lt;")
    // guard: Spark sequence(0, -1) DESCENDS — empty anchor list needs when()
    val anchors = when(docId % 3 > 0, concat_ws("",
      transform(sequence(lit(0), (docId % 3).cast("int") - 1), j =>
        concat(lit("<a href=\"https://ex.com/"), docId, lit("/"), j,
          lit("\">l"), j, lit("</a>")))))
      .otherwise(lit(""))
    val h2 = when(docId % 2 === 0, concat(lit("<h2>s"), docId, lit("</h2>"))).otherwise(lit(""))
    concat(
      lit("<!doctype html><html><head><title>Doc "), docId, lit("</title>"),
      lit("<meta name=\"geo.position\" content=\""), latS, lit(";"), lonS, lit("\">"),
      lit("</head><body><h1>"), source, lit("</h1>"),
      anchors, h2,
      lit("<p>"), escaped, lit("</p></body></html>"))
  }

  /** documents(doc_id, text, lang, source, n_chars) → pages. */
  def apply(documents: DataFrame): DataFrame =
    documents.select(
      concat(lit("https://"), col("source"), lit(".example/"), col("doc_id"), lit(".html")).as("url"),
      (lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).cast("timestamp")).as("warc_ts"),
      htmlString(col("doc_id"), col("source"), col("text")).cast("binary").as("html"),
      col("text"), col("lang"), col("doc_id"))
}
