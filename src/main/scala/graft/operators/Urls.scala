package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization — the first dedup key of every web corpus (crawls
 * see the same page under case-shuffled hosts, default ports, fragment
 * anchors, tracking parameters and permuted query strings; Common Crawl
 * dedups on a canonical form for exactly this reason).
 *
 * Canonical form, applied in order:
 *  1. drop the fragment (`#…` — client-side only, never reaches the
 *     server);
 *  2. lowercase scheme and host (RFC 3986 §6.2.2.1 case normalization;
 *     path/query stay case-SENSITIVE);
 *  3. drop an explicit default port (`:80` for http, `:443` for https —
 *     RFC 3986 §6.2.3 scheme-based normalization);
 *  4. empty path → `/` (same section);
 *  5. drop tracking parameters (`utm_*`, `fbclid`, `gclid`, `msclkid` —
 *     analytics decoration, not content identity) and sort the survivors
 *     byte-wise, so parameter permutations collapse.
 *
 * Everything is built from codegen'd string/array builtins in the
 * PORTABLE subset (substring_index/split_part, substr, one anchored
 * regexp, list filter/sort/join) — a scan-side projection, no UDF, no
 * shuffle, and an exact DuckDB mirror for the oracle.
 */
object Urls {

  /** Query parameters stripped by [[canonical]]: pure tracking
   * decoration. Prefix match for utm_, exact name match for click ids. */
  val TrackingPrefixes: Seq[String] = Seq("utm_")
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid")

  private def isTracking(p: Column): Column = {
    val name = substring_index(p, "=", 1)
    (TrackingPrefixes.map(pre => p.startsWith(pre)) ++
      TrackingParams.map(t => name === t))
      .reduce(_ || _)
  }

  /** Canonical form of `url` (must be scheme://host… shaped; rows that
   * aren't URLs pass through the string ops unharmed but get no
   * guarantees — gate upstream, as Engine.securityGate does). */
  def canonical(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    // after "://" — the lowered scheme has the raw scheme's length
    val rest = noFrag.substr(length(scheme) + 4, length(noFrag))
    val hostPort = lower(regexp_extract(rest, "^[^/?]*", 0))
    val host = when(scheme === "http" && hostPort.endsWith(":80"),
        hostPort.substr(lit(1), length(hostPort) - 3))
      .when(scheme === "https" && hostPort.endsWith(":443"),
        hostPort.substr(lit(1), length(hostPort) - 4))
      .otherwise(hostPort)
    val pathQuery = rest.substr(length(hostPort) + 1, length(rest))
    val path0 = substring_index(pathQuery, "?", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = when(pathQuery.contains("?"),
      pathQuery.substr(length(path0) + 2, length(pathQuery))).otherwise(lit(""))
    val params = filter(split(query, "&"), p => p =!= "" && !isTracking(p))
    val sortedQuery = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQuery === "", lit("")).otherwise(concat(lit("?"), sortedQuery)))
  }

  /** Per-canonical-URL census — how many raw variants collapse onto each
   * canonical form (the dedup key census a crawl runs before fetch). */
  def canonicalDedup(df: DataFrame, url: String): DataFrame =
    df.groupBy(canonical(col(url)).as("canonical_url"))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col(url)).as("n_variants"))
}
