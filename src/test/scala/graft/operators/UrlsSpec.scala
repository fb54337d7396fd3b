package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class UrlsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonical(col("u"))).as[String].collect().toSeq

  test("case, default ports, fragments, empty path (RFC 3986 §6.2)") {
    assert(canon(
      "HTTP://Example.COM:80/Path/Sub?q=1#frag",
      "https://EXAMPLE.com:443/",
      "http://example.com",
      "http://example.com:8080/x",     // NON-default port survives
      "https://example.com:80/x"       // 80 is not https's default
    ) == Seq(
      "http://example.com/Path/Sub?q=1", // path case PRESERVED
      "https://example.com/",
      "http://example.com/",
      "http://example.com:8080/x",
      "https://example.com:80/x"))
  }

  test("tracking params drop, survivors sort, bare ? collapses") {
    assert(canon(
      "http://h.io/p?utm_source=tw&b=2&a=1&utm_medium=em",
      "http://h.io/p?a=1&b=2",
      "http://h.io/p?b=2&a=1",
      "http://h.io/p?fbclid=XYZ&gclid=1&msclkid=2",
      "http://h.io/p?",
      "http://h.io/p?utm=keepme" // 'utm' w/o underscore is NOT tracking
    ) == Seq(
      "http://h.io/p?a=1&b=2",
      "http://h.io/p?a=1&b=2",
      "http://h.io/p?a=1&b=2",
      "http://h.io/p",
      "http://h.io/p",
      "http://h.io/p?utm=keepme"))
  }

  test("canonicalization is idempotent") {
    val raw = Seq(
      "HTTP://A.B:80/x/y?utm_source=1&z=9&a=2#f",
      "https://Q.R/",
      "http://s.t/p?gclid=1",
      "http://u.v:8443/w?b=1&a=2")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("query-only and fragment-only urls keep their content params") {
    assert(canon(
      "http://h.io?x=1",          // no path before the query
      "http://h.io/#only-frag"
    ) == Seq(
      "http://h.io/?x=1",
      "http://h.io/"))
  }

  test("canonicalDedup collapses variants and counts raw rows + distinct variants") {
    val df = Seq(
      "http://E.com/a?utm_source=1",
      "HTTP://e.COM:80/a",
      "http://e.com/a#x",
      "http://e.com/a#x", // duplicate RAW row: 4 raws, 3 distinct variants
      "http://e.com/b").toDF("url")
    val got = Urls.canonicalDedup(df, "url")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("http://e.com/a") == ((4L, 3L)))
    assert(got("http://e.com/b") == ((1L, 1L)))
  }

  // ----- robots.txt (RFC 9309) -----

  private def rulesOf(robots: Seq[(String, String)]): Set[(String, String, Boolean)] =
    Urls.robotsRules(robots.toDF("host", "txt"), "host", "txt")
      .as[(String, String, Boolean)].collect().toSet

  test("robotsRules: grouping, comments, case, shared ua blocks, wildcard/empty exclusion") {
    val txt =
      """# site robots
        |Disallow: /orphan          # before any group: dropped per RFC
        |User-agent: googlebot
        |Disallow: /
        |
        |User-Agent: bingbot
        |user-agent: *
        |DISALLOW: /private/        # field names case-insensitive
        |Allow: /private/pub/
        |Disallow:                  # empty = no restriction: dropped
        |Disallow: /tmp/*.log       # wildcard rule: out of scope, dropped
        |Disallow: /cgi$            # $ rule: dropped
        |
        |User-agent: yandex
        |Disallow: /only-yandex
        |""".stripMargin
    assert(rulesOf(Seq("e.com" -> txt)) == Set(
      ("e.com", "/private/", false),
      ("e.com", "/private/pub/", true)))
    // a host whose only group is specific-agent yields no rules at all
    assert(rulesOf(Seq("g.com" -> "User-agent: googlebot\nDisallow: /")) == Set.empty)
  }

  private def fetch(urls: Seq[String], robots: Seq[(String, String)]): Map[String, Boolean] = {
    val rules = Urls.robotsRules(robots.toDF("host", "txt"), "host", "txt")
    Urls.robotsFilter(urls.toDF("url"), "url", rules)
      .select("url", "fetchable").as[(String, Boolean)].collect().toMap
  }

  test("robotsFilter: longest rule wins, allow wins ties, unknown hosts fetchable") {
    val robots = Seq(
      "a.com" -> "User-agent: *\nDisallow: /private/\nAllow: /private/pub/",
      "b.com" -> "User-agent: *\nDisallow: /\n",
      "t.com" -> "User-agent: *\nDisallow: /dir\nAllow: /dir") // tie: allow wins
    val got = fetch(Seq(
      "https://a.com/private/x",      // blocked by /private/
      "https://a.com/private/pub/y",  // longer Allow overrides
      "https://a.com/open",           // no matching rule
      "https://A.COM/private/z#f",    // host case + fragment handled
      "https://b.com/anything",       // Disallow: / blocks all
      "https://b.com",                // empty path -> "/" -> blocked
      "https://t.com/dir/page",       // equal-length rules: allow
      "https://nowhere.com/x"),       // no robots at all
      robots)
    assert(got == Map(
      "https://a.com/private/x" -> false,
      "https://a.com/private/pub/y" -> true,
      "https://a.com/open" -> true,
      "https://A.COM/private/z#f" -> false,
      "https://b.com/anything" -> false,
      "https://b.com" -> false,
      "https://t.com/dir/page" -> true,
      "https://nowhere.com/x" -> true))
    // the decision join is an equi-join on host, never a cartesian
    val rules = Urls.robotsRules(robots.toDF("host", "txt"), "host", "txt")
    val plan = Urls.robotsFilter(Seq("https://a.com/x").toDF("url"), "url", rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("robotsCrawlDelay: star-group only, first parseable value, fractional, absent hosts drop") {
    val robots = Seq(
      "a.com" -> "User-agent: *\nCrawl-Delay: 2\nDisallow: /x\nCrawl-delay: 9",
      "b.com" -> "User-agent: googlebot\nCrawl-delay: 5\n\nUser-agent: *\ncrawl-delay: 1.5",
      "c.com" -> "User-agent: googlebot\nCrawl-delay: 5",      // no * group
      "d.com" -> "User-agent: *\nCrawl-delay: soon\nDisallow: /") // unparseable value
    val got = Urls.robotsCrawlDelay(robots.toDF("host", "txt"), "host", "txt")
      .as[(String, Double)].collect().toMap
    assert(got == Map("a.com" -> 2.0, "b.com" -> 1.5))
  }

  test("latestCapture: variants collapse, newest wins, change flag tracks content not urls") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val caps = Seq(
      // one page, three captures under url variants; content changed once
      ("https://E.com/a?utm_source=t", ts(1), "v1"),
      ("https://e.com/a", ts(2), "v2"),
      ("https://e.com/a#frag", ts(3), "v2"),
      // stable page: two captures, same bytes -> not changed
      ("https://e.com/b", ts(1), "same"),
      ("https://e.com/b?utm_medium=m", ts(2), "same"),
      // single capture
      ("https://e.com/c", ts(1), "only")).toDF("url", "ts", "content")
    val got = Urls.latestCapture(caps, "url", "ts", "content")
      .select("canonical_url", "ts", "content", "n_captures", "changed")
      .as[(String, java.sql.Timestamp, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "https://e.com/a" -> ((ts(3), "v2", 3L, true)),
      "https://e.com/b" -> ((ts(2), "same", 2L, false)),
      "https://e.com/c" -> ((ts(1), "only", 1L, false))))
  }

  test("latestCaptureRejoin equals the payload-carrying form (incl. duplicate captures)") {
    // the 100-TB digest-rejoin path must produce the SAME row set as the
    // payload-through-shuffle form on any (url, ts)-unique input, and the
    // payload-side triple dedup must keep the re-join multiplicity-safe
    // when byte-identical captures repeat exactly (same url, ts, bytes)
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val caps = Seq(
      ("https://E.com/a?utm_source=t", ts(1), "v1"),
      ("https://e.com/a", ts(2), "v2"),
      ("https://e.com/a#frag", ts(3), "v2"),
      ("https://e.com/b", ts(1), "same"),
      ("https://e.com/b?utm_medium=m", ts(2), "same"),
      ("https://e.com/c", ts(1), "only"),
      // exact duplicate capture rows (a crawler wrote the record twice):
      // count them, but the re-join must not multiply the winner
      ("https://e.com/d", ts(4), "dup"),
      ("https://e.com/d", ts(4), "dup")).toDF("url", "ts", "content")
    def run(f: (org.apache.spark.sql.DataFrame, String, String, String) => org.apache.spark.sql.DataFrame) =
      f(caps, "url", "ts", "content")
        .select(col("canonical_url"), col("ts"), col("url"), col("content"),
          col("n_captures") * 10 + col("changed").cast("long"))
        .as[(String, java.sql.Timestamp, String, String, Long)].collect().sorted.toSeq
    val rejoin = run(Urls.latestCaptureRejoin)
    assert(rejoin == run(Urls.latestCapture))
    assert(rejoin.count(_._1 == "https://e.com/d") == 1, "duplicate rows must not multiply")
  }
}
