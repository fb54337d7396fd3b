package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    0L -> "a b a b a b a b",          // heavy 2-gram repetition
    1L -> "x y z w v u t s",          // all distinct
    2L -> "dup dup dup dup",          // one token repeated
    3L -> "only",                     // shorter than every gram width
    4L -> "p q p q r p q p q r",      // mixed
    5L -> "")                         // split("") == [""] in both engines

  /** Brute-force mirror of the repetition contract. */
  private def brute(text: String): (Long, Long, Long, Long, Long, Long, Long, Long) = {
    val ts = text.split(" ", -1).toSeq
    def grams(n: Int): Seq[String] =
      if (ts.length < n) Seq.empty else ts.sliding(n).map(_.mkString(" ")).toSeq
    def bp(total: Long, dist: Long): Long = if (total == 0) 0L else (total - dist) * 10000 / total
    val g2 = grams(2); val g3 = grams(3); val g4 = grams(4)
    def topCount(xs: Seq[String]): Long =
      if (xs.isEmpty) 0L else xs.groupBy(identity).values.map(_.size).max.toLong
    (ts.size.toLong, ts.distinct.size.toLong, topCount(ts),
      bp(ts.size, ts.distinct.size),
      bp(g2.size, g2.distinct.size), bp(g3.size, g3.distinct.size),
      bp(g4.size, g4.distinct.size), topCount(g2))
  }

  test("repetition signals match brute force on all shapes") {
    val got = TextAnalysis.repetition(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9)).toMap
    for ((id, text) <- docs) assert(got(id) == brute(text), s"doc $id: '$text'")
  }

  test("known values: alternating pair is 75% duplicate 2-grams") {
    // "a b a b a b a b": 7 2-grams, 2 distinct → (7-2)*10000 div 7 = 7142
    val r = TextAnalysis.repetition(Seq(0L -> "a b a b a b a b").toDF("doc_id", "text"),
        "doc_id", "text")
      .select("dup2_bp", "top_token_count", "top2_count")
      .as[(Long, Long, Long)].head()
    assert(r == ((7142L, 4L, 4L))) // "a b" occurs 4 times, "a" occurs 4 times
  }

  test("repetitionFilter keeps exactly the docs at or under the cutoff") {
    val df = docs.toDF("doc_id", "text")
    val kept = TextAnalysis.repetitionFilter(df, "text", maxDupBp = 5000)
      .select("doc_id").as[Long].collect().toSet
    val want = docs.filter { case (_, t) =>
      val b = brute(t); b._6 <= 5000 // dup3_bp
    }.map(_._1).toSet
    assert(kept == want)
    assert(TextAnalysis.repetitionFilter(df, "text", 10000).count() == docs.size)
  }

  test("repetitionFilter rejects out-of-range cutoffs") {
    val df = docs.toDF("doc_id", "text")
    intercept[IllegalArgumentException] { TextAnalysis.repetitionFilter(df, "text", -1) }
    intercept[IllegalArgumentException] { TextAnalysis.repetitionFilter(df, "text", 10001) }
  }

  // ---- PII ----------------------------------------------------------------

  test("piiStats counts and scrubPii redacts in the contract order") {
    val rows = Seq(
      1L -> "mail a@b.com then 12.34.56.78 and 12345678 again a@b.com",
      2L -> "no pii here just words",
      3L -> "octets 1.2.3.4 stay ipv4 not numbers; 123456 is too short",
      4L -> "user.name+tag@sub.domain.org wrote 999888777666")
    val stats = TextAnalysis.piiStats(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(stats(1L) == ((2L, 1L, 1L)))
    assert(stats(2L) == ((0L, 0L, 0L)))
    assert(stats(3L) == ((0L, 1L, 0L)))
    assert(stats(4L) == ((1L, 0L, 1L)))
    val scrubbed = TextAnalysis.scrubPii(rows.toDF("doc_id", "text"), "text")
      .as[(Long, String)].collect().toMap
    assert(scrubbed(1L) == "mail <EMAIL> then <IPV4> and <NUMBER> again <EMAIL>")
    assert(scrubbed(2L) == "no pii here just words")
    assert(scrubbed(4L) == "<EMAIL> wrote <NUMBER>")
    // email digits are gone before the number pass — no double redaction
    assert(!scrubbed.values.exists(_.contains("<NUM<")))
  }

  test("piiCount rejects unknown categories") {
    intercept[IllegalArgumentException] {
      TextAnalysis.piiCount(org.apache.spark.sql.functions.lit("x"), "ssn")
    }
  }

  // ----- dropBoilerplateLines (the C4/MassiveText line-dedup step) -----

  private def boiler(rows: Seq[(Long, String)], minDocs: Long): Map[Long, (String, Long, Long)] =
    TextAnalysis.dropBoilerplateLines(rows.toDF("doc_id", "text"), "doc_id", "text", minDocs)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("dropBoilerplateLines drops cross-doc lines, keeps order, handles all-boilerplate docs") {
    val rows = Seq(
      10L -> "keep one\ncookie banner\nkeep two",
      11L -> "cookie banner\nfooter (c) corp\nunique eleven",
      12L -> "unique twelve\ncookie banner\nfooter (c) corp",
      13L -> "cookie banner\nfooter (c) corp", // every line boilerplate
      14L -> "solo line stays") // no repetition at all
    val got = boiler(rows, minDocs = 2)
    assert(got(10L) == (("keep one\nkeep two", 2L, 1L)))
    assert(got(11L) == (("unique eleven", 1L, 2L)))
    assert(got(12L) == (("unique twelve", 1L, 2L)))
    assert(got(13L) == (("", 0L, 2L))) // survives as an EMPTY doc, not a lost row
    assert(got(14L) == (("solo line stays", 1L, 0L)))
  }

  test("dropBoilerplateLines counts DISTINCT documents, not occurrences") {
    val rows = Seq(
      20L -> "echo\necho\necho", // 3 occurrences but ONE document
      21L -> "other stuff")
    val got = boiler(rows, minDocs = 2)
    // one doc repeating a line 3x must NOT make it corpus boilerplate
    assert(got(20L) == (("echo\necho\necho", 3L, 0L)))
    // ...but the same line in two docs does
    val got2 = boiler(rows :+ (22L -> "echo\nmore"), minDocs = 2)
    assert(got2(20L) == (("", 0L, 3L)))
    assert(got2(22L) == (("more", 1L, 1L)))
  }

  test("dropBoilerplateLines matches a brute-force reference on a generated corpus") {
    val boilerLines = Seq("nav home about", "copyright 2026 corp", "accept cookies")
    val rnd = new scala.util.Random(42)
    val rows = (0L until 60L).map { i =>
      val own = (0 until 3 + rnd.nextInt(4)).map(j => s"content $i $j ${rnd.nextInt(5)}")
      val injected = boilerLines.filter(_ => rnd.nextBoolean())
      i -> rnd.shuffle(own ++ injected).mkString("\n")
    }
    val minDocs = 5L
    // brute force on the driver
    val lineDocs = rows.flatMap { case (id, t) => t.split("\n", -1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.size }
    val frequent = lineDocs.filter(_._2 >= minDocs).keySet
    val want = rows.map { case (id, t) =>
      val kept = t.split("\n", -1).filterNot(frequent)
      id -> ((kept.mkString("\n"), kept.length.toLong,
        (t.split("\n", -1).length - kept.length).toLong))
    }.toMap
    assert(boiler(rows, minDocs) == want)
    assert(frequent.nonEmpty, "fixture must actually produce boilerplate")
  }

  // ----- surprisal (unigram bit-length quality score) -----

  test("surprisal: rare tokens score high, repeated tokens low, exact integers") {
    // corpus: "the" x12, "rare" x1, others filler -> N=16 tokens
    val rows = Seq(
      1L -> "the the the the the the",   // 6 tokens, all common
      2L -> "the the the the the rare",  // 5 common + 1 rare
      3L -> "a b c d")                   // singletons
    val got = TextAnalysis.surprisal(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // N = 16 -> floorlog2 = 4; count(the)=11 -> fl2=3 -> info 1;
    // singletons (rare, a, b, c, d): count 1 -> info 4
    assert(got(1L) == ((6L, 6L, 10000L)))           // 6 x info(the)=1
    assert(got(2L) == ((6L, 9L, 15000L)))           // 5x1 + 4
    assert(got(3L) == ((4L, 16L, 40000L)))          // 4x4
  }

  test("surprisal matches a brute-force bit-length model on a generated corpus") {
    val rnd = new scala.util.Random(5)
    val vocab = (0 until 30).map(i => s"t$i")
    val rows = (0L until 80L).map { i =>
      i -> Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val all = rows.flatMap(_._2.split(" "))
    val counts = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def fl2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val bigN = all.size.toLong
    val want = rows.map { case (id, t) =>
      val toks = t.split(" ")
      val bits = toks.map(tk => fl2(bigN) - fl2(counts(tk))).sum
      id -> ((toks.length.toLong, bits, bits * 10000L / toks.length))
    }.toMap
    val got = TextAnalysis.surprisal(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want)
  }
}
