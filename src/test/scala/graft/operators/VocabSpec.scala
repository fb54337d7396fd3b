package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class VocabSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    0L -> "a b a c a",
    1L -> "b c d",
    2L -> "e",
    3L -> "a a")

  test("vocabulary: top-V by (freq desc, term asc), deterministic under ties") {
    val want = docs.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map { case (t, ts) => (t, ts.size.toLong) }.toSeq
      .sortBy { case (t, f) => (-f, t) }
    val got = Vocab.vocabulary(docs.toDF("doc_id", "text"), "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(got.toSet == want.take(3).toSet)
    // b and c tie at 2: term order must pick b before c at the cut
    val top4 = Vocab.vocabulary(docs.toDF("doc_id", "text"), "text", 4)
      .as[(String, Long)].collect().toSet
    assert(top4 == want.take(4).toSet)
    assert(top4.map(_._1).contains("b") && top4.map(_._1).contains("c"))
  }

  /** Brute co-occurrence mirror. */
  private def bruteCo(w: Int): Map[String, Long] =
    docs.flatMap { case (_, t) =>
      val ts = t.split(" ", -1)
      for {
        i <- ts.indices
        j <- (i + 1) until math.min(i + w + 1, ts.length)
      } yield if (ts(i) <= ts(j)) s"${ts(i)} ${ts(j)}" else s"${ts(j)} ${ts(i)}"
    }.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }

  test("cooccurrence matches brute force for several windows; minCount filters") {
    for (w <- Seq(1, 2, 5)) {
      val got = Vocab.cooccurrence(docs.toDF("doc_id", "text"), "text", w)
        .as[(String, Long)].collect().toMap
      assert(got == bruteCo(w), s"window=$w")
    }
    val filtered = Vocab.cooccurrence(docs.toDF("doc_id", "text"), "text", 2, minCount = 2)
      .as[(String, Long)].collect().toMap
    assert(filtered == bruteCo(2).filter(_._2 >= 2))
    // equal-token pairs count ("a a" from doc 3 and within-window doc 0)
    assert(bruteCo(2).contains("a a"))
  }

  test("single-token and empty-ish docs produce no pairs; bad args rejected") {
    val lone = Seq(0L -> "x").toDF("doc_id", "text")
    assert(Vocab.cooccurrence(lone, "text", 3).count() == 0)
    intercept[IllegalArgumentException] { Vocab.cooccurrence(lone, "text", 0) }
    intercept[IllegalArgumentException] { Vocab.vocabulary(lone, "text", 0) }
  }
}
