package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.{extract_text_bytes, SparkTestSession}

/**
 * FIXTURES.md F4: committed html byte cases + expected extracted bytes
 * (generated once by the kernel, hand-reviewed — see the commit). Pins
 * the per-url byte-identity invariant (BASELINE.json input_hint) against
 * regressions, both for the pure kernel and through the full Catalyst
 * pipeline (BinaryType end-to-end).
 */
class ByteIdentitySpec extends AnyFunSuite {
  private def res(name: String): Array[Byte] =
    getClass.getResourceAsStream(s"/byteid/html/$name").readAllBytes()

  private lazy val names: Seq[String] =
    new String(res("MANIFEST"), "UTF-8").linesIterator.filter(_.nonEmpty).toSeq

  test("kernel output is byte-identical to the committed corpus (30 cases)") {
    assert(names.size == 30)
    names.foreach { n =>
      val got = Extractor.extractTextBytes(res(s"$n.html"))
      assert(got.sameElements(res(s"$n.expected")), s"case $n")
    }
  }

  test("the Catalyst pipeline preserves every byte (BinaryType end-to-end)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = names.map(n => (n, res(s"$n.html"))).toDF("name", "html")
      .select(col("name"), extract_text_bytes(col("html")).as("t"))
    val got = df.as[(String, Array[Byte])].collect().toMap
    names.foreach { n =>
      assert(got(n).sameElements(res(s"$n.expected")), s"case $n through Catalyst")
    }
  }
}
