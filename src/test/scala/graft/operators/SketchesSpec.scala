package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** The portable hash, recomputed independently: first 13 hex chars of
   * the md5 of the UTF-8 string, as a 52-bit long. */
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  /** Reference KMV on the driver. */
  private def refKmv(values: Seq[String], k: Int): (Long, Long) = {
    val hs = values.map(refHash).distinct.sorted
    val live = math.min(hs.size, k).toLong
    val est =
      if (hs.size < k) hs.size.toLong
      else ((k - 1).toLong * (1L << Sketches.HashBits)) / hs(k - 1)
    (live, est)
  }

  // three groups: tiny (< k), medium, large — deterministic values
  private lazy val df = spark.range(0, 30000).select(
    when(col("id") % 100 === 0, "tiny")
      .when(col("id") % 3 === 0, "medium").otherwise("large").as("g"),
    // tiny: 5 distinct; medium: 200 distinct; large: 6000 distinct
    when(col("id") % 100 === 0, concat(lit("t"), pmod(col("id"), lit(500)).cast("string")))
      .when(col("id") % 3 === 0, concat(lit("m"), pmod(col("id"), lit(600)).cast("string")))
      .otherwise(concat(lit("l"), pmod(col("id"), lit(9000)).cast("string"))).as("v"))

  private def groupValues(g: String): Seq[String] =
    df.where(col("g") === g).select("v").as[String].collect().distinct.toSeq

  for (k <- Seq(16, 40)) { // 16 = declarative TopKSlots path, 40 = imperative
    test(s"kmvDistinct(k=$k) matches the reference KMV per group") {
      val got = Sketches.kmvDistinct(df, Seq("g"), "v", k)
        .select("g", "distinct_hashes", "est_distinct")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got.keySet == Set("tiny", "medium", "large"))
      for (g <- got.keySet) {
        val want = refKmv(groupValues(g), k)
        assert(got(g) == want, s"group $g: got ${got(g)}, want $want")
      }
      // tiny group is exact (sketch not full)
      assert(got("tiny") == ((5L, 5L)))
    }
  }

  test("the estimate is statistically sane on the large group") {
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", 16)
      .where(col("g") === "large")
      .select("est_distinct").as[Long].head()
    val truth = groupValues("large").size.toLong
    assert(est > truth / 2 && est < truth * 2,
      s"KMV(16) estimate $est implausible for true $truth")
  }

  test("estimates are partitioning-invariant (sketches merge associatively)") {
    val a = Sketches.kmvDistinct(df.repartition(1), Seq("g"), "v", 16)
      .select("g", "est_distinct").as[(String, Long)].collect().toMap
    val b = Sketches.kmvDistinct(df.repartition(13, col("v")), Seq("g"), "v", 16)
      .select("g", "est_distinct").as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("kmvMerge of per-group sketches equals the direct coarse sketch exactly") {
    val fine = Sketches.kmvSketch(df, Seq("g"), "v", 16)
    // global rollup == direct global estimate, bit for bit
    val merged = Sketches.kmvMerge(fine, Seq.empty, 16)
      .select("distinct_hashes", "est_distinct").as[(Long, Long)].head()
    val direct = Sketches.kmvDistinct(df, Seq.empty, "v", 16)
      .select("distinct_hashes", "est_distinct").as[(Long, Long)].head()
    assert(merged == direct)
    // identity rollup (same grouping) reproduces the per-group estimates
    val ident = Sketches.kmvMerge(fine, Seq("g"), 16)
      .select("g", "distinct_hashes", "est_distinct")
      .as[(String, Long, Long)].collect().toSet
    val orig = Sketches.kmvDistinct(df, Seq("g"), "v", 16)
      .select("g", "distinct_hashes", "est_distinct")
      .as[(String, Long, Long)].collect().toSet
    assert(ident == orig)
  }

  test("kmvMerge is exact when fine sketches are LARGER than the coarse k") {
    val fine = Sketches.kmvSketch(df, Seq("g"), "v", 40) // imperative path
    val merged = Sketches.kmvMerge(fine, Seq.empty, 16)
      .select("distinct_hashes", "est_distinct").as[(Long, Long)].head()
    val direct = Sketches.kmvDistinct(df, Seq.empty, "v", 16)
      .select("distinct_hashes", "est_distinct").as[(Long, Long)].head()
    assert(merged == direct)
  }

  test("portableHash52 column form equals the independent reference hash") {
    val vals = Seq("", "a", "hello world", "Doc 42", "ünïcode ✓")
    val got = vals.toDF("v").select(Sketches.portableHash52(col("v")))
      .as[Long].collect().toSeq
    assert(got == vals.map(refHash))
  }
}
