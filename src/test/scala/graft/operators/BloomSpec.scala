package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.BloomOps
import graft.functions.SparkTestSession

class BloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // ----- kernel laws (no Spark) -----

  test("kernel: zero false negatives, bounded false positives") {
    val numBits = BloomOps.sizeBits(10000, 10)
    val words = new Array[Long](numBits >>> 6)
    val keys = (0 until 10000).map(i => BloomOps.mix(i.toLong * 7919 + 13))
    keys.foreach(h => BloomOps.add(words, numBits, 7, h))
    val bytes = BloomOps.toBytes(words, numBits, 7)
    assert(keys.forall(h => BloomOps.mightContain(bytes, h)), "false negative!")
    // disjoint probe set (different generator stream)
    val probes = (0 until 20000).map(i => BloomOps.mix(Long.MaxValue - i.toLong * 104729))
    val fp = probes.count(h => BloomOps.mightContain(bytes, h))
    assert(fp.toDouble / probes.size < 0.03,
      s"FPR ${fp.toDouble / probes.size} exceeds 3% at 10 bits/key")
  }

  test("kernel: serialization round-trips and sizeBits is a power of two") {
    val numBits = BloomOps.sizeBits(100, 10)
    assert((numBits & (numBits - 1)) == 0 && numBits >= 1024)
    val words = new Array[Long](numBits >>> 6)
    (1L to 50L).foreach(h => BloomOps.add(words, numBits, 5, h))
    val bytes = BloomOps.toBytes(words, numBits, 5)
    val (w2, nb2, nh2) = BloomOps.fromBytes(bytes)
    assert(nb2 == numBits && nh2 == 5 && java.util.Arrays.equals(w2, words))
    assert(java.util.Arrays.equals(BloomOps.toBytes(w2, nb2, nh2), bytes))
  }

  // ----- aggregate laws -----

  private val numBits = BloomOps.sizeBits(2000, 10)

  private def bloomOf(df: DataFrame, keyCol: String): Array[Byte] =
    df.agg(Bloom.bloomAgg(xxhash64(col(keyCol)), numBits).as("bf"))
      .as[Array[Byte]].head()

  test("aggregate merge law: bloom(A union B) == bloom(A) OR bloom(B)") {
    val a = spark.range(0, 1000).select(concat(lit("k"), col("id")).as("k"))
    val b = spark.range(800, 1700).select(concat(lit("k"), col("id")).as("k"))
    val union = bloomOf(a.union(b), "k")
    val (wa, nb, nh) = BloomOps.fromBytes(bloomOf(a, "k"))
    val (wb, _, _) = BloomOps.fromBytes(bloomOf(b, "k"))
    val ored = wa.zip(wb).map { case (x, y) => x | y }
    assert(java.util.Arrays.equals(BloomOps.toBytes(ored, nb, nh), union))
  }

  test("aggregate is partitioning-invariant (map-side partials OR exactly)") {
    val df = spark.range(0, 3000).select(concat(lit("v"), col("id")).as("k"))
    val one = bloomOf(df.coalesce(1), "k")
    val many = bloomOf(df.repartition(13), "k")
    assert(java.util.Arrays.equals(one, many))
  }

  // ----- prunedSemiJoin: result identity + actual pruning -----

  private lazy val big = spark.range(0, 50000).select(
    (col("id") % 5000).as("k"), (col("id") * 31 % 997).as("payload"))
  // selective dimension: 2% of the big side's key space
  private lazy val small = spark.range(0, 100).select((col("id") * 50).as("sk"))

  test("prunedSemiJoin == plain left-semi join, bit for bit") {
    val got = Bloom.prunedSemiJoin(big, "k", small, "sk", expectedKeys = 100)
      .orderBy("k", "payload").collect()
    val want = big.join(small, big("k") === small("sk"), "left_semi")
      .orderBy("k", "payload").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("the bloom prefilter actually prunes (and never loses a match)") {
    val bf = small.agg(Bloom.bloomAgg(xxhash64(col("sk")), numBits).as("__bf"))
    val survivors = big.join(broadcast(bf))
      .where(Bloom.mightContain(col("__bf"), xxhash64(col("k"))))
    val nSurvive = survivors.count()
    val nMatch = big.join(small, big("k") === small("sk"), "left_semi").count()
    val nBig = big.count()
    assert(nSurvive >= nMatch, "bloom lost a true match (false negative)")
    // 100/5000 keys match → ~1% + FPR; anything under 10% proves pruning
    assert(nSurvive < nBig / 10,
      s"bloom pruned nothing: $nSurvive of $nBig survived")
  }

  test("null keys on either side neither crash nor leak into the result") {
    val bigN = big.select(when(col("k") === 17, lit(null)).otherwise(col("k")).as("k"),
      col("payload"))
    val smallN = small.union(Seq.empty[Long].toDF("sk")) // keep types
      .select(when(col("sk") === 50, lit(null)).otherwise(col("sk")).as("sk"))
    val got = Bloom.prunedSemiJoin(bigN, "k", smallN, "sk", expectedKeys = 100)
      .orderBy("k", "payload").collect()
    val want = bigN.join(smallN, bigN("k") === smallN("sk"), "left_semi")
      .orderBy("k", "payload").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("plan: probe stays in the big side's codegen span before the join") {
    val plan = Bloom.prunedSemiJoin(big, "k", small, "sk", expectedKeys = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"))
    // the exact semi join is still there to kill false positives
    assert(plan.contains("LeftSemi"))
  }
}
