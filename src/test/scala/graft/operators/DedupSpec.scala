package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("simhashPairs plans hash equi-joins only (no nested-loop/cartesian)") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("simhashPairs banding is recall-complete: equals brute force at hamming <= maxHamming") {
    val small = docs.where(col("doc_id") < 80)
    for (maxHamming <- Seq(1, 3, 4)) {
      val banded = Dedup.simhashPairs(small, "doc_id", "text", maxHamming)
        .select("key_a", "key_b", "hamming").as[(Long, Long, Long)].collect().toSet
      val sh = Dedup.simhash(small, "doc_id", "text")
      val a = sh.select(col("doc_id").as("ka"), col("simhash").as("sa"))
      val b = sh.select(col("doc_id").as("kb"), col("simhash").as("sb"))
      val brute = a.crossJoin(b).where(col("ka") < col("kb"))
        .select(col("ka"), col("kb"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("h"))
        .where(col("h") <= maxHamming)
        .as[(Long, Long, Long)].collect().toSet
      assert(banded == brute, s"maxHamming=$maxHamming: ${banded.size} vs ${brute.size}")
    }
  }

  test("simhashPairs64 recall-complete and banding join is hash-only") {
    val small = docs.where(col("doc_id") < 80)
    val banded = Dedup.simhashPairs64(small, "doc_id", "text", maxHamming = 3)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val got = banded.select("key_a", "key_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val sh = Dedup.simhash64(small, "doc_id", "text")
    val a = sh.select(col("doc_id").as("ka"), col("simhash").as("sa"))
    val b = sh.select(col("doc_id").as("kb"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).where(col("ka") < col("kb"))
      .select(col("ka"), col("kb"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("h"))
      .where(col("h") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    // 64-bit signatures use all four nibbles' worth of bit sources: the
    // high 32 bits must not be degenerate
    val nonZeroHigh = sh.where(shiftright(col("simhash"), 32) =!= 0).count()
    assert(nonZeroHigh > 0)
  }

  test("ngramJaccard df-cap drops hot shingles (no quadratic hot-key blowup)") {
    // 40 docs sharing one stop-shingle; pairs (i, i+1) additionally share a
    // rare shingle. Uncapped: the stop-shingle alone pairs all 40*39/2 docs.
    val stop = "the quick fox"
    val rows = (0L until 40L).map { i =>
      val rare = s"rare$i token${i} tail${i} rare${i + 1} token${i + 1} tail${i + 1}"
      (i, s"$stop $rare")
    }
    val df = rows.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(df, "doc_id", "text", threshold = 0.0001)
    assert(uncapped.count() == 40L * 39 / 2) // the blowup the cap prevents
    val capped = Dedup.ngramJaccard(df, "doc_id", "text", threshold = 0.0001, maxDocFreq = 5)
    val pairs = capped.select("key_a", "key_b").as[(Long, Long)].collect().toSet
    // only the engineered rare-shingle overlaps survive: shingles spanning
    // the "rare$i …" suffix of doc i and prefix of doc i+1 do not exist
    // (separate docs), but docs i and i+1 share the 3-gram built from
    // "rare${i+1} token${i+1} tail${i+1}" present verbatim in both texts
    assert(pairs == (0L until 39L).map(i => (i, i + 1)).toSet)
  }

  test("components: transitive closure over pairs (chain diameter > 1)") {
    // two components: a 4-chain {1-2, 2-3, 3-4} (diameter 3 — needs >1
    // propagation round) and an isolated pair {10-11}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("key_a", "key_b")
    val comp = Dedup.components(pairs, "key_a", "key_b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    val drops = Dedup.dropKeys(pairs, "key_a", "key_b")
      .as[(Long, Long)].collect().toSet
    assert(drops == Set((2L, 1L), (3L, 1L), (4L, 1L), (11L, 10L)))
  }

  test("components: pointer jumping converges fast on a long chain") {
    // a 64-link drift chain (diameter 64): 1-hop propagation alone would
    // need 64 driver rounds; with label-of-label jumping this stays small
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("key_a", "key_b")
    val t0 = System.nanoTime()
    val comp = Dedup.components(chain, "key_a", "key_b").as[(Long, Long)].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(comp == (1L to 64L).map(_ -> 1L).toMap)
    assert(secs < 60, s"chain CC took ${secs}s — pointer jumping regressed?")
  }

  test("ngramJaccard capped jaccard uses full set sizes (lower bound contract)") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y")).toDF("doc_id", "text")
    // shingles doc1: {a b c, b c d, c d e, d e f}; doc2: {a b c, b c d, c d x, d x y}
    // shared = 2, union = 6 → jaccard = 0.3333 regardless of cap (df of all = <= 2)
    val r = Dedup.ngramJaccard(df, "doc_id", "text", 0.1, maxDocFreq = 10)
      .select("jaccard").as[Double].collect()
    assert(r.toSeq == Seq(0.3333))
  }
}
