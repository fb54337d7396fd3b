package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for web-scale corpora (driver instructions:
 * first-class training-data-pipeline components). All are pure
 * `functions._` compositions (codegen'd, shuffle-minimal):
 *
 *  - exact          one hash-groupBy; shuffles 16-byte digests, not text
 *  - minhashLsh     the canonical scale path: shingle → per-band min-hash
 *                   (partial agg!) → bucket equi-join → exact-Jaccard verify.
 *                   Same two-phase block+verify shape as the spatial join
 *                   (reference analogue: find_similar_code fingerprint
 *                   containment, tools/search.py:401-501)
 *  - simhash        16-bit majority-vote signature + banded hamming pairs
 *  - ngramJaccard   direct all-pairs on a blocking key (small corpora)
 *  - embeddingCosine near-dup by vector similarity (see Similarity)
 *
 * Hash discipline: only md5 (hex string) is used — identical bytes-in/
 * hex-out in Spark and DuckDB, so every operator has an exact SQL oracle.
 */
object Dedup {

  /** Exact duplicates: groups with >1 row by md5(text). Output one row per
   * duplicate group: (digest, n, keep_key = min key). */
  def exact(df: DataFrame, key: String, text: String): DataFrame =
    df.groupBy(md5(col(text).cast("binary")).as("digest"))
      .agg(count(lit(1)).as("n"), min(col(key)).as("keep_key"))
      .where(col("n") > 1)

  /** MinHash signature matrix, long form: (key, h_idx, min_hash). Shuffle
   * is (key, h_idx)-partial-aggregated map-side — the scalable shape. */
  def minhashLong(df: DataFrame, key: String, text: String, numHashes: Int): DataFrame = {
    // explode_outer, NOT explode: inner explode makes Catalyst infer
    // size(arr)>0 constraints that are pushed below the projection and
    // re-evaluate the whole shingle expression 3x per row at the scan
    // (observed in plans; 4x wall cost). The cheap isNotNull filter on
    // the exploded column replaces them.
    val sh = df.withColumn("__ts", TextAnalysis.tokens(col(text)))
      .select(col(key), explode_outer(TextAnalysis.shinglesOf(col("__ts"))).as("s"))
      .where(col("s").isNotNull)
    // hash-index fan-out is a generator, not a cross join: no join operator
    // in the plan at all (a range crossJoin planned as a 16-row BNLJ —
    // harmless but noise in every plan audit)
    sh.select(col(key), col("s"),
        explode(sequence(lit(0L), lit(numHashes - 1L))).as("h_idx"))
      .groupBy(col(key), col("h_idx"))
      .agg(min(md5(concat(col("h_idx").cast("string"), lit(":"), col("s")))).as("min_hash"))
  }

  /**
   * MinHash-LSH candidate pairs verified by exact Jaccard.
   * bands × rowsPerBand = numHashes; a pair is a candidate iff it agrees
   * on ALL hashes of ≥1 band. Output: (key_a, key_b, jaccard) with
   * key_a < key_b and jaccard ≥ threshold, 4-dp rounded.
   */
  def minhashLsh(df: DataFrame, key: String, text: String,
      bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val numHashes = bands * rowsPerBand
    val mh = minhashLong(df, key, text, numHashes)
      .withColumn("band", (col("h_idx") / rowsPerBand).cast("long"))
    // band key: hashes of the band concatenated in h_idx order
    val bandKeys = mh.groupBy(col(key), col("band"))
      .agg(concat_ws("|", array_sort(collect_list(
        concat(lpad(col("h_idx").cast("string"), 4, "0"), lit("="), col("min_hash"))))).as("band_key"))
    val a = bandKeys.select(col(key).as("key_a"), col("band"), col("band_key"))
    val b = bandKeys.select(col(key).as("key_b"), col("band"), col("band_key"))
    val cand = a.join(b, Seq("band", "band_key"))
      .where(col("key_a") < col("key_b"))
      .select("key_a", "key_b").distinct()
    // verify with exact Jaccard over shingle sets
    val sets = df.withColumn("__ts", TextAnalysis.tokens(col(text)))
      .select(col(key), TextAnalysis.shinglesOf(col("__ts")).as("sh"))
    val sa = sets.select(col(key).as("key_a"), col("sh").as("sh_a"))
    val sb = sets.select(col(key).as("key_b"), col("sh").as("sh_b"))
    cand.join(sa, "key_a").join(sb, "key_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .where(col("jaccard") >= threshold)
      .select("key_a", "key_b", "jaccard")
  }

  /** 16-bit SimHash from md5-derived per-token bit votes; portable to SQL
   * (bit j of token t = ascii(substr(md5(t), j+1, 1)) % 2). */
  def simhash(df: DataFrame, key: String, text: String): DataFrame = {
    val toks = df.select(col(key), explode(TextAnalysis.tokens(col(text))).as("t"))
      .withColumn("h", md5(col("t").cast("binary")))
    val bits = toks.select(col(key), col("h"), explode(sequence(lit(0L), lit(15L))).as("j"))
      .withColumn("vote",
        when(pmod(ascii(substring(col("h"), (col("j") + 1).cast("int"), lit(1))), lit(2)) === 1, lit(1L))
          .otherwise(lit(-1L)))
    bits.groupBy(col(key), col("j"))
      .agg(sum("vote").as("v"))
      .groupBy(col(key))
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, cast(j as int))")).otherwise(lit(0L)))
        .as("simhash"))
  }

  /**
   * SimHash near-dup pairs with hamming distance ≤ maxHamming.
   *
   * Recall contract: the 16 signature bits are partitioned into
   * `maxHamming + 1` bands; by pigeonhole any pair within the distance
   * bound agrees exactly on at least one band, so the banded candidate set
   * has NO false negatives. Candidates come from ONE hash equi-join on
   * (band, band_value) over the exploded band rows — no OR-condition
   * nested-loop join (the previous shape planned as a
   * BroadcastNestedLoopJoin, O(N²) comparisons).
   */
  def simhashPairs(df: DataFrame, key: String, text: String, maxHamming: Int): DataFrame = {
    val nb = maxHamming + 1
    require(nb >= 1 && nb <= 16, s"maxHamming must be in [0, 15], got $maxHamming")
    // distribute the 16 bits as evenly as possible so every band is non-empty
    val widths = Array.tabulate(nb)(i => 16 / nb + (if (i < 16 % nb) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandCols = (0 until nb).map { i =>
      struct(lit(i).as("band"),
        shiftright(col("simhash"), offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1)).as("bv"))
    }
    val banded = simhash(df, key, text)
      .select(col(key), col("simhash"), explode(array(bandCols: _*)).as("b"))
      .select(col(key), col("simhash"), col("b.band").as("band"), col("b.bv").as("bv"))
    val a = banded.select(col(key).as("key_a"), col("simhash").as("sim_a"), col("band"), col("bv"))
    val b = banded.select(col(key).as("key_b"), col("simhash").as("sim_b"), col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .where(col("key_a") < col("key_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("key_a", "key_b", "hamming").distinct()
  }

  /** Direct n-gram Jaccard pairs, blocked by shared-shingle equi-join so
   * disjoint docs never pair. The intersection size is computed BY the
   * join itself (group-by-pair count of shared shingles) — no per-pair
   * array materialization, so the verify stage is one hash aggregate
   * (was array_intersect over full arrays per candidate: 5x slower). */
  def ngramJaccard(df: DataFrame, key: String, text: String, threshold: Double,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val sets = df.withColumn("__ts", TextAnalysis.tokens(col(text)))
      .select(col(key), TextAnalysis.shinglesOf(col("__ts")).as("sh"))
    val sizes = sets.select(col(key), size(col("sh")).cast("long").as("n"))
    val exAll = sets.select(col(key), explode_outer(col("sh")).as("s"))
      .where(col("s").isNotNull) // see minhashLong: avoids constraint-pushdown re-evaluation
    // Document-frequency cap: a stop-shingle shared by M docs would emit M²
    // join rows; dropping shingles with df > cap bounds the blowup at cap²
    // per shingle (standard practice; intersection then counts only capped
    // shingles while sizes stay full, so jaccard is a lower bound).
    val ex =
      if (maxDocFreq == Int.MaxValue) exAll
      else {
        val rare = exAll.groupBy("s").agg(count(lit(1)).as("df"))
          .where(col("df") <= maxDocFreq).select("s")
        exAll.join(rare, Seq("s"), "left_semi")
      }
    val inter = ex.as("x").join(ex.as("y"), col("x.s") === col("y.s"))
      .where(col(s"x.$key") < col(s"y.$key"))
      .groupBy(col(s"x.$key").as("key_a"), col(s"y.$key").as("key_b"))
      .agg(count(lit(1)).as("inter"))
    val na = sizes.select(col(key).as("key_a"), col("n").as("n_a"))
    val nb = sizes.select(col(key).as("key_b"), col("n").as("n_b"))
    inter.join(na, "key_a").join(nb, "key_b")
      .withColumn("jaccard", round(
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("key_a", "key_b", "jaccard")
  }
}
