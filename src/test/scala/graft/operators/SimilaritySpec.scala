package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") < 30)
    .select(col("vec_id").as("q"), col("embedding"))

  test("bruteTopK: k rows per query, rank ordered, no self-pairs") {
    val top = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 4)
    assert(top.count() == 30 * 4)
    assert(top.where(col("q") === col("vec_id")).count() == 0)
    val perQ = top.groupBy("q").agg(max("rank").as("m"), countDistinct("vec_id").as("d")).collect()
    perQ.foreach(r => assert(r.getInt(1) == 4 && r.getLong(2) == 4))
  }

  test("partial top-k aggregation equals the row_number window it replaced") {
    val scored = emb.select(col("vec_id").as("__ck"), col("embedding").as("__cv"))
      .crossJoin(broadcast(queries.select(col("q").as("__qk"), col("embedding").as("__qv"))))
      .where(col("__qk") =!= col("__ck"))
      .withColumn("cos", round(Similarity.cosine(col("__qv"), col("__cv")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__qk").orderBy(col("cos").desc, col("__ck"))
    val windowed = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 4)
      .select(col("__qk"), col("__ck"), col("cos"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    val agg = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 4)
      .select(col("q"), col("vec_id"), col("cos"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(agg == windowed)
    // and the plan is an aggregate, not a window over the full scored set
    val plan = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ranking should not use a window")
    // the declarative TopKSlots buffer is all-primitive, so the partial
    // top-k plans as a codegen-fusible HashAggregate — NOT the
    // ObjectHashAggregate of the imperative form (whose span-boundary row
    // copy was the profiled scaling ceiling)
    assert(plan.contains("partial_topk_slots"), "expected partial declarative top-k")
    assert(!plan.contains("ObjectHashAggregate"), "declarative top-k must use HashAggregate")
  }

  test("bruteTopK with STRING corpus keys (window fallback path)") {
    // STRING keys on BOTH sides: the self-pair exclusion applies (string
    // equality) and zero-padding makes lexicographic order == numeric
    // order, so the window fallback must reproduce the numeric path's
    // rows EXACTLY, rank and cos included
    val corpusS = emb.select(format_string("doc-%05d", col("vec_id")).as("k"), col("embedding"))
    val queriesS = emb.where(col("vec_id") < 30)
      .select(format_string("doc-%05d", col("vec_id")).as("q"), col("embedding"))
    val got = Similarity.bruteTopK(queriesS, "q", "embedding", corpusS, "k", "embedding", 3)
    assert(got.schema("k").dataType == org.apache.spark.sql.types.StringType)
    val gotSet = got.select(col("q"), col("k"), col("cos"), col("rank"))
      .as[(String, String, Double, Int)].collect().toSet
    val num = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 3)
      .select(format_string("doc-%05d", col("q")).as("q"),
        format_string("doc-%05d", col("vec_id")).as("k"), col("cos"), col("rank"))
      .as[(String, String, Double, Int)].collect().toSet
    assert(gotSet == num)
  }

  test("numeric-mix keys (int queries vs long corpus) still exclude self-pairs") {
    val qInt = emb.where(col("vec_id") < 10)
      .select(col("vec_id").cast("int").as("q"), col("embedding"))
    val got = Similarity.bruteTopK(qInt, "q", "embedding", emb, "vec_id", "embedding", 3)
    // a self-pair would dominate at cos=1.0 rank 1
    assert(got.where(col("q").cast("long") === col("vec_id")).count() == 0)
  }

  test("ivfTopK restricts candidates to the query's partition") {
    val q = emb.where(col("vec_id") < 30)
      .select(col("vec_id").as("q"), col("embedding"), col("label"))
    val top = Similarity.ivfTopK(q, "q", "embedding", "label",
      emb, "vec_id", "embedding", "label", 3)
    val labels = emb.select(col("vec_id"), col("label").as("clabel"))
    val ql = emb.select(col("vec_id").as("q"), col("label").as("qlabel"))
    val joined = top.join(labels, "vec_id").join(ql, "q")
    assert(joined.where(col("clabel") =!= col("qlabel")).count() == 0)
  }

  test("kmeansIvfTopK: self-trained quantizer, deterministic, recall beats random") {
    val ivf = Similarity.kmeansIvfTopK(queries, "q", "embedding", emb, "vec_id", "embedding",
      k = 5, kClusters = 8, iters = 2, nprobe = 2)
    val again = Similarity.kmeansIvfTopK(queries, "q", "embedding", emb, "vec_id", "embedding",
      k = 5, kClusters = 8, iters = 2, nprobe = 2)
    assert(ivf.collect().toSet == again.collect().toSet) // deterministic training
    assert(ivf.groupBy("q").count().where(col("count") > 5).count() == 0)
    val brute = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 5)
      .select("q", "vec_id").as[(Long, Long)].collect().toSet
    val got = ivf.select("q", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & got).size.toDouble / brute.size
    // nprobe=2 of 8 clusters ≈ 25% random-candidate baseline; a trained
    // quantizer concentrates true neighbours in the probed cells
    assert(recall > 0.5, s"recall=$recall")
  }

  test("lshTopK: deterministic, bucketed, and meaningfully better than random") {
    val lsh = Similarity.lshTopK(queries, "q", "embedding", emb, "vec_id", "embedding",
      k = 5, bits = 4)
    val lsh2 = Similarity.lshTopK(queries, "q", "embedding", emb, "vec_id", "embedding",
      k = 5, bits = 4)
    assert(lsh.collect().toSet == lsh2.collect().toSet) // deterministic
    // recall@5 vs brute force
    val brute = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 5)
      .select("q", "vec_id").as[(Long, Long)].collect().toSet
    val got = lsh.select("q", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & got).size.toDouble / brute.size
    // 4 bits → ~1/16 of the corpus as candidates; sign-LSH concentrates
    // high-cosine pairs in shared buckets, so recall must beat the ~6%
    // random-candidate baseline by a wide margin
    assert(recall > 0.25, s"recall=$recall")
    // every returned candidate must share the query's bucket — implied by
    // construction; sanity: no query returns more than k rows
    assert(lsh.groupBy("q").count().where(col("count") > 5).count() == 0)
  }

  test("nearDupByEmbedding: perturbation clusters recovered, no spurious merges") {
    // the operator's real regime: near-dups are PERTURBED COPIES (cosine
    // ~0.99), not loosely-similar pairs — construct 30 clusters of
    // {base, 2 jittered copies} over 100 random decoys
    import graft.sources.Fixtures.mix
    val base = emb.where(col("vec_id") < 130)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def jitter(v: Array[Double], seed: Long): Array[Double] =
      v.zipWithIndex.map { case (x, i) =>
        x + 0.03 * (((mix(seed * 7919L + i) >>> 11).toDouble / (1L << 53)) - 0.5)
      }
    val rows: Seq[(Long, Array[Double])] =
      base.toSeq ++ base.take(30).flatMap { case (k, v) =>
        Seq((1000L + k) -> jitter(v, k), (2000L + k) -> jitter(v, k + 500)) }
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) =>
        org.apache.spark.sql.Row(k, v.toSeq) }, 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
    val tau = 0.95
    // pure-Scala oracle: true pairs + union-find closure
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val arr = rows.toArray
    val parent = scala.collection.mutable.Map(arr.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for { i <- arr.indices; j <- (i + 1) until arr.length
          if cos(arr(i)._2, arr(j)._2) >= tau } {
      val (ra, rb) = (find(arr(i)._1), find(arr(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val trueComp = arr.map(r => r._1 -> find(r._1)).toMap
    val trueDrops = trueComp.collect { case (k, c) if k != c => k }.toSet
    assert(trueDrops.size >= 60) // the 60 jittered copies (+ chance decoy pairs)

    val got = graft.api.Engine.nearDupByEmbedding(vecs, "vec_id", "embedding",
      threshold = tau, k = 8, bits = 8)
      .select("drop_key", "keep_key").as[(Long, Long)].collect()
    // PRECISION is structural: LSH edges are a subset of true edges (the
    // exact-cosine filter), so a spurious cluster merge is impossible
    got.foreach { case (d, kk) =>
      assert(trueComp(d) == trueComp(kk), s"spurious cluster merge: $d vs $kk")
      assert(d != kk)
    }
    val foundDrops = got.map(_._1).toSet
    assert(foundDrops.subsetOf(trueDrops))
    // jittered copies share ~all hyperplane signs with their base, and
    // hamming-1 multi-probe covers single flips → near-complete recall
    assert(foundDrops.size >= (trueDrops.size * 0.9).toInt,
      s"recall too low: ${foundDrops.size}/${trueDrops.size}")
    // deterministic
    val again = graft.api.Engine.nearDupByEmbedding(vecs, "vec_id", "embedding",
      threshold = tau, k = 8, bits = 8)
      .select("drop_key", "keep_key").as[(Long, Long)].collect().toSet
    assert(again == got.toSet)
  }

  // ---- int8 quantization ---------------------------------------------------

  /** Brute mirror of quantizeInt8's contract. */
  private def bruteQuantize(v: Array[Float]): (Array[Int], Long) = {
    val m = v.map(math.abs).max.toDouble
    val q = if (m == 0.0) v.map(_ => 0)
      else v.map(x => math.floor(x.toDouble * 127.0 / m + 0.5).toInt)
    (q, q.map(x => x.toLong * x).sum)
  }

  test("quantizeInt8 matches brute force; codes bounded by 127; zero vector is zero") {
    val rows = emb.limit(50).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val got = Similarity.quantizeInt8(emb.limit(50), "vec_id", "embedding")
      .as[(Long, Array[Int], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    for ((id, v) <- rows) {
      val (q, n) = bruteQuantize(v)
      assert(got(id)._1.sameElements(q), s"vec $id codes")
      assert(got(id)._2 == n, s"vec $id norm")
      assert(q.forall(x => x >= -127 && x <= 127))
      assert(q.map(math.abs).max == 127) // the argmax element saturates
    }
    val zero = Seq((9L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val z = Similarity.quantizeInt8(zero, "vec_id", "embedding")
      .as[(Long, Array[Int], Long)].head()
    assert(z._2.forall(_ == 0) && z._3 == 0L)
  }

  test("quantizedTopK matches the brute-force quantized ranking exactly") {
    val all = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val codes = all.map { case (id, v) => id -> bruteQuantize(v) }
    val qs = codes.filter(_._1 < 30)
    val want = qs.flatMap { case (qid, (qv, qn)) =>
      codes.filter(_._1 != qid).map { case (cid, (cv, cn)) =>
        val dot = qv.zip(cv).map { case (a, b) => a.toDouble * b.toDouble }.sum
        (qid, cid, dot / (math.sqrt(qn.toDouble) * math.sqrt(cn.toDouble)))
      }.sortBy { case (_, cid, cos) => (-cos, cid) }.take(4)
        .zipWithIndex.map { case ((q, c, cos), i) => (q, c, cos, i + 1) }
    }.toSet
    val got = Similarity.quantizedTopK(
        emb.where(col("vec_id") < 30).select(col("vec_id").as("q"), col("embedding")),
        "q", "embedding", emb, "vec_id", "embedding", 4)
      .select(col("q"), col("vec_id"), col("cos"), col("rank").cast("int"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
  }

  test("quantized top-k recall vs exact cosine is high on the fixture") {
    val exact = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 5)
      .select("q", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val quant = Similarity.quantizedTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 5)
      .select("q", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq.map(q => (exact(q) & quant(q)).size.toDouble / 5).sum / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("semDedup: exact copies dropped, cluster minima kept, partitioning-invariant") {
    // corpus = 200 vectors + exact copies of the first 40 under higher
    // keys: a copy has identical centroid distances (same cluster, ties
    // break identically) and 4-dp cosine 1.0 with its original, so every
    // copy MUST be dropped; the smallest key of each cluster has no
    // smaller-keyed mate and MUST be kept
    val base = emb.where(col("vec_id") < 200).select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(base.where(col("vec_id") < 40)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding")))
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
      kClusters = 8, iters = 2, tau = 0.95)
    val rows = out.select("vec_id", "cluster_id", "kept")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == 240 && rows.map(_._1).distinct.length == 240)
    val copies = rows.filter(_._1 >= 1000)
    assert(copies.length == 40 && copies.forall(!_._3),
      s"surviving copies: ${copies.filter(_._3).map(_._1).mkString(",")}")
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val minKey = members.map(_._1).min
      assert(members.find(_._1 == minKey).get._3, s"cluster $cid min key $minKey dropped")
    }
    // deterministic under repartitioning (pure function of the data)
    val again = Similarity.semDedup(corpus.repartition(13, col("vec_id")),
      "vec_id", "embedding", kClusters = 8, iters = 2, tau = 0.95)
      .select("vec_id", "cluster_id", "kept").as[(Long, Long, Boolean)].collect()
    assert(again.toSet == rows.toSet)
    // scale contract: the shadow join is an equi-join on the cluster id
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(10).mkString("\n"))
  }

  test("semDedup: zero vectors (NaN cosine) never shadow cluster-mates") {
    // cosine(0-vector, anything) is NaN, and NaN >= tau is TRUE under
    // Spark's NaN-largest ordering — without the isnan guard the
    // larger-keyed zero vector here would be spuriously dropped as a
    // "duplicate" of the smaller-keyed one
    val corpus = Seq(
      (1L, Seq(0.0, 0.0, 0.0)), (2L, Seq(0.0, 0.0, 0.0)),
      (3L, Seq(1.0, 2.0, 3.0)), (4L, Seq(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
      kClusters = 2, iters = 1, tau = 0.95)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && out(2L), s"zero vectors shadowed: $out")
    assert(out(3L) && !out(4L), s"finite duplicate handling broke: $out")
  }}
