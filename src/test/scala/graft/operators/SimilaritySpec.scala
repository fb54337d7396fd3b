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
      .where(col("rank") <= 7)
      .select(col("__qk"), col("__ck"), col("cos"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    val agg = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 7)
      .select(col("q"), col("vec_id"), col("cos"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(agg == windowed)
    // and the plan is an aggregate, not a window over the full scored set
    val plan = Similarity.bruteTopK(queries, "q", "embedding", emb, "vec_id", "embedding", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ranking should not use a window")
    assert(plan.contains("ObjectHashAggregate"), "expected partial ObjectHashAggregate top-k")
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
}
