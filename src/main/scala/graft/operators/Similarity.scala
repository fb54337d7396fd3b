package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (Array[Float]) — driver
 * instructions' ANN component. Two tiers:
 *
 *  - bruteTopK: exact cosine top-k, queries × corpus. Scales as a
 *    broadcast-queries map-side scan: the corpus never shuffles; per
 *    corpus row only (q × dim) multiply-adds inside codegen'd HOFs.
 *  - ivfTopK: IVF-style — restrict candidates to the query's coarse
 *    partition (here: the `label` column as the pre-assigned centroid;
 *    a k-means stage would produce it in a full pipeline), then exact
 *    cosine within the partition. Equi-join on the partition key →
 *    hash join, shuffles only (id, vec) of co-partitioned rows.
 *
 * Dot products fold left-to-right with double accumulation — the exact
 * same sequence as the DuckDB oracle (list_dot_product over DOUBLE[]),
 * so scores match bit-for-bit before the 4-dp rounding applied for
 * rank stability.
 */
object Similarity {

  /** Left-to-right double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact top-k by cosine. @param queries (qKey, vec); @param corpus
   * (cKey, vec). Output (qKey, cKey, cos, rank), rank 1..k by
   * (cos desc, cKey asc); self-pairs excluded when keys collide.
   */
  def bruteTopK(queries: DataFrame, qKey: String, qVec: String,
      corpus: DataFrame, cKey: String, cVec: String, k: Int): DataFrame = {
    val q = queries.select(col(qKey).as("__qk"), col(qVec).as("__qv"))
    val c = corpus.select(col(cKey).as("__ck"), col(cVec).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("__qk") =!= col("__ck"))
      .withColumn("cos", round(cosine(col("__qv"), col("__cv")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__qk").orderBy(col("cos").desc, col("__ck"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qk").as(qKey), col("__ck").as(cKey), col("cos"), col("rank"))
  }

  /** IVF-bucketed ANN: candidates share the query's coarse partition. */
  def ivfTopK(queries: DataFrame, qKey: String, qVec: String, qPart: String,
      corpus: DataFrame, cKey: String, cVec: String, cPart: String, k: Int): DataFrame = {
    val q = queries.select(col(qKey).as("__qk"), col(qVec).as("__qv"), col(qPart).as("__p"))
    val c = corpus.select(col(cKey).as("__ck"), col(cVec).as("__cv"), col(cPart).as("__p"))
    val scored = q.join(c, "__p")
      .where(col("__qk") =!= col("__ck"))
      .withColumn("cos", round(cosine(col("__qv"), col("__cv")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__qk").orderBy(col("cos").desc, col("__ck"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qk").as(qKey), col("__ck").as(cKey), col("cos"), col("rank"))
  }
}
