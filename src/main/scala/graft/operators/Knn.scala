package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{cell_disk_band, cell_disk_bound, cell_id}
import graft.geo.CellIndex

/**
 * Exact k-nearest-neighbour join via iterative cell-ring expansion
 * (north rule "kNN via iterative ring expansion"; SURVEY §2.3 J6).
 *
 * Metric: squared planar degree distance (dx² + dy²) — the same exact
 * double arithmetic as the brute-force oracle, so result row sets match
 * bit-for-bit. Ties broken by ascending target key.
 *
 * Algorithm (all DataFrame ops; the driver loop only counts):
 *   round r: unresolved queries explode to their Chebyshev ring-r cells
 *   (CellRingExpr) and equi-join targets indexed at `res` — shuffle on the
 *   8-byte cell key only. Candidates accumulate across rounds (rings are
 *   disjoint → no duplicate pairs). A query resolves when it has ≥ k
 *   candidates whose kth-best d² ≤ minDistSqBeyondDisk(p, res, r) — the
 *   property-tested bound guaranteeing nothing outside ring r can beat the
 *   current top-k (CellIndexSpec "kNN bound").
 *
 * Scale notes: each round is one hash join + one windowed top-k, both
 * partitioned by query key; rounds needed ≈ target density, typically 1-3
 * when `res` is sized so a ring-1 disk holds ≳k targets. The accumulated
 * candidate set is capped at top-k per query per round to keep state
 * bounded (correct: dropped candidates can never re-enter the top-k).
 */
object Knn {

  /**
   * @param queries (qKey, qLat, qLon) — qKey must be unique
   * @param targets (tKey, tLat, tLon)
   * @param k       neighbours per query
   * @param res     index resolution (see scale notes)
   * @param reliableCheckpoint when true, per-round state goes through
   *        `checkpoint()` (HDFS-durable; requires
   *        `sparkContext.setCheckpointDir`) instead of
   *        `localCheckpoint()`. Local checkpoints live in executor
   *        memory/disk — on a real cluster a lost executor kills the job
   *        mid-iteration, so at 100× scale run with this on; local-mode
   *        tests and benches keep the cheap default.
   * @return (qKey, tKey, dist_sq, rank) — exactly k rows per query (fewer
   *         iff the whole target table has < k rows)
   */
  def apply(
      queries: DataFrame,
      qKey: String, qLat: String, qLon: String,
      targets: DataFrame,
      tKey: String, tLat: String, tLon: String,
      k: Int, res: Int, reliableCheckpoint: Boolean = false): DataFrame = {
    require(k >= 1)
    val spark = queries.sparkSession
    // both forms materialize eagerly AND truncate lineage (see loop note)
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val maxRings = (1L << res).toInt // ring > grid size is impossible

    val tgt = targets.select(
      col(tKey).as("__tkey"), col(tLat).as("__tlat"), col(tLon).as("__tlon"))
      .withColumn("__tcell", cell_id(col("__tlat"), col("__tlon"), res))
      .persist()
    tgt.count()

    var unresolved = ckpt(queries.select(
      col(qKey).as("__qkey"), col(qLat).as("__qlat"), col(qLon).as("__qlon"))
      .withColumn("__qcell", cell_id(col("__qlat"), col("__qlon"), res)))

    val d2 = {
      val dx = col("__tlon") - col("__qlon")
      val dy = col("__tlat") - col("__qlat")
      (dx * dx + dy * dy).as("dist_sq")
    }
    val wTopK = Window.partitionBy("__qkey").orderBy(col("dist_sq"), col("__tkey"))

    var acc: DataFrame = null // accumulated top-k candidates of unresolved queries
    var accPersisted: DataFrame = null // the cached plan backing `acc`
    var out: DataFrame = null // finished queries
    // geometric radius growth: bands [0,0], [1,2], [3,6], [7,14], … —
    // log(maxRings) driver rounds instead of one per ring
    var lo = 0
    var r = 0 // band upper radius (inclusive), used in the bound
    while (lo <= maxRings && !unresolved.isEmpty) {
      r = if (lo == 0) 0 else math.min(lo * 2, maxRings)
      val ringCells = unresolved.select(
        col("__qkey"), col("__qlat"), col("__qlon"),
        cell_disk_band(col("__qcell"), lit(lo), lit(r)).as("__cell"))
      val cand = ringCells.join(tgt, col("__cell") === col("__tcell"))
        .select(col("__qkey"), col("__qlat"), col("__qlon"), col("__tkey"), d2)
      val all = if (acc == null) cand else acc.union(cand)
      // keep only top-k per query (bounded state; disjoint rings → no dups)
      // localCheckpoint: materialize AND truncate lineage — the plan would
      // otherwise grow by one union+window per round and blow up the
      // optimizer (observed: explainString OOM)
      val topk = ckpt(all
        .withColumn("rank", row_number().over(wTopK))
        .where(col("rank") <= k))
      if (accPersisted != null) accPersisted.unpersist()
      accPersisted = topk

      // a query is done when it has k candidates and the kth beats the
      // ring-r bound (nothing beyond ring r can improve the top-k)
      val kth = topk.groupBy("__qkey", "__qlat", "__qlon")
        .agg(count(lit(1)).as("__n"), max("dist_sq").as("__kth"))
        .withColumn("__bound", cell_disk_bound(col("__qlat"), col("__qlon"), res, lit(r)))
      val doneKeys = kth
        .where(col("__n") === k && col("__kth") <= col("__bound"))
        .select("__qkey")
      val finished = topk.join(doneKeys, "__qkey")
        .select(col("__qkey"), col("__tkey"), col("dist_sq"), col("rank"))
      out = if (out == null) ckpt(finished)
        else ckpt(out.union(finished))
      val stillOpen = ckpt(unresolved.join(doneKeys, Seq("__qkey"), "left_anti"))
      unresolved.unpersist()
      unresolved = stillOpen
      acc = topk.join(doneKeys, Seq("__qkey"), "left_anti")
        .select("__qkey", "__qlat", "__qlon", "__tkey", "dist_sq")
      lo = r + 1
    }
    // queries never resolved (target table smaller than k, or grid
    // exhausted): emit what they have
    val tail =
      if (acc == null) spark.emptyDataFrame
      else acc
        .withColumn("rank", row_number().over(wTopK))
        .select(col("__qkey"), col("__tkey"), col("dist_sq"), col("rank"))
    val result0 = if (out == null) tail else if (acc == null) out else out.union(tail)
    tgt.unpersist()
    result0
      .withColumnRenamed("__qkey", qKey)
      .withColumnRenamed("__tkey", tKey)
  }

  /** Smallest resolution whose cells are coarse enough that an average
   * ring-1 disk holds ≳ k targets — a sizing helper for callers. */
  def suggestRes(targetCount: Long, k: Int): Int = {
    var res = CellIndex.MaxRes
    while (res > 0 && (1L << (2 * res)) * (k.toLong max 1) > targetCount * 9) res -= 1
    res
  }
}
