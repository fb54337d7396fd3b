package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
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
 * Scale notes: for integral target keys the per-round ranking runs as a
 * [[TopKByScore]] ObjectHashAggregate — each map task ships at most k+1
 * (score, key) pairs per query into the exchange, so the exchange carries
 * O(open-queries) structs instead of every candidate row, and there is no
 * full-candidate sort (a `row_number` window sorted candidate-cells ×
 * target-density rows per round: measured 2× wall time and 0.49 N→4N
 * scaling on the bench fixture — the sort spilled; the aggregate path
 * doesn't). The same aggregate row carries the kth-distance + ring-bound
 * resolution test, so each round is ONE shuffle. Non-integral keys fall
 * back to the windowed form (same ordering contract). Rounds needed ≈
 * target density, typically 1-3 when `res` is sized so a ring-1 disk
 * holds ≳k targets. Accumulated state is capped at top-k per query per
 * round (correct: dropped candidates can never re-enter the top-k).
 */
object Knn {

  /** Per-round loop timing to stderr when GRAFT_KNN_DEBUG is set —
   * the driver loop's serial cost is the scaling-critical quantity. */
  private val Debug = sys.env.contains("GRAFT_KNN_DEBUG")

  /** Bench/debug override of the k-path routing (GRAFT_KNN_PATH =
   * decl | agg | window): lets the scaling bench measure the declarative
   * and imperative aggregates on the SAME workload (the BASELINE.md
   * k = 3 comparison). Ignored when the requested path can't serve the
   * call (k/key-type constraints) — production callers never set it. */
  private def forcedPath: Option[String] = sys.env.get("GRAFT_KNN_PATH")

  /** Combined input-size estimate below which general-k routes to the
   * imperative aggregate instead of the declarative slot fold (see the
   * routing note in [[apply]]). 64 MB of ESTIMATED input (compressed
   * parquet bytes or exact range stats) is comfortably above every
   * oracle fixture and comfortably below any job where scaling matters —
   * the two measured regimes sit 30× below and 100× above it. */
  private val DeclRouteMinBytes: Long = 64L << 20

  /** The session's broadcast budget in bytes (≤0 = never broadcast).
   * Parsed with Spark's own byte-string parser (covers every legal form
   * — "10m", "2t", whitespace — a hand parser once threw on); AQE's
   * dedicated threshold takes precedence when set, matching what the
   * planner itself would use; an unparsable value falls back to the
   * non-broadcast path rather than failing the whole Knn call. */
  private def broadcastBytesLimit(df: DataFrame): Long = {
    val conf = df.sparkSession.conf
    val v = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      .filter(_.trim.nonEmpty)
      .orElse(conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
      .getOrElse("10485760")
    // negative forms ("-1" = disabled) fail the byte-string grammar and
    // land in the 0L fallback — exactly the never-broadcast semantics
    scala.util.Try(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v.trim)).getOrElse(0L)
  }

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
   *         iff the whole target table has < k rows). Candidates whose
   *         distance is non-finite (NaN coordinates) are excluded — both
   *         code paths share this semantic.
   */
  def apply(
      queries: DataFrame,
      qKey: String, qLat: String, qLon: String,
      targets: DataFrame,
      tKey: String, tLat: String, tLon: String,
      k: Int, res: Int, reliableCheckpoint: Boolean = false): DataFrame = {
    require(k >= 1)
    val integralKey = targets.schema(tKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    // General-k routing is SIZE-AWARE: applyDeclK's explode-and-reaggregate
    // state fold pays a per-round fixed cost (2k-slot buffer exprs through
    // an extra exchange) that dominates small jobs — measured 3.2 s decl vs
    // 1.5 s agg on the 15k-query sf0.1 oracle fixture — while at bench
    // scale (4M queries, 1.1G candidates) decl is ~1.5× faster and removes
    // the ObjectHashAggregate span-boundary GC ceiling (SCALE.md). The
    // routing signal is the optimizer's sizeInBytes estimate of both
    // inputs: computed at plan time (no job, no collect), and frames with
    // UNKNOWN stats default to spark.sql.defaultSizeInBytes = Long.Max,
    // which routes to decl — the path whose shape survives 100×. Both
    // paths are result-identical (KnnSpec path-equality property), so the
    // estimate only steers the constant factor, never correctness.
    def estBytes(df: DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    lazy val smallJob =
      estBytes(queries) + estBytes(targets) < BigInt(DeclRouteMinBytes)
    val path = forcedPath match {
      case Some("window") => "window"
      case Some("agg") if integralKey => "agg"
      case Some("decl") if integralKey && k >= 2 && k <= TopKSlots.MaxK => "decl"
      case _ =>
        if (!integralKey) "window"
        else if (k == 1) "nearest"
        // JitK, not MaxK: at k ≥ 5 TopKSlots' generated update method
        // exceeds the JVM's 8000-byte JIT limit and the whole span runs
        // interpreted — measured 6–10× slower than the imperative path
        // (TopKSlots.JitK scaladoc) — so the decl fusion win only exists
        // while the method JIT-compiles
        else if (k > TopKSlots.JitK) "agg"
        else if (smallJob) "agg"
        else "decl"
    }
    path match {
      case "nearest" =>
        applyNearest(queries, qKey, qLat, qLon, targets, tKey, tLat, tLon, res, reliableCheckpoint)
      case "decl" =>
        applyDeclK(queries, qKey, qLat, qLon, targets, tKey, tLat, tLon, k, res, reliableCheckpoint)
      case "agg" =>
        applyAgg(queries, qKey, qLat, qLon, targets, tKey, tLat, tLon, k, res, reliableCheckpoint)
      case "window" =>
        applyWindowed(queries, qKey, qLat, qLon, targets, tKey, tLat, tLon, k, res, reliableCheckpoint)
    }
  }

  /** Sentinel candidate seeded per open query each round so queries whose
   * disk holds no targets yet still surface in the aggregate (a plain
   * groupBy would silently drop them). −∞ sorts strictly after every real
   * score, so a sentinel only occupies a buffer slot when a query has
   * < k real candidates — and then its kth distance is +∞, which can never
   * pass the ring bound, so the done-test needs no special case. */
  private val SentinelScore = Double.NegativeInfinity

  /**
   * k = 1 (nearest-neighbor join, the most common call) — the fully
   * codegen'd fast path. Per round the candidate stream aggregates
   * through the declarative [[MaxScoreMinKey]]: its fixed-width
   * (double, long) buffer lets HashAggregateExec fuse the PARTIAL
   * aggregation into the scan→explode→join codegen span, so a candidate
   * row is never materialized — zero per-candidate heap allocation. (The
   * general-k path unions carried state + sentinels into an
   * ObjectHashAggregate; that span boundary copies every candidate row —
   * profiled at ~100 GB/child on the scaling bench, with the GC acting as
   * a core-count-independent cost that capped N→4N scaling at ~0.7.)
   * Carried per-query state is folded in AFTER the aggregate by a narrow
   * left-outer join against the open set (three 8-byte columns a side —
   * the scalar max/min-key merge of two candidates is plain CASE
   * arithmetic), which also re-seeds queries whose band held no targets,
   * replacing the sentinel-union trick.
   */
  private def applyNearest(
      queries: DataFrame,
      qKey: String, qLat: String, qLon: String,
      targets: DataFrame,
      tKey: String, tLat: String, tLon: String,
      res: Int, reliableCheckpoint: Boolean): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val keyType = targets.schema(tKey).dataType
    val maxRings = (1L << res).toInt

    val tEnter = System.nanoTime()
    val tgt0 = targets.select(
      col(tKey).cast(LongType).as("__tk64"), col(tLat).as("__tlat"), col(tLon).as("__tlon"))
      .withColumn("__tcell", cell_id(col("__tlat"), col("__tlon"), res))
      .persist()
    // same compact-layer broadcast gate as applyAgg (see note there)
    val tgt = if (tgt0.count() * 48 <= broadcastBytesLimit(tgt0)) broadcast(tgt0) else tgt0
    if (Debug) System.err.println(
      f"[knn] tgt ready ${(System.nanoTime() - tEnter) / 1e9}%.3fs")

    val negD2 = {
      val dx = col("__tlon") - col("__qlon")
      val dy = col("__tlat") - col("__qlat")
      (-(dx * dx + dy * dy)).as("__score")
    }

    // open carries the best-so-far candidate inline; sentinel = no real
    // candidate yet (real scores are finite: NaN/±Inf filtered below)
    val obs0 = org.apache.spark.sql.Observation(s"__knn_init_${System.nanoTime()}")
    var open: DataFrame = ckpt(queries.select(
      col(qKey).as("__qkey"), col(qLat).as("__qlat"), col(qLon).as("__qlon"))
      .withColumn("__score", lit(SentinelScore))
      .withColumn("__tk64", lit(Long.MinValue))
      .observe(obs0, count(lit(1)).as("n")))
    if (Debug) System.err.println(
      f"[knn] setup tgt+ckpt=${(System.nanoTime() - tEnter) / 1e9}%.3fs")
    val initialOpen = open
    // per-round states: finished rows stay lazy projections over each
    // round's checkpoint (same ownership note as applyAgg's aggds)
    val rounds = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var lo = 0
    var r = 0
    var openCount: Long =
      if (obs0.get("n").asInstanceOf[Long] == 0L) 0L else Long.MaxValue
    val t0 = System.nanoTime()
    while (lo <= maxRings && openCount > 0) {
      r = if (lo == 0) math.min(1, maxRings) else math.min(lo * 2, maxRings)
      val ringCells = open.select(
        col("__qkey"), col("__qlat"), col("__qlon"),
        cell_disk_band(cell_id(col("__qlat"), col("__qlon"), res), lit(lo), lit(r)).as("__cell"))
      val cand = ringCells.join(tgt, col("__cell") === col("__tcell"))
        .select(col("__qkey"), negD2, col("__tk64"))
        .where(!isnan(col("__score")) && col("__score") =!= lit(Double.NegativeInfinity))
      // ONE fused span up to the partial aggregate: no union, no sentinel
      val roundBest = cand.groupBy("__qkey")
        .agg(TopKByScore.best(col("__score"), col("__tk64")).as("__new"))
      val newS = col("__new.best_score")
      val newK = col("__new.best_key")
      val bs2 = when(col("__new").isNull, col("__score"))
        .when(newS > col("__score"), newS)
        .otherwise(col("__score"))
      val bk2 = when(col("__new").isNull, col("__tk64"))
        .when(newS > col("__score"), newK)
        .when(newS === col("__score"), least(col("__tk64"), newK))
        .otherwise(col("__tk64"))
      val obs = org.apache.spark.sql.Observation(s"__knn_open_${r}_${System.nanoTime()}")
      if (Debug && sys.env.contains("GRAFT_KNN_EXPLAIN") && rounds.isEmpty) {
        val dbg = roundBest
        dbg.queryExecution.toRdd.count()
        System.err.println("[knn] round-1 final plan:\n" +
          dbg.queryExecution.executedPlan.toString.take(5000))
      }
      val aggd = ckpt(open
        .join(roundBest, Seq("__qkey"), "left_outer")
        .select(col("__qkey"), col("__qlat"), col("__qlon"),
          bs2.as("__bs"), bk2.as("__bk"))
        .withColumn("__done", col("__bs") =!= lit(SentinelScore) &&
          -col("__bs") <= cell_disk_bound(col("__qlat"), col("__qlon"), res, lit(r)))
        .observe(obs, count(when(!col("__done"), 1)).as("open")))
      openCount = obs.get("open").asInstanceOf[Long]
      if (Debug) System.err.println(
        f"[knn] band [$lo,$r] open=$openCount t=${(System.nanoTime() - t0) / 1e9}%.3fs")
      if (rounds.isEmpty) org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(initialOpen)
      rounds += aggd
      open = aggd.where(!col("__done"))
        .select(col("__qkey"), col("__qlat"), col("__qlon"),
          col("__bs").as("__score"), col("__bk").as("__tk64"))
      lo = r + 1
    }
    tgt0.unpersist()
    if (rounds.isEmpty) { // zero rounds ran: the query set was empty
      org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(initialOpen)
      return queries.limit(0).select(col(qKey),
        lit(null).cast(keyType).as(tKey), lit(0.0).as("dist_sq"), lit(0).as("rank"))
    }
    def emit(df: DataFrame): DataFrame =
      df.select(col("__qkey"), col("__bk").as("__tk64"),
        (-col("__bs")).as("dist_sq"), lit(1).as("rank"))
        .where(col("dist_sq") =!= lit(Double.PositiveInfinity))
    val result0 = (rounds.init.map(a => emit(a.where(col("__done"))))
      :+ emit(rounds.last)).reduce(_.union(_))
    result0.select(
      col("__qkey").as(qKey), col("__tk64").cast(keyType).as(tKey),
      col("dist_sq"), col("rank"))
  }

  /**
   * General k (routed for 2 ≤ k ≤ [[TopKSlots.JitK]]; constructible to
   * MaxK for forced-path/spec use — integral target keys) — the
   * declarative fast path: per round the fresh-candidate stream
   * aggregates through the declarative [[TopKSlots]], whose
   * all-primitive fixed-width buffer lets HashAggregateExec fuse the
   * PARTIAL aggregation into the scan→explode→join codegen span — zero
   * per-candidate heap allocation, removing the ObjectHashAggregate
   * span-boundary row copy (~100 GB/child profiled) that capped the
   * k > 1 scaling at ~0.7-0.8 (SCALE.md).
   *
   * Carried per-query state folds in by EXPLODE-AND-REAGGREGATE: both
   * k-slot buffers (the carried top-k and the round's aggregate) explode
   * to narrow (qkey, score, key) rows — ≤ 2k per open query, ~2% of the
   * candidate volume — and a second [[TopKSlots]] aggregate merges them.
   * Every piece is a built-in codegen'd op. (The first cut folded via a
   * left-outer join whose projection merged the two sorted buffers with
   * [[TopKSlots.mergeSlotColumns]]; each of the 2k output columns
   * re-derived the full O(k²) struct-proxy least/greatest tree, and the
   * projection measured ~4.5 µs/row — 18 s of a 24 s round — against
   * ~1 s for the narrow re-aggregate.)
   *
   * Sentinel slots explode as (−∞, Long.MaxValue) rows and are NO-OPS in
   * the update chain (a −∞ input either rejects against a full buffer or
   * lands on a sentinel slot, writing back the identical value), so no
   * filtering or seeding is needed and queries with no candidates yet
   * survive every round via their own sentinel rows.
   */
  private[operators] def applyDeclK(
      queries: DataFrame,
      qKey: String, qLat: String, qLon: String,
      targets: DataFrame,
      tKey: String, tLat: String, tLon: String,
      k: Int, res: Int, reliableCheckpoint: Boolean): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val keyType = targets.schema(tKey).dataType
    val maxRings = (1L << res).toInt

    val tEnter = System.nanoTime()
    val tgt0 = targets.select(
      col(tKey).cast(LongType).as("__tk64"), col(tLat).as("__tlat"), col(tLon).as("__tlon"))
      .withColumn("__tcell", cell_id(col("__tlat"), col("__tlon"), res))
      .persist()
    // same compact-layer broadcast gate as applyAgg (see note there)
    val tgt = if (tgt0.count() * 48 <= broadcastBytesLimit(tgt0)) broadcast(tgt0) else tgt0
    if (Debug) System.err.println(
      f"[knn] tgt ready ${(System.nanoTime() - tEnter) / 1e9}%.3fs")

    val negD2 = {
      val dx = col("__tlon") - col("__qlon")
      val dy = col("__tlat") - col("__qlat")
      (-(dx * dx + dy * dy)).as("__score")
    }

    // open carries the sorted top-k-so-far as a struct of two k-arrays
    // (scores desc, keys); all-sentinel = no real candidates yet
    val obs0 = org.apache.spark.sql.Observation(s"__knn_init_${System.nanoTime()}")
    var open: DataFrame = ckpt(queries.select(
      col(qKey).as("__qkey"), col(qLat).as("__qlat"), col(qLon).as("__qlon"),
      struct(
        array(Seq.fill(k)(lit(TopKSlots.SentinelScore)): _*).as("scores"),
        array(Seq.fill(k)(lit(TopKSlots.SentinelKey)): _*).as("keys")).as("__tk"))
      .observe(obs0, count(lit(1)).as("n")))
    if (Debug) System.err.println(
      f"[knn] setup tgt+ckpt=${(System.nanoTime() - tEnter) / 1e9}%.3fs")
    val initialOpen = open
    // per-round states: finished rows stay lazy projections over each
    // round's checkpoint (same ownership note as applyAgg's aggds)
    val rounds = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var lo = 0
    var r = 0
    var openCount: Long =
      if (obs0.get("n").asInstanceOf[Long] == 0L) 0L else Long.MaxValue
    val t0 = System.nanoTime()
    while (lo <= maxRings && openCount > 0) {
      r = if (lo == 0) math.min(1, maxRings) else math.min(lo * 2, maxRings)
      val ringCells = open.select(
        col("__qkey"), col("__qlat"), col("__qlon"),
        cell_disk_band(cell_id(col("__qlat"), col("__qlon"), res), lit(lo), lit(r)).as("__cell"))
      // NaN distances (NaN coordinates) and ±∞ are excluded outright —
      // the same defined semantic as every other k path: such candidates
      // never rank (and −∞ would collide with the sentinel)
      val cand = ringCells.join(tgt, col("__cell") === col("__tcell"))
        .select(col("__qkey"), negD2, col("__tk64"))
        .where(!isnan(col("__score")) && col("__score") =!= lit(TopKSlots.SentinelScore))
      // ONE fused span up to the partial aggregate: no union, no sentinel
      val roundK = cand.groupBy("__qkey")
        .agg(TopKByScore.topKSlots(k)(col("__score"), col("__tk64")).as("__new"))
      // narrow fold: explode carried + fresh buffers to ≤ 2k rows/query,
      // re-aggregate; max() recovers the coordinates (unique per qkey,
      // present exactly once — on the carried side)
      def slotRows(df: DataFrame, buf: String, withCoords: Boolean): DataFrame =
        df.select(
          col("__qkey"),
          (if (withCoords) col("__qlat") else lit(null).cast("double")).as("__qlat"),
          (if (withCoords) col("__qlon") else lit(null).cast("double")).as("__qlon"),
          explode(arrays_zip(
            col(s"$buf.scores").as("s"), col(s"$buf.keys").as("t"))).as("__p"))
          .select(col("__qkey"), col("__qlat"), col("__qlon"),
            col("__p.s").as("__score"), col("__p.t").as("__tk64"))
      val merged = slotRows(open, "__tk", withCoords = true)
        .union(slotRows(roundK, "__new", withCoords = false))
        .groupBy("__qkey")
        .agg(
          TopKByScore.topKSlots(k)(col("__score"), col("__tk64")).as("__tk"),
          max(col("__qlat")).as("__qlat"), max(col("__qlon")).as("__qlon"))
      val obs = org.apache.spark.sql.Observation(s"__knn_open_${r}_${System.nanoTime()}")
      if (Debug && sys.env.contains("GRAFT_KNN_EXPLAIN") && rounds.isEmpty) {
        val dbg = roundK
        dbg.queryExecution.toRdd.count()
        System.err.println("[knn] round-1 final plan:\n" +
          dbg.queryExecution.executedPlan.toString.take(5000))
      }
      // done ⇔ buffer full (kth slot non-sentinel) and the kth distance
      // beats the ring-r bound — nothing outside ring r can improve it
      val kth = element_at(col("__tk.scores"), k)
      val aggd = ckpt(merged
        .withColumn("__done", kth =!= lit(TopKSlots.SentinelScore) &&
          -kth <= cell_disk_bound(col("__qlat"), col("__qlon"), res, lit(r)))
        .observe(obs, count(when(!col("__done"), 1)).as("open")))
      openCount = obs.get("open").asInstanceOf[Long]
      if (Debug) System.err.println(
        f"[knn] band [$lo,$r] open=$openCount t=${(System.nanoTime() - t0) / 1e9}%.3fs")
      if (rounds.isEmpty) org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(initialOpen)
      rounds += aggd
      open = aggd.where(!col("__done"))
        .select(col("__qkey"), col("__qlat"), col("__qlon"), col("__tk"))
      lo = r + 1
    }
    tgt0.unpersist()
    if (rounds.isEmpty) { // zero rounds ran: the query set was empty
      org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(initialOpen)
      return queries.limit(0).select(col(qKey),
        lit(null).cast(keyType).as(tKey), lit(0.0).as("dist_sq"), lit(0).as("rank"))
    }
    // slots are sorted, sentinels last → real ranks are 1..n by position
    // (sentinel slots carry dist_sq = +∞ and are filtered)
    def emit(df: DataFrame): DataFrame =
      df.select(col("__qkey"), col("__tk.scores").as("__ss"),
          posexplode(col("__tk.keys")).as(Seq("__pos", "__tk64")))
        .select(col("__qkey"), col("__tk64"),
          (-element_at(col("__ss"), col("__pos") + 1)).as("dist_sq"),
          (col("__pos") + 1).as("rank"))
        .where(col("dist_sq") =!= lit(Double.PositiveInfinity))
    val result0 = (rounds.init.map(a => emit(a.where(col("__done"))))
      :+ emit(rounds.last)).reduce(_.union(_))
    result0.select(
      col("__qkey").as(qKey), col("__tk64").cast(keyType).as(tKey),
      col("dist_sq"), col("rank"))
  }

  /** Map-side partial top-k path (integral target keys). One shuffle per
   * round: the TopKByScore hash aggregate, whose output row also carries
   * the resolution test. Coordinates must be finite (±∞ would collide
   * with the sentinel). Since the declarative [[applyDeclK]] landed this
   * path serves k > [[TopKSlots.JitK]] (and path-equality specs). */
  private[operators] def applyAgg(
      queries: DataFrame,
      qKey: String, qLat: String, qLon: String,
      targets: DataFrame,
      tKey: String, tLat: String, tLon: String,
      k: Int, res: Int, reliableCheckpoint: Boolean): DataFrame = {
    val spark = queries.sparkSession
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val keyType = targets.schema(tKey).dataType
    val maxRings = (1L << res).toInt

    val tEnter = System.nanoTime()
    val tgt0 = targets.select(
      col(tKey).cast(LongType).as("__tk64"), col(tLat).as("__tlat"), col(tLon).as("__tlon"))
      .withColumn("__tcell", cell_id(col("__tlat"), col("__tlon"), res))
      .persist()
    // broadcast a compact target layer: the per-round cell equi-join then
    // needs NO exchange on either side (the exploded ring-cell rows — the
    // loop's biggest intermediate — never shuffle), cutting both shuffled
    // bytes and two stage boundaries of driver-sync latency per round.
    // Gate on measured size (rows × ~48 B) against the session's own
    // broadcast threshold so a huge target table keeps the shuffle join.
    val tgt = if (tgt0.count() * 48 <= broadcastBytesLimit(tgt0)) broadcast(tgt0) else tgt0
    if (Debug) System.err.println(
      f"[knn] tgt ready ${(System.nanoTime() - tEnter) / 1e9}%.3fs")

    // score = −d² so TopKByScore's (score desc, key asc) order is
    // (dist asc, key asc) — the exact window ordering it replaces
    val negD2 = {
      val dx = col("__tlon") - col("__qlon")
      val dy = col("__tlat") - col("__qlat")
      (-(dx * dx + dy * dy)).as("__score")
    }

    // rank = position in the sorted buffer; sentinels (if any) sort last,
    // so filtering them leaves real ranks 1..n_real intact
    def explodeTk(df: DataFrame): DataFrame =
      df.select(col("__qkey"), col("__tk.scores").as("__ss"),
          posexplode(col("__tk.keys")).as(Seq("__pos", "__tk64")))
        .select(col("__qkey"), col("__tk64"),
          (-element_at(col("__ss"), col("__pos") + 1)).as("dist_sq"),
          (col("__pos") + 1).as("rank"))
        .where(col("dist_sq") =!= lit(Double.PositiveInfinity))

    /** Per-round aggregate + resolution test (band radius `r`). */
    def aggWithDone(all: DataFrame, r: Int): DataFrame =
      all.groupBy("__qkey", "__qlat", "__qlon")
        .agg(TopKByScore.topK(k)(col("__score"), col("__tk64")).as("__tk"))
        .withColumn("__done",
          col("__tk.n") === k &&
            -element_at(col("__tk.scores"), col("__tk.n")) <=
              cell_disk_bound(col("__qlat"), col("__qlon"), res, lit(r)))

    /** Carried candidate state of still-open queries (≤ k rows each). */
    def openState(stillOpen: DataFrame): DataFrame =
      stillOpen
        .select(col("__qkey"), col("__qlat"), col("__qlon"), col("__tk.scores").as("__ss"),
          posexplode(col("__tk.keys")).as(Seq("__pos", "__tk64")))
        .select(col("__qkey"), col("__qlat"), col("__qlon"),
          element_at(col("__ss"), col("__pos") + 1).as("__score"), col("__tk64"))
        .where(col("__score") =!= lit(SentinelScore))

    // the query count rides the checkpoint job via observe() — a separate
    // isEmpty action would add one more driver round-trip to the loop's
    // serial path (every such sync is core-count-independent cost)
    val obs0 = org.apache.spark.sql.Observation(s"__knn_init_${System.nanoTime()}")
    var open: DataFrame = ckpt(queries.select(
      col(qKey).as("__qkey"), col(qLat).as("__qlat"), col(qLon).as("__qlon"))
      .observe(obs0, count(lit(1)).as("n")))
    if (Debug) System.err.println(
      f"[knn] setup tgt+ckpt=${(System.nanoTime() - tEnter) / 1e9}%.3fs")
    val initialOpen = open // released once round 0's aggregate owns the state
    var acc: DataFrame = null // exploded real candidates of open queries (≤k each)
    // per-round aggregates: each round's finished/tail rows stay LAZY
    // projections over that round's checkpointed aggregate (one eager job
    // per round instead of two; blocks total ≤ ~2×|queries| k-slot structs
    // since the open set shrinks geometrically). OWNERSHIP: the blocks
    // back the returned DataFrame and are freed by the ContextCleaner when
    // the result is garbage-collected — for deterministic release,
    // materialize the result (write/checkpoint) and drop the reference.
    // (An eager compaction here was measured at +15-20% wall time on the
    // bench workload — writing+rereading k·|queries| rows — so the lazy
    // form is deliberate.)
    val aggds = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // geometric radius growth: bands [0,1], [2,4], [5,10], [11,22], … —
    // log(maxRings) driver rounds instead of one per ring. The first band
    // is the full disk-1 (not the lone [0,0] cell): res is sized so a
    // disk-1 holds ≳k targets (suggestRes), and a query near a cell corner
    // can have its NN in a diagonal neighbour — so [0,0] almost never
    // passes the edge-distance bound and just costs one extra global sync
    var lo = 0
    var r = 0
    // open-set size rides each round's checkpoint job via observe() —
    // the explicit per-round isEmpty action (one more driver round-trip
    // in the loop's serial path) is only needed once, for round 0
    var openCount: Long =
      if (obs0.get("n").asInstanceOf[Long] == 0L) 0L else Long.MaxValue
    val t0 = System.nanoTime()
    while (lo <= maxRings && openCount > 0) {
      r = if (lo == 0) math.min(1, maxRings) else math.min(lo * 2, maxRings)
      val ringCells = open.select(
        col("__qkey"), col("__qlat"), col("__qlon"),
        cell_disk_band(cell_id(col("__qlat"), col("__qlon"), res), lit(lo), lit(r)).as("__cell"))
      // NaN-coordinate rows would sort as the BEST score in TopKByScore
      // (Double.compare total order) but WORST in the windowed fallback's
      // sort, and a +Inf distance would collide with the sentinel —
      // exclude every non-finite distance outright so both paths share
      // one defined semantic: such candidates never rank
      val cand = ringCells.join(tgt, col("__cell") === col("__tcell"))
        .select(col("__qkey"), col("__qlat"), col("__qlon"), negD2, col("__tk64"))
        .where(!isnan(col("__score")) && col("__score") =!= lit(Double.NegativeInfinity))
      val seed = open.select(col("__qkey"), col("__qlat"), col("__qlon"),
        lit(SentinelScore).as("__score"), lit(Long.MinValue).as("__tk64"))
      val all = (if (acc == null) cand else acc.union(cand)).union(seed)
      // the aggregate row carries everything the round needs: the top-k
      // buffer, the kth distance, and the ring-bound done-test.
      // localCheckpoint: materialize AND truncate lineage — the plan would
      // otherwise grow by one join+agg per round and blow up the optimizer
      // (observed: explainString OOM)
      val obs = org.apache.spark.sql.Observation(s"__knn_open_${r}_${System.nanoTime()}")
      if (Debug && sys.env.contains("GRAFT_KNN_EXPLAIN") && aggds.isEmpty) {
        val dbg = aggWithDone(all, r)
        dbg.queryExecution.toRdd.count()
        System.err.println("[knn] round-1 final plan:\n" +
          dbg.queryExecution.executedPlan.toString.take(5000))
      }
      val aggd = ckpt(aggWithDone(all, r)
        .observe(obs, count(when(!col("__done"), 1)).as("open")))
      openCount = obs.get("open").asInstanceOf[Long]
      if (Debug) System.err.println(
        f"[knn] band [$lo,$r] open=$openCount t=${(System.nanoTime() - t0) / 1e9}%.3fs")
      // round 0's aggregate now owns the state; plain unpersist would be a
      // no-op on the checkpointed query frame (RDD blocks, not cache entries)
      if (aggds.isEmpty) org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(initialOpen)
      aggds += aggd
      val stillOpen = aggd.where(!col("__done"))
      open = stillOpen.select("__qkey", "__qlat", "__qlon")
      acc = openState(stillOpen)
      lo = r + 1
    }
    tgt0.unpersist()
    if (aggds.isEmpty) { // zero rounds ran: the query set was empty
      org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(initialOpen)
      return queries.limit(0).select(col(qKey),
        lit(null).cast(keyType).as(tKey), lit(0.0).as("dist_sq"), lit(0).as("rank"))
    }
    // every round's finished queries, plus whatever the final round left
    // open (target table smaller than k, or grid exhausted — explodeTk of
    // the WHOLE last aggregate covers both its done and its open rows)
    val result0 = (aggds.init.map(a => explodeTk(a.where(col("__done"))))
      :+ explodeTk(aggds.last)).reduce(_.union(_))
    result0.select(
      col("__qkey").as(qKey), col("__tk64").cast(keyType).as(tKey),
      col("dist_sq"), col("rank"))
  }

  /** Windowed fallback for non-integral target keys (TopKBuf carries long
   * keys). Same ordering contract; shuffles every candidate row. */
  private def applyWindowed(
      queries: DataFrame,
      qKey: String, qLat: String, qLon: String,
      targets: DataFrame,
      tKey: String, tLat: String, tLon: String,
      k: Int, res: Int, reliableCheckpoint: Boolean): DataFrame = {
    // both forms materialize eagerly AND truncate lineage (see loop note)
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(eager = true) else df.localCheckpoint(true)
    val maxRings = (1L << res).toInt // ring > grid size is impossible

    val tgt0 = targets.select(
      col(tKey).as("__tkey"), col(tLat).as("__tlat"), col(tLon).as("__tlon"))
      .withColumn("__tcell", cell_id(col("__tlat"), col("__tlon"), res))
      .persist()
    // same compact-layer broadcast gate as applyAgg (see note there)
    val tgt = if (tgt0.count() * 48 <= broadcastBytesLimit(tgt0)) broadcast(tgt0) else tgt0

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
    // per-round finished rows stay LAZY projections over that round's
    // checkpointed topk (matching applyAgg's aggds discipline) — the old
    // shape re-checkpointed out.union(finished) every round, rewriting
    // O(rounds × finished) rows for nothing. OWNERSHIP: every round's topk
    // blocks back the returned DataFrame (see applyAgg's aggds note).
    val finishedRounds = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // geometric radius growth: bands [0,1], [2,4], [5,10], [11,22], … —
    // log(maxRings) driver rounds instead of one per ring. The first band
    // is the full disk-1 (not the lone [0,0] cell): res is sized so a
    // disk-1 holds ≳k targets (suggestRes), and a query near a cell corner
    // can have its NN in a diagonal neighbour — so [0,0] almost never
    // passes the edge-distance bound and just costs one extra global sync
    var lo = 0
    var r = 0 // band upper radius (inclusive), used in the bound
    while (lo <= maxRings && !unresolved.isEmpty) {
      r = if (lo == 0) math.min(1, maxRings) else math.min(lo * 2, maxRings)
      val ringCells = unresolved.select(
        col("__qkey"), col("__qlat"), col("__qlon"),
        cell_disk_band(col("__qcell"), lit(lo), lit(r)).as("__cell"))
      val cand = ringCells.join(tgt, col("__cell") === col("__tcell"))
        .select(col("__qkey"), col("__qlat"), col("__qlon"), col("__tkey"), d2)
        .where(!isnan(col("dist_sq")) && // same exclusion as the agg path
          col("dist_sq") =!= lit(Double.PositiveInfinity))
      val all = if (acc == null) cand else acc.union(cand)
      // keep only top-k per query (bounded state; disjoint rings → no dups)
      // localCheckpoint: materialize AND truncate lineage — the plan would
      // otherwise grow by one union+window per round and blow up the
      // optimizer (observed: explainString OOM)
      val topk = ckpt(all
        .withColumn("rank", row_number().over(wTopK))
        .where(col("rank") <= k))

      // a query is done when it has k candidates and the kth beats the
      // ring-r bound (nothing beyond ring r can improve the top-k)
      val kth = topk.groupBy("__qkey", "__qlat", "__qlon")
        .agg(count(lit(1)).as("__n"), max("dist_sq").as("__kth"))
        .withColumn("__bound", cell_disk_bound(col("__qlat"), col("__qlon"), res, lit(r)))
      val doneKeys = kth
        .where(col("__n") === k && col("__kth") <= col("__bound"))
        .select("__qkey")
      finishedRounds += topk.join(doneKeys, "__qkey")
        .select(col("__qkey"), col("__tkey"), col("dist_sq"), col("rank"))
      val stillOpen = ckpt(unresolved.join(doneKeys, Seq("__qkey"), "left_anti"))
      // the superseded open set is referenced by nothing lazy (finished and
      // acc derive from topk; stillOpen is eager) — release its blocks now
      org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(unresolved)
      unresolved = stillOpen
      acc = topk.join(doneKeys, Seq("__qkey"), "left_anti")
        .select("__qkey", "__qlat", "__qlon", "__tkey", "dist_sq")
      lo = r + 1
    }
    tgt0.unpersist()
    if (finishedRounds.isEmpty && acc == null) { // zero rounds: empty query set
      org.apache.spark.sql.GraftBridge.releaseCheckpointBlocks(unresolved)
      return queries.limit(0).select(col(qKey),
        lit(null).cast(targets.schema(tKey).dataType).as(tKey),
        lit(0.0).as("dist_sq"), lit(0).as("rank"))
    }
    // queries never resolved (target table smaller than k, or grid
    // exhausted): emit what they have
    val tail =
      if (acc == null) Nil
      else List(acc
        .withColumn("rank", row_number().over(wTopK))
        .select(col("__qkey"), col("__tkey"), col("dist_sq"), col("rank")))
    val result0 = (finishedRounds.toList ++ tail).reduce(_.union(_))
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
