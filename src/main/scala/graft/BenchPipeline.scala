package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child-JVM entry for the scaling measurement (forked by [[Bench]] so
 * each parallelism level gets a clean heap + JIT). Prints SECONDS=… of
 * the timed run after an untimed warm-up. */
object BenchPipeline {
  def main(args: Array[String]): Unit = {
    val Array(cores, pagesPath, polysPath) = args
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-pipeline-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      // the bench fixture is many small parquet files; with the 128 MB
      // default they coalesce into ~4 input splits and the parse stage
      // can't use the cores. At production scale files are 128 MB-1 GB
      // and splits abound — these settings make the bench representative.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Long = {
      val pages = spark.read.parquet(pagesPath)
      // the polygon layer arrives as one small file; repartition so the
      // cell-cover generate (broadcast build side) is not a single task
      val polys = spark.read.parquet(polysPath).repartition(cores.toInt)
      // extract once, reuse for both branches (the parse is the dominant
      // cost; recomputing it doubles the job for no reason)
      val ents = pages.select(col("url"),
        graft.functions.extract_geo(col("html")).as(Seq("entity_idx", "source", "lat", "lon")))
        .persist()
      // saltBuckets = 1: the polygon side broadcasts (no shuffle), so
      // hot-cell skew cannot concentrate a partition — salting would only
      // multiply the broadcast. Salt belongs to the shuffle-join regime
      // (huge polygon layers); see SpatialJoin scaladoc.
      val joined = graft.operators.SpatialJoin(
        ents, polys, col("lat"), col("lon"), col("ring"), res = 8)
      val tiles = graft.operators.Tiler.raster(ents, "lat", "lon", zoom = 6)
      // two sequential actions: the first materializes the ents cache, the
      // second reuses it (a single union-job would race both branches
      // before the cache exists and extract twice — measured slower)
      val n = joined.count() + tiles.count()
      ents.unpersist()
      n
    }
    run() // warm-up: JIT + page cache
    // min of 2 timed runs; the parent also runs two children per level and
    // takes the min — 4 samples each side pick the steady-state mode of the
    // bimodal host noise (observed 32s vs 52s draws at 4 cores)
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"SECONDS=${times.min}%.4f")
    spark.stop()
  }
}
