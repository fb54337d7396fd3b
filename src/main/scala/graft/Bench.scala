package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Benchmark main. Two parts:
 *
 *  1. Per-query timings of every SparkEntry query at SPARK_GRAFT_SF_DIR
 *     with SPARK_GRAFT_CPUS threads.
 *  2. Scaling evidence for the north rule (BASELINE.json: ≥0.8 throughput
 *     scaling efficiency from N to 4N parallelism): the flagship spatial
 *     pipeline (read pages parquet → extract geo → cell-encode → spatial
 *     join → raster tiles) runs on the SAME pre-written input at local[8]
 *     and local[32]; pages/sec at both + efficiency = (tp32/tp8)/4 are
 *     reported. A warm-up run precedes measurement so JIT state doesn't
 *     favour the later session.
 *
 * Output: ONE JSON line
 *   {"metric":"total","value":…,"unit":"sec","queries":{…},"sf":…,
 *    "scaling":{"p8_pages_per_sec":…,"p32_pages_per_sec":…,"efficiency":…,
 *               "bench_pages":N}}
 */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The measured job: full spatial pipeline over a pages parquet. */
  private def pipeline(spark: SparkSession, pagesPath: String, polysPath: String): Long = {
    val pages = spark.read.parquet(pagesPath)
    val polys = spark.read.parquet(polysPath)
    val ents = pages.select(col("url"),
      graft.functions.extract_geo(col("html")).as(Seq("entity_idx", "source", "lat", "lon")))
    val joined = graft.operators.SpatialJoin(
      ents, polys, col("lat"), col("lon"), col("ring"), res = 8, saltBuckets = 8)
    val tiles = graft.operators.Tiler.raster(
      pages.select(graft.functions.extract_geo(col("html")).as(Seq("entity_idx", "source", "lat", "lon"))),
      "lat", "lon", zoom = 6)
    joined.count() + tiles.count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "100000").toLong
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val pagesPath = s"$tmp/pages"; val polysPath = s"$tmp/polys"

    // ---- setup: write the scaling-bench input once (untimed) -------------
    locally {
      val s = session(cpus)
      graft.sources.Fixtures.pages(s, benchN, partitions = 64)
        .write.mode("overwrite").parquet(pagesPath)
      graft.sources.Fixtures.polygonsDf(s, 1024)
        .write.mode("overwrite").parquet(polysPath)
      s.stop()
    }

    // ---- scaling: same input, local[8] vs local[32] -----------------------
    def measure(cores: Int, warm: Boolean): Double = {
      val s = session(cores)
      if (warm) pipeline(s, pagesPath, polysPath) // JIT warm-up, untimed
      val t0 = System.nanoTime()
      pipeline(s, pagesPath, polysPath)
      val dt = (System.nanoTime() - t0) / 1e9
      s.stop()
      dt
    }
    val t8 = measure(8, warm = true)
    val t32 = measure(32, warm = true)
    val tp8 = benchN / t8
    val tp32 = benchN / t32
    val eff = (tp32 / tp8) / 4.0

    // ---- per-query timings ------------------------------------------------
    val s = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    s.stop()

    def f(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling = s"""{"p8_pages_per_sec":${f(tp8)},"p32_pages_per_sec":${f(tp32)},""" +
      s""""efficiency":${f(eff)},"bench_pages":$benchN,"t8_sec":${f(t8)},"t32_sec":${f(t32)}}"""
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
