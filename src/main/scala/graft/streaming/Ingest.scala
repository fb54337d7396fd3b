package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{cell_id, cell_parent, extract_geo}

/**
 * Structured-Streaming ingestion (SURVEY §2.12 — optional sugar, not on
 * the correctness-critical path: the reference is a batch
 * request/response server; its ROADMAP lists streaming as HOLD).
 *
 * The same extraction expressions run unchanged under `readStream`:
 * pages land in a directory, geo entities are extracted, cell-encoded,
 * and aggregated into per-tile counts under an event-time watermark.
 */
object Ingest {

  val PagesSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Streaming tile counts: pages dir → watermarked windowed per-tile agg. */
  def tileCounts(spark: SparkSession, pagesDir: String, zoom: Int): DataFrame =
    spark.readStream
      .schema(PagesSchema)
      .parquet(pagesDir)
      .select(col("url"), col("warc_ts"),
        extract_geo(col("html")).as(Seq("entity_idx", "source", "lat", "lon")))
      .withColumn("tile", cell_parent(cell_id(col("lat"), col("lon"), zoom + 4), zoom))
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "10 minutes"), col("tile"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("tile"), col("n"))
}
