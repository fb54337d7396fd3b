package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{cell_id, cell_parent}

/**
 * Raster↔vector tile materialization at zoom-pinned resolutions (north
 * rule; SURVEY §7.4-6). The zoom→resolution mapping is pinned ONCE here:
 *
 *   zoom z ⇒ tile resolution r(z) = z, payload resolution r(z) + SubGridBits
 *
 * so a raster tile is a fixed 16×16 (SubGridBits=4 per axis) grid of
 * counts over the tile's descendant cells, and a vector tile is the sorted
 * list of (key, entity_idx, cell_id) features inside the tile.
 *
 * Scale design: one `repartitionByRange` on tile_id puts co-located tiles
 * in co-located partitions (range partitioning preserves spatial locality
 * of the (res,ix,iy) key layout); the per-tile aggregation is an ordinary
 * partial+final hash agg — no skew beyond the data's own (hot tiles are
 * split by AQE since counts, not payloads, shuffle for raster).
 */
object Tiler {
  /** 4 bits per axis → 16×16 subgrid per raster tile. */
  val SubGridBits = 4
  val SubGridSize: Int = 1 << SubGridBits // 16

  def tileRes(zoom: Int): Int = zoom
  def payloadRes(zoom: Int): Int = zoom + SubGridBits

  /**
   * Raster tiles: (tile_id, zoom, pix_x, pix_y, n) — one row per non-empty
   * subgrid pixel (sparse representation; a dense 256-long array per tile
   * is `groupBy(tile_id).pivot`-able downstream but sparse keeps shuffles
   * minimal and the row set exactly checkable).
   */
  def raster(points: DataFrame, lat: String, lon: String, zoom: Int): DataFrame = {
    val rT = tileRes(zoom); val rP = payloadRes(zoom)
    points
      .withColumn("__pcell", cell_id(col(lat), col(lon), rP))
      .withColumn("tile_id", cell_parent(col("__pcell"), rT))
      // pixel coordinates within the tile: low SubGridBits of ix / iy
      .withColumn("pix_x", (shiftright(col("__pcell"), 29) % SubGridSize).cast("int"))
      .withColumn("pix_y", (col("__pcell") % SubGridSize).cast("int"))
      .groupBy("tile_id", "pix_x", "pix_y")
      .agg(count(lit(1)).as("n"))
      .withColumn("zoom", lit(zoom))
      .select("tile_id", "zoom", "pix_x", "pix_y", "n")
  }

  /**
   * Raster→vector conversion: pixels with count ≥ minCount become cell
   * polygons — (cell_id, zoom, n, corner scalars, ring). The payload cell
   * index is reconstructed from (tile_id, pix_x, pix_y); bounds are exact
   * (power-of-two divisions of 360/180 are exact IEEE-754 at the pinned
   * resolutions), so the output is oracle-checkable to the bit. The ring
   * column is SpatialJoin-ready (interleaved [x,y,…] CCW box).
   */
  def vectorize(raster: DataFrame, zoom: Int, minCount: Long): DataFrame = {
    val rP = payloadRes(zoom)
    val scale = (1L << rP).toDouble
    val mask = (1L << 29) - 1
    val dLon = 360.0 / scale
    val dLat = 180.0 / scale
    raster.where(col("n") >= minCount)
      .withColumn("__ix",
        shiftright(col("tile_id"), 29).bitwiseAND(lit(mask)) * SubGridSize + col("pix_x"))
      .withColumn("__iy", col("tile_id").bitwiseAND(lit(mask)) * SubGridSize + col("pix_y"))
      .withColumn("cell_id",
        lit(rP.toLong << 58).bitwiseOR(shiftleft(col("__ix"), 29)).bitwiseOR(col("__iy")))
      .withColumn("lon_min", col("__ix") * dLon - 180.0)
      .withColumn("lat_min", col("__iy") * dLat - 90.0)
      .withColumn("lon_max", (col("__ix") + 1) * dLon - 180.0)
      .withColumn("lat_max", (col("__iy") + 1) * dLat - 90.0)
      .withColumn("ring", array(
        col("lon_min"), col("lat_min"), col("lon_max"), col("lat_min"),
        col("lon_max"), col("lat_max"), col("lon_min"), col("lat_max")))
      .select("cell_id", "zoom", "n", "lon_min", "lat_min", "lon_max", "lat_max", "ring")
  }

  /**
   * Vector tiles: (tile_id, zoom, features) where features = array of
   * (key, entity_idx, cell_id) structs sorted by (key, entity_idx) —
   * deterministic bytes for snapshot sinks (SURVEY §7.4-5).
   */
  def vector(entities: DataFrame, key: String, entityIdx: String,
      lat: String, lon: String, zoom: Int): DataFrame = {
    val rT = tileRes(zoom); val rP = payloadRes(zoom)
    entities
      .withColumn("cell_id", cell_id(col(lat), col(lon), rP))
      .withColumn("tile_id", cell_parent(col("cell_id"), rT))
      .repartitionByRange(col("tile_id"))
      .groupBy("tile_id")
      .agg(array_sort(collect_list(struct(col(key), col(entityIdx), col("cell_id"))))
        .as("features"))
      .withColumn("zoom", lit(zoom))
      .select("tile_id", "zoom", "features")
  }
}
