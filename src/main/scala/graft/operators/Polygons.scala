package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Polygon measures — shoelace area and area-weighted centroid — over the
 * engine's flat-ring encoding (`array<long>` of interleaved x0,y0,x1,y1,
 * …, NOT closed; the same layout the spatial join and tiler consume).
 * This is the vector-layer summarization step of a tiling pipeline:
 * polygon area drives zoom-level selection and label placement, the
 * centroid anchors the label.
 *
 * Arithmetic contract — EXACT 64-bit integers: coordinates are
 * fixed-point longs (the engine's cell grid is already integer-indexed),
 * so the shoelace cross products, their sums, and the centroid
 * numerators are all exact long arithmetic — bit-identical under any
 * partitioning and in any engine (the DuckDB oracle replays the same
 * formulas). Float shoelace is famously cancellation-prone on
 * large-coordinate slivers; integer shoelace is immune.
 *
 * Overflow headroom: |cross product| ≤ 2·max|coord|², and centroid
 * numerators multiply by another coordinate — keep |coords| < 2^20
 * (~1M grid) for full safety with n ≤ 2^10 vertices; ANSI mode THROWS
 * (not wraps) on violation, so a bad ring fails loudly.
 *
 * Scale shape: pure per-row scalar folds over the ring array — one scan,
 * no explode, no shuffle. A billion polygons partition trivially.
 */
object Polygons {

  /** x of vertex i (0-based) in the flat ring. element_at is 1-based. */
  private def vx(ring: Column, i: Column): Column = element_at(ring, i * 2 + 1)
  private def vy(ring: Column, i: Column): Column = element_at(ring, i * 2 + 2)

  /** Signed cross product of edge i→i+1 (wrapping): x_i·y_j − x_j·y_i. */
  private def cross(ring: Column, n: Column, i: Column): Column = {
    val j = (i + 1) % n
    vx(ring, i) * vy(ring, j) - vx(ring, j) * vy(ring, i)
  }

  /** TWICE the signed area (shoelace): positive for counter-clockwise
   * rings. Doubling keeps it integral; callers compare or halve as
   * needed. Degenerate rings (< 3 vertices) → 0. */
  def area2(ring: Column): Column = {
    val n = (size(ring) / 2).cast("int")
    when(n >= 3,
      aggregate(sequence(lit(0), n - 1), lit(0L),
        (acc, i) => acc + cross(ring, n, i)))
      .otherwise(lit(0L))
  }

  /** Centroid numerator Σ (c_i + c_j)·cross_i for coordinate extractor
   * `coord` — the centroid is (numX/(3·area2), numY/(3·area2)). */
  private def centroidNum(ring: Column,
      coord: (Column, Column) => Column): Column = {
    val n = (size(ring) / 2).cast("int")
    when(n >= 3,
      aggregate(sequence(lit(0), n - 1), lit(0L),
        (acc, i) => acc + (coord(ring, i) + coord(ring, (i + 1) % n)) * cross(ring, n, i)))
      .otherwise(lit(0L))
  }

  /**
   * Per-polygon measures: (… input columns …, area2, cx, cy) where cx/cy
   * are the centroid in the ring's own integer grid (numerator div
   * 3·area2 — integer division).
   *
   * PRECONDITION for cross-engine exactness of cx/cy: counter-clockwise
   * simple rings with non-negative coordinates, so both division
   * operands are positive and Spark's truncating `div` equals DuckDB's
   * flooring `//` (CLAUDE.md ANSI/`div` gotchas). area2 alone is exact
   * for any orientation.
   */
  def measures(df: DataFrame, ring: String): DataFrame =
    df.withColumn("area2", area2(col(ring)))
      .withColumn("__nx", centroidNum(col(ring), vx))
      .withColumn("__ny", centroidNum(col(ring), vy))
      // `div`, not `/`: `/` is float division; degenerate rings (area2=0)
      // yield NULL centroids rather than an ANSI divide-by-zero throw
      .withColumn("cx", when(col("area2") =!= 0, expr("__nx div (3 * area2)")))
      .withColumn("cy", when(col("area2") =!= 0, expr("__ny div (3 * area2)")))
      .drop("__nx", "__ny")
}
