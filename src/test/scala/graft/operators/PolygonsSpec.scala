package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class PolygonsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def measure(rings: Seq[Seq[Long]]): Seq[(Long, Option[Long], Option[Long])] =
    Polygons.measures(rings.zipWithIndex.map { case (r, i) => (i, r) }.toDF("id", "ring"), "ring")
      .orderBy("id")
      .select("area2", "cx", "cy")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq

  test("unit square: area2 = 2, centroid at the center") {
    // CCW unit square scaled by 10 at (100, 200): area = 100, centroid (105, 205)
    val sq = Seq[Long](100, 200, 110, 200, 110, 210, 100, 210)
    assert(measure(Seq(sq)) == Seq((200L, Some(105L), Some(205L))))
  }

  test("right triangle: area2 = base*height, centroid = vertex mean") {
    // (0,0) (30,0) (0,30): area2 = 900, centroid (10, 10)
    val tri = Seq[Long](0, 0, 30, 0, 0, 30)
    assert(measure(Seq(tri)) == Seq((900L, Some(10L), Some(10L))))
  }

  test("clockwise ring has negative area2; degenerate rings are null-safe") {
    val cw = Seq[Long](100, 200, 100, 210, 110, 210, 110, 200)
    val got = measure(Seq(cw, Seq[Long](5, 5), Seq.empty[Long]))
    assert(got.head._1 == -200L)
    assert(got(1) == ((0L, None, None)))
    assert(got(2) == ((0L, None, None)))
  }

  test("translation invariance of area, equivariance of centroid") {
    val base = Seq[Long](10, 10, 50, 15, 60, 55, 20, 60)
    val shifted = base.grouped(2).flatMap { case Seq(x, y) => Seq(x + 1000, y + 2000) }.toSeq
    val Seq((a1, Some(cx1), Some(cy1)), (a2, Some(cx2), Some(cy2))) =
      measure(Seq(base, shifted))
    assert(a1 == a2)
    // integer division truncates identically only when both stay positive
    assert(cx2 - cx1 == 1000L && cy2 - cy1 == 2000L)
  }

  test("matches a brute-force shoelace on generated star polygons") {
    val rnd = new scala.util.Random(7)
    val rings = (0 until 40).map { _ =>
      val cx = 500L + rnd.nextInt(200); val cy = 700L + rnd.nextInt(200)
      // 8 compass directions, ascending angle => simple CCW star polygon
      val dirs = Seq((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))
      dirs.flatMap { case (dx, dy) =>
        val r = 10L + rnd.nextInt(90)
        Seq(cx + dx * r, cy + dy * r)
      }
    }
    def brute(ring: Seq[Long]): (Long, Long, Long) = {
      val pts = ring.grouped(2).map { case Seq(x, y) => (x, y) }.toArray
      val n = pts.length
      var a2 = 0L; var nx = 0L; var ny = 0L
      for (i <- 0 until n) {
        val (xi, yi) = pts(i); val (xj, yj) = pts((i + 1) % n)
        val cr = xi * yj - xj * yi
        a2 += cr; nx += (xi + xj) * cr; ny += (yi + yj) * cr
      }
      (a2, nx / (3 * a2), ny / (3 * a2))
    }
    val want = rings.map(brute).map { case (a, x, y) => (a, Some(x), Some(y)) }
    assert(measure(rings) == want)
    assert(want.forall(_._1 > 0), "fixture rings must be CCW")
  }
}
