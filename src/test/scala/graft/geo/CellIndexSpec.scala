package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests over a seeded deterministic sample (no
 * scalatestplus bridge in the offline cache, so forAll is hand-rolled). */
class CellIndexSpec extends AnyFunSuite {
  private def cases(n: Int, seed: Long = 42L): Seq[(Double, Double, Int)] = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      (rnd.nextDouble() * 179.998 - 89.999,
        rnd.nextDouble() * 359.998 - 179.999,
        rnd.nextInt(CellIndex.MaxRes + 1))
    }
  }

  test("round trip: cell bounds contain the encoded point") {
    cases(2000).foreach { case (lat, lon, res) =>
      val c = CellIndex.latLonToCell(lat, lon, res)
      val (lonMin, latMin, lonMax, latMax) = CellIndex.bounds(c)
      assert(lon >= lonMin && lon <= lonMax, s"$lat $lon $res")
      assert(lat >= latMin && lat <= latMax, s"$lat $lon $res")
      assert(CellIndex.res(c) == res)
    }
  }

  test("exact hierarchy: parent(cell(p, r)) == cell(p, pr) for all pr <= r") {
    cases(500).foreach { case (lat, lon, res0) =>
      val res = math.max(res0, 1)
      val fine = CellIndex.latLonToCell(lat, lon, res)
      (0 until res).foreach { pr =>
        assert(CellIndex.parent(fine, pr) == CellIndex.latLonToCell(lat, lon, pr),
          s"parent identity failed at res=$res pr=$pr lat=$lat lon=$lon")
      }
    }
  }

  test("children partition the parent") {
    cases(500).foreach { case (lat, lon, res0) =>
      val res = math.min(res0, CellIndex.MaxRes - 1)
      val c = CellIndex.latLonToCell(lat, lon, res)
      val kids = CellIndex.children(c)
      assert(kids.length == 4)
      assert(kids.forall(k => CellIndex.parent(k, res) == c))
      assert(kids.distinct.length == 4)
    }
  }

  test("ring sizes and membership") {
    val rnd = new java.util.Random(7L)
    cases(500, 7L).foreach { case (lat, lon, _) =>
      val res = 2 + rnd.nextInt(19)
      val k = 1 + rnd.nextInt(4)
      val c = CellIndex.latLonToCell(lat, lon, res)
      val r = CellIndex.ring(c, k)
      assert(r.length <= 8 * k)
      val n = 1L << res
      r.foreach { cell =>
        assert(CellIndex.res(cell) == res)
        if (2L * k + 1 < n) { // non-degenerate: exact Chebyshev distance k (with x-wrap)
          val dx0 = math.abs(CellIndex.ix(cell) - CellIndex.ix(c))
          val dx = math.min(dx0, n - dx0)
          val dy = math.abs(CellIndex.iy(cell) - CellIndex.iy(c))
          assert(math.max(dx, dy) == k)
        }
      }
      assert(r.distinct.length == r.length)
    }
  }

  test("rings are pairwise disjoint and their union covers the grid") {
    // regression: ring(k) for k > n/2 used to re-emit wrapped cells that
    // belong to ring n-k, duplicating kNN candidates across bands
    for (res <- 2 to 5) {
      val n = 1L << res
      val c = CellIndex.latLonToCell(37.3, -12.9, res)
      val all = (0 to 2 * n.toInt).flatMap(k => CellIndex.ring(c, k))
      assert(all.distinct.length == all.length,
        s"res=$res: rings overlap (${all.length} vs ${all.distinct.length})")
      assert(all.toSet.size == (n * n).toInt, s"res=$res: union misses cells")
    }
  }

  test("ring 0 is the cell; disk(2) has 25 cells away from poles") {
    val c = CellIndex.latLonToCell(10, 10, 8)
    assert(CellIndex.ring(c, 0).toSeq == Seq(c))
    assert(CellIndex.disk(c, 2).length == 25)
  }

  test("kNN bound: points outside disk(k) are at least minDistSqBeyondDisk away") {
    val rnd = new java.util.Random(13L)
    var checked = 0
    (0 until 5000).foreach { _ =>
      val lat = rnd.nextDouble() * 170 - 85
      val lon = rnd.nextDouble() * 350 - 175
      val lat2 = rnd.nextDouble() * 170 - 85
      val lon2 = rnd.nextDouble() * 350 - 175
      val res = 4 + rnd.nextInt(9)
      val k = rnd.nextInt(4)
      val c = CellIndex.latLonToCell(lat, lon, res)
      val c2 = CellIndex.latLonToCell(lat2, lon2, res)
      val n = 1L << res
      val dx0 = math.abs(CellIndex.ix(c2) - CellIndex.ix(c))
      val dy = math.abs(CellIndex.iy(c2) - CellIndex.iy(c))
      val cheb = math.max(math.min(dx0, n - dx0), dy)
      if (cheb > k && math.min(dx0, n - dx0) == dx0) { // planar (non-wrap) cases
        val bound = CellIndex.minDistSqBeyondDisk(lat, lon, res, k)
        val d2 = Geometry.distSq(lon, lat, lon2, lat2)
        assert(d2 >= bound - 1e-12, s"violated: d2=$d2 bound=$bound cheb=$cheb k=$k res=$res")
        checked += 1
      }
    }
    assert(checked > 1000)
  }

  test("cell id bit layout round trips at extremes") {
    (0 to CellIndex.MaxRes).foreach { res =>
      val n = 1L << res
      val xs = Seq(0L, n - 1, n / 2).distinct
      for (x <- xs; y <- xs) {
        val c = CellIndex.make(res, x, y)
        assert(CellIndex.ix(c) == x && CellIndex.iy(c) == y && CellIndex.res(c) == res)
      }
    }
  }

  test("clamping at the domain edges") {
    assert(CellIndex.ix(CellIndex.latLonToCell(0, 180.0, 10)) == (1L << 10) - 1)
    assert(CellIndex.ix(CellIndex.latLonToCell(0, -180.0, 10)) == 0)
    assert(CellIndex.iy(CellIndex.latLonToCell(90.0, 0, 10)) == (1L << 10) - 1)
    assert(CellIndex.iy(CellIndex.latLonToCell(-90.0, 0, 10)) == 0)
  }
}
