package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.HtmlParser
import graft.sources.Fixtures.mix

/**
 * Total-safety fuzz over the byte-level kernels: on a 10^12-row corpus
 * every decoder WILL eventually see adversarial bytes, and the contract
 * is "drop the row, never kill the job" — so decodePpm / decodeWavPcm16
 * must return (never throw) on ARBITRARY input, and HtmlParser.parse
 * must return a structurally-sane tree for any byte soup. Seeded
 * deterministic draws (mix), same convention as TopKPropertySpec — no
 * scalatestplus bridge in the offline cache.
 */
class FuzzSafetySpec extends AnyFunSuite {

  private def randomBytes(seed: Long, maxLen: Int): Array[Byte] = {
    val len = (mix(seed) & 0x7fffffff).toInt % (maxLen + 1)
    Array.tabulate(len)(i => (mix(seed * 1000003L + i) & 0xff).toByte)
  }

  /** Flip `flips` random bytes of a valid payload — the "slightly
   * corrupted real file" shape that pure-random fuzz rarely reaches. */
  private def mutate(valid: Array[Byte], seed: Long, flips: Int): Array[Byte] = {
    val out = valid.clone()
    (0 until flips).foreach { f =>
      val pos = ((mix(seed * 31 + f) & 0x7fffffff) % out.length).toInt
      out(pos) = (mix(seed * 37 + f) & 0xff).toByte
    }
    out
  }

  test("yBandIndex/pointInPolygonIndexed total and plain-identical on adversarial rings") {
    // rings with NaN / ±Inf / denormal coordinates: the indexed ray cast
    // must neither throw nor diverge from the plain one (both skip
    // non-finite edges through the same NaN-propagating crossing test)
    import graft.geo.Geometry
    def coord(seed: Long): Double = (mix(seed) % 13).toInt match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => java.lang.Double.MIN_VALUE
      case 4 => -0.0
      case 5 => 1e308
      case _ => (mix(seed * 7 + 1) % 4001).toInt / 100.0 - 20.0
    }
    for (trial <- 0 until 300) {
      val n = 3 + ((mix(trial) & 0x7fffffff) % 12).toInt
      val ring = Array.tabulate(2 * n)(i => coord(trial * 10007L + i))
      for (bands <- Seq(1, 3, 16)) {
        val idx = Geometry.yBandIndex(ring, bands)
        for (p <- 0 until 40) {
          val x = coord(trial * 65537L + p * 2)
          val y = coord(trial * 65537L + p * 2 + 1)
          val plain = Geometry.pointInPolygon(x, y, ring)
          val indexed = Geometry.pointInPolygonIndexed(x, y, ring, idx)
          assert(plain == indexed, s"trial=$trial bands=$bands p=($x,$y) ring=${ring.toSeq}")
        }
      }
    }
  }

  test("decodePpm is total: random bytes and corrupted headers never throw") {
    (0 until 3000).foreach { s => Multimodal.decodePpm(randomBytes(s, 200)) }
    // random tails behind a plausible magic (exercises the header parser)
    (0 until 2000).foreach { s =>
      Multimodal.decodePpm("P6".getBytes ++ randomBytes(s + 10000, 100))
    }
    val rgb = Array.tabulate(8 * 6 * 3)(i => (i % 251).toByte)
    val valid = Multimodal.encodePpm(8, 6, rgb)
    (0 until 2000).foreach { s =>
      val m = mutate(valid, s, 1 + (s % 4))
      Multimodal.decodePpm(m).foreach { case (w, h, px) =>
        assert(w > 0 && h > 0 && px.length.toLong == w.toLong * h * 3)
      }
      // truncations at every boundary
      Multimodal.decodePpm(java.util.Arrays.copyOf(m, s % m.length))
    }
  }

  test("decodeWavPcm16 is total: random bytes and corrupted chunks never throw") {
    (0 until 3000).foreach { s => Multimodal.decodeWavPcm16(randomBytes(s, 200)) }
    val valid = Multimodal.encodeWavPcm16(8000,
      Array.tabulate(64)(i => ((i * 991) % 65536 - 32768).toShort))
    (0 until 2000).foreach { s =>
      val m = mutate(valid, s, 1 + (s % 6))
      Multimodal.decodeWavPcm16(m).foreach { case (rate, samples) =>
        assert(rate > 0 && samples != null)
      }
      Multimodal.decodeWavPcm16(java.util.Arrays.copyOf(m, s % m.length))
    }
  }

  test("PPM and WAV round-trip identity over seeded random payloads") {
    (0 until 50).foreach { s =>
      val w = 1 + ((mix(s) & 0x7fffffff) % 40).toInt
      val h = 1 + ((mix(s + 500) & 0x7fffffff) % 40).toInt
      val rgb = Array.tabulate(w * h * 3)(i => (mix(s * 7919L + i) & 0xff).toByte)
      val Some((w2, h2, back)) = Multimodal.decodePpm(Multimodal.encodePpm(w, h, rgb))
      assert(w2 == w && h2 == h && java.util.Arrays.equals(back, rgb))
      val n = ((mix(s + 900) & 0x7fffffff) % 300).toInt
      val samples = Array.tabulate(n)(i => (mix(s * 104729L + i) & 0xffff).toInt.toShort)
      val Some((rate, sBack)) = Multimodal.decodeWavPcm16(
        Multimodal.encodeWavPcm16(44100, samples))
      assert(rate == 44100 && java.util.Arrays.equals(sBack, samples))
    }
  }

  test("HtmlParser.parse is total and structurally sane on byte soup") {
    // random bytes, plus soups biased toward markup metacharacters
    val meta = "<>/=\"' abc&#;!-".getBytes("US-ASCII")
    (0 until 2000).foreach { s =>
      val raw =
        if (s % 2 == 0) randomBytes(s, 300)
        else Array.tabulate(((mix(s) & 0xff) + 1).toInt)(i =>
          meta(((mix(s * 131L + i) & 0x7fffffff) % meta.length).toInt))
      val res = HtmlParser.parse(raw)
      res.nodes.foreach { n =>
        assert(n.startByte >= 0 && n.startByte <= n.endByte && n.endByte <= raw.length,
          s"node span out of bounds for seed $s: $n")
        assert(n.depth >= 0)
      }
      // ids resolve: every non-root parentId is a node id in the result
      val ids = res.nodes.map(_.id).toSet
      res.nodes.filter(_.kind != "document").foreach { n =>
        assert(ids.contains(n.parentId), s"dangling parent for seed $s")
      }
    }
  }
}
