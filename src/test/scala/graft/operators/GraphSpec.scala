package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side mirror of the exact integer contract. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      scaleBits: Int = 40): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val scale = 1L << scaleBits
    val n = nodes.size.toLong
    val base = (scale * 15L / 100L) / n
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(v => v -> (base + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .as[(Long, Long)].collect().toMap

  private val triangle = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
  private val web = Seq( // hub 1, authority 4, dangling 5
    1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 1L, 2L -> 5L)

  test("matches the exact integer reference, iteration by iteration") {
    for (iters <- 0 to 4; g <- Seq(triangle, web)) {
      assert(run(g, iters) == refPageRank(g, iters), s"iters=$iters graph=$g")
    }
  }

  test("authority outranks the dangling sink; total mass is bounded") {
    val got = run(web, 5)
    assert(got(4L) > got(5L) && got(4L) > got(2L))
    assert(got.values.forall(_ > 0))
    assert(got.values.sum <= (1L << 40))
  }

  test("duplicate edges vote once (Brin–Page convention)") {
    val dup = web ++ Seq(1L -> 2L, 1L -> 2L, 2L -> 4L)
    assert(run(dup, 3) == run(web, 3))
  }

  test("bit-identical under repartitioning and input row order") {
    val edges = (0 until 300).map(i => ((i * 7919L) % 40, (i * 104729L) % 40))
    val a = Graph.pageRank(edges.toDF("s", "d").repartition(17), "s", "d", 4)
      .as[(Long, Long)].collect().toMap
    val shuffled = new scala.util.Random(7).shuffle(edges)
    val b = Graph.pageRank(shuffled.toDF("s", "d").coalesce(1), "s", "d", 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a == refPageRank(edges, 4))
  }

  test("self-loops and isolated-by-direction nodes are handled") {
    // 7 links only to itself; 8 only receives
    val g = Seq(7L -> 7L, 7L -> 8L)
    assert(run(g, 3) == refPageRank(g, 3))
  }
}
