package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property laws for the graph and time-series additions: triangle
  * counts against brute-force enumeration on random graphs, and the
  * exact-EWMA fold against a driver-side reference recursion — the
  * randomized twins of the hand-picked cases in GraphSpec /
  * TimeSeriesSpec.
  */
class GraphPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  // random graphs over ≤12 nodes with enough density for triangles
  private val edgeGen = Gen.listOfN(30,
    Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))

  /** Brute force: every {a,b,c} with all three canonical edges. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.toSet
    val ids = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      a <- ids; b <- ids if a < b && es((a, b))
      c <- ids if b < c && es((b, c)) && es((a, c))
    } yield (a, b, c)
    tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
  }

  test("law: triangleCounts equals brute-force enumeration") {
    check(Prop.forAll(edgeGen) { edges =>
      val got = Graph.triangleCounts(edges.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == refTriangles(edges)
    })
  }

  // (key, ts, cents) series with duplicate keys and shuffled arrival
  private val seriesGen = Gen.listOfN(25,
    Gen.zip(Gen.choose(1L, 3L), Gen.choose(1L, 15L),
      Gen.choose(-1000L, 1000L)))
    .map(_.distinctBy(r => (r._1, r._2))) // unique (key, ts) per row

  /** Driver reference: num = Σ cents_p·2^(p−1) over the trailing
    * window in ts order, den = 2^n − 1.
    */
  private def refEwma(rows: Seq[(Long, Long, Long)], window: Int)
      : Map[(Long, Long), (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val ordered = rs.sortBy(_._2)
      ordered.indices.map { i =>
        val frame = ordered.slice((i - window + 1) max 0, i + 1)
        val num = frame.zipWithIndex
          .map { case ((_, _, c), p) => c * (1L << p) }.sum
        (k, ordered(i)._2) -> (num, (1L << frame.size) - 1L)
      }
    }

  test("law: ewmaExact equals the driver fold at any window") {
    check(Prop.forAll(seriesGen, Gen.choose(1, 8)) { (rows, w) =>
      rows.isEmpty || {
        val got = TimeSeries.ewmaExact(rows.toDF("k", "ts", "cents"),
            "k", col("ts"), col("ts"), col("cents"), w)
          .select("k", "ts", "ewma_num", "ewma_den")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        got == refEwma(rows, w)
      }
    })
  }

  /** Driver BFS reference: min directed-hop distance ≤ maxHops. */
  private def refHops(edges: Seq[(Long, Long)], sources: Set[Long],
      maxHops: Int): Map[Long, Long] = {
    val adj = edges.distinct.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).toSet }
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    for (k <- 1 to maxHops) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> k.toLong)
      frontier = next
    }
    dist
  }

  test("law: shortestHops equals driver BFS on random graphs") {
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.choose(1L, 15L), Gen.choose(1L, 15L))),
      Gen.nonEmptyListOf(Gen.choose(1L, 15L)).map(_.take(3)),
      Gen.choose(1, 5))
    check(Prop.forAll(gen) { case (edges, srcs, hops) =>
      val got = Graph.shortestHops(edges.toDF("s", "d"), "s", "d",
          srcs.toDF("id"), hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == refHops(edges, srcs.toSet, hops)
    })
  }

  test("shortestHops: unreached nodes are absent, sources are hop 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val out = Graph.shortestHops(edges.toDF("s", "d"), "s", "d",
        Seq(1L).toDF("id"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("law: triangleCounts is partitioning-invariant") {
    val edges = (1 to 40).map(i => ((i % 7).toLong, (i % 11).toLong))
    val a = Graph.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.triangleCounts(
        (edges ++ edges).toDF("s", "d").repartition(13), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a === refTriangles(edges))
  }
}
