package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the fixed-point update, for tiny graphs. */
  private def refPageRank(
      edges: Seq[(Long, Long)], iters: Int,
      dangling: Boolean = false): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val init = Graph.Scale / nodes.size
    val base = 15L * init / 100L
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      val dang =
        if (!dangling) 0L
        else nodes.filterNot(deg.contains).map(r).sum / nodes.size
      r = nodes.map(n => n ->
        (base + 85L * (sums.getOrElse(n, 0L) + dang) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
      dangling: Boolean = false): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters,
        danglingRedistribute = dangling)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank matches the driver-side reference on a small graph") {
    // 1 and 2 both point at 3; 3 points back at 1; 4 → 3 dangling-ish
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L))
    assert(run(edges, 3) === refPageRank(edges, 3))
    assert(run(edges, 5) === refPageRank(edges, 5))
  }

  test("pageRank ranks the hub of a star highest") {
    val edges = (1L to 20L).map(i => (i, 100L))
    val r = run(edges, 3)
    val hub = r(100L)
    assert((1L to 20L).forall(i => r(i) < hub))
  }

  test("pageRank is invariant to input partitioning and duplicates") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val base = run(edges, 4)
    val dupDf = (edges ++ edges ++ edges).toDF("s", "d").repartition(7)
    val shuffled = Graph.pageRank(dupDf, "s", "d", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base === shuffled)
  }

  test("pageRank deep run (past checkpoint threshold) matches reference") {
    // > DeepIterThreshold iterations exercises the per-round
    // localCheckpoint truncation; the fixed point must be unaffected
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L))
    assert(run(edges, Graph.DeepIterThreshold + 2) ===
      refPageRank(edges, Graph.DeepIterThreshold + 2))
  }

  test("pageRank dangling redistribute matches reference, lifts sinks") {
    // node 3 is the only sink; with redistribution its held mass is
    // shared each round instead of leaking
    val edges = Seq((1L, 3L), (2L, 3L), (4L, 3L), (4L, 1L))
    val leak = run(edges, 3)
    val redist = run(edges, 3, dangling = true)
    assert(redist === refPageRank(edges, 3, dangling = true))
    // redistribution strictly adds mass (every node gains or holds)
    assert(redist.forall { case (id, r) => r >= leak(id) })
    assert(redist.values.sum > leak.values.sum)
    // and is partitioning-invariant like the leak variant
    val shuffled = Graph.pageRank(
        (edges ++ edges).toDF("s", "d").repartition(5), "s", "d", 3,
        danglingRedistribute = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === redist)
  }

  test("pageRank symmetric cycle gives equal ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val r = run(edges, 6)
    assert(r.values.toSet.size === 1)
  }

  private def tris(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCounts on K4: every node closes 3 triangles") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    assert(tris(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: one triangle + pendant edge; stars are empty") {
    assert(tris(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a star has wedges but no closing edges
    assert(tris((2L to 9L).map(i => (1L, i))) === Map.empty)
  }

  test("triangleCounts is invariant to direction, dups, self-loops") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L),
      (3L, 1L)) // both orientations of {1,3}
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 2L))
    assert(tris(noisy) === tris(base))
    // {1,3} shared by triangles {1,2,3} and {1,3,4}
    assert(tris(base) === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("connectedComponents labels each component by its min member") {
    import spark.implicits._
    // two chains {1,2,3}, {10,11} and an isolated self-loop {20}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
      .toDF("src", "dst")
    val out = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("personalizedPageRank: mass flows from seeds only") {
    import spark.implicits._
    // 1 → 2, 3 → 4, seed {1}: after one round r(1) = base = 0.15·S,
    // r(2) = 0.85·S; the disconnected 3→4 pair never gets mass
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.personalizedPageRank(edges, "src", "dst",
        iterations = 1, seeds = Seq(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = Graph.Scale
    assert(out(1L) === 15L * s / 100L)
    assert(out(2L) === 85L * s / 100L)
    assert(out(3L) === 0L && out(4L) === 0L)
    // two seeds split the teleport mass exactly
    val two = Graph.personalizedPageRank(edges, "src", "dst", 1,
        Seq(1L, 3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two(2L) === 85L * (s / 2) / 100L)
    assert(two(2L) === two(4L))
  }

  test("neighborJaccard: hand-checked scores, hub cap prunes centers") {
    import spark.implicits._
    // path 1-2-3 plus 1-4, 3-4: N(1)={2,4}, N(3)={2,4} → J(1,3)=1;
    // N(2)={1,3}, N(4)={1,3} → J(2,4)=1; J(1,3) vs J(1,2): N(2)={1,3},
    // common(1,2) = ∅? 1's neighbors {2,4}, 2's {1,3} → common via
    // wedge centers: pairs sharing a center only
    val g = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.neighborJaccard(g, "src", "dst", topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((1L, 3L)) === ((2L, 1.0))) // share both neighbors
    assert(out((2L, 4L)) === ((2L, 1.0)))
    assert(!out.contains((1L, 2L))) // adjacent but no shared neighbor
    // a hub center: star 10→{1..5} plus edge 1-2. Uncapped, the hub
    // emits all C(5,2) leaf pairs; with the cap at 4 those vanish and
    // only the wedges through low-degree centers 1 and 2 remain
    val star = ((1L to 5L).map(n => (10L, n)) ++ Seq((1L, 2L)))
      .toDF("src", "dst")
    val full = Graph.neighborJaccard(star, "src", "dst", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.size === 10 + 2) // 10 hub pairs + (1,10) + (2,10)
    val capped = Graph.neighborJaccard(star, "src", "dst", 100,
        maxCenterDegree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((2L, 10L), (1L, 10L)))
  }

  private def kcore(edges: Seq[(Long, Long)], k: Int, rounds: Int) = {
    import spark.implicits._
    Graph.kCorePeel(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCorePeel: triangle survives a 2-core peel, pendant dies") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(kcore(g, k = 2, rounds = 2) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCorePeel: a chain unravels one shell per round") {
    // path 1-2-3-4-5 under k=2: endpoints die round 1, their
    // neighbors round 2, everything by round 3
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(kcore(path, 2, 1) === Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    assert(kcore(path, 2, 3) === Map.empty)
  }

  test("kCorePeel is invariant to direction, dups, self-loops") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 2L), (1L, 2L))
    assert(kcore(noisy, 2, 2) === kcore(base, 2, 2))
  }

  test("adamicAdar: hand-computed degree-weighted wedge scores") {
    // triangle 1-2-3 plus pendant 3-4: degrees 2,2,3,1. Center 3
    // (deg 3) spawns (1,2),(1,4),(2,4) at weight 1/ln3; centers 1 and
    // 2 (deg 2) spawn (2,3) and (1,3) at the stronger 1/ln2 — the
    // selective-neighbor pairs must outrank the hub-mediated ones
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.adamicAdar(edges, "src", "dst", topK = 10)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._1).toSeq ===
      Seq((1L, 3L), (2L, 3L), (1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out.forall(_._2 == 1L)) // every pair has ONE common neighbor
    val ln2 = 1.0 / math.log(2.0)
    val ln3 = 1.0 / math.log(3.0)
    assert(math.abs(out(0)._3 - ln2) < 1e-9)
    assert(math.abs(out(2)._3 - ln3) < 1e-9)
  }

  test("hits: one hand-unrolled round of exact L1 mutual reinforcement") {
    // 1→3, 2→3, 3→4 with S = 1e9. Round 1 by hand:
    //   aRaw = (3: 2S, 4: S), tot 3S → a(3) = 2S/3 = 666666666,
    //   a(4) = S/3 = 333333333
    //   hRaw = (1: a3, 2: a3, 3: a4), tot 1666666665 →
    //   h(1) = h(2) = 400000000, h(3) = 200000000 (both divisions
    //   exact), h(4) = 0
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iterations = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((400000000L, 0L)), 2L -> ((400000000L, 0L)),
      3L -> ((200000000L, 666666666L)), 4L -> ((0L, 333333333L))))
  }

  test("hits is stable across reruns and partitionings") {
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, i % 7 + 100L), (i, i % 5 + 100L))).toDF("src", "dst")
    def run(parts: Int): Seq[(Long, Long, Long)] =
      Graph.hits(edges.repartition(parts), "src", "dst", 3)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) === run(13))
  }

  test("degreeAssortativity: star = -1, clique = null (regular)") {
    // star K1,3: endpoint-degree pairs are (3,1)x3 and (1,3)x3 —
    // perfectly disassortative, r = -1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val s = Graph.degreeAssortativity(star, "src", "dst").collect().head
    assert(s.getLong(0) === 6L)
    assert(math.abs(s.getDouble(1) - (-1.0)) < 1e-12)
    // triangle: every degree 2, zero variance -> null, not NaN
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val t = Graph.degreeAssortativity(tri, "src", "dst").collect().head
    assert(t.getLong(0) === 6L && t.isNullAt(1))
  }

  test("labelPropagation: two triangles and a bridge, hand-unrolled") {
    // triangles {1,2,3} and {4,5,6} joined by bridge 3-4. Sync rounds
    // with (count desc, label asc) tie-break, unrolled by hand:
    // r1 [2,1,1,3,4,4] r2 [1,1,1,4,3,3] r3 [1,1,1,3,3,3] r4 stable —
    // each triangle settles on its smallest member id, the bridge
    // never merges the communities
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")
    def run(r: Int): Map[Long, Long] =
      Graph.labelPropagation(edges, "src", "dst", r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(1) === Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 4L, 6L -> 4L))
    assert(run(4) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(run(5) === run(4)) // fixed point reached
  }

  test("labelPropagation converges a clique to its smallest id") {
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(k4, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("adamicAdar hub cap drops only hub-mediated wedges") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    // cap 2 removes center 3 (deg 3): only the deg-2 centers remain
    val capped = Graph.adamicAdar(edges, "src", "dst", topK = 10,
        maxCenterDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 3L), (2L, 3L)))
  }
}
