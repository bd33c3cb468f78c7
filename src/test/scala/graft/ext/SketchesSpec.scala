package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def items(n: Int, group: String) =
    (0 until n).map(i => (group, s"key_${group}_$i")).toDF("g", "key")

  test("kmvSketch keeps the k smallest distinct hashes, ascending") {
    val df = items(500, "a")
    val sk = Sketches.kmvSketch(df, col("key"), Seq("g"), 32).collect()
    assert(sk.length === 1)
    val row = sk.head
    assert(row.getAs[Long]("n_distinct") === 500)
    val hashes = row.getSeq[Long](row.fieldIndex("sketch"))
    assert(hashes.length === 32)
    assert(hashes === hashes.sorted, "sketch must be ascending")
    // cross-check against a brute-force bottom-k of the same hash
    val brute = (0 until 500)
      .map(i => Dedup.hash48Value(s"key_a_$i")).distinct.sorted.take(32)
    assert(hashes === brute)
    assert(row.getAs[Long]("k_small") === brute.last)
  }

  test("kmvSketch is exact (k_small null) below k distinct") {
    val sk = Sketches.kmvSketch(items(10, "a"), col("key"), Seq("g"), 32)
      .select(col("n_distinct"), col("k_small"),
        Sketches.kmvEstimate(col("n_distinct"), col("k_small"), 32)
          .as("est"))
      .collect().head
    assert(sk.getAs[Long]("n_distinct") === 10)
    assert(sk.isNullAt(sk.fieldIndex("k_small")))
    assert(sk.getAs[Double]("est") === 10.0)
  }

  test("kmvSketch ignores duplicate keys (set semantics)") {
    val dup = items(100, "a").unionAll(items(100, "a"))
    val once = Sketches.kmvSketch(items(100, "a"), col("key"), Seq("g"), 16)
      .select("sketch", "n_distinct").collect().head
    val twice = Sketches.kmvSketch(dup, col("key"), Seq("g"), 16)
      .select("sketch", "n_distinct").collect().head
    assert(once.getSeq[Long](0) === twice.getSeq[Long](0))
    assert(once.getLong(1) === twice.getLong(1))
  }

  test("kmvSketch is partitioning-invariant (mergeable state)") {
    val df = items(800, "a")
    def run(parts: Int) =
      Sketches.kmvSketch(df.repartition(parts), col("key"), Seq("g"), 64)
        .select("sketch").collect().head.getSeq[Long](0)
    assert(run(1) === run(13))
  }

  test("kmvEstimate lands within 3/sqrt(k) of the true cardinality") {
    val k = 256
    val n = 20000
    val est = Sketches.kmvSketch(items(n, "a"), col("key"), Seq("g"), k)
      .select(Sketches.kmvEstimate(col("n_distinct"), col("k_small"), k)
        .as("est"))
      .collect().head.getDouble(0)
    val rel = math.abs(est - n) / n
    assert(rel < 3.0 / math.sqrt(k),
      s"estimate $est vs true $n: rel error $rel")
  }

  test("kmvPairwise estimates Jaccard of overlapping sets") {
    // a = keys 0..999 of shared pool, b = keys 500..1499 → J = 1/3
    val pool = (0 until 1500).map(i => s"shared_$i")
    val a = pool.take(1000).map(("a", _)).toDF("g", "key")
    val b = pool.drop(500).map(("b", _)).toDF("g", "key")
    val k = 256
    val sk = Sketches.kmvSketch(a.unionAll(b), col("key"), Seq("g"), k)
    val row = Sketches.kmvPairwise(sk, "g", k).collect().head
    assert(row.getAs[String]("src_a") === "a")
    assert(row.getAs[String]("src_b") === "b")
    val jac = row.getAs[Double]("jaccard_est")
    assert(math.abs(jac - 1.0 / 3) < 3.0 / math.sqrt(k),
      s"jaccard_est $jac vs 1/3")
    val union = row.getAs[Double]("union_est")
    assert(math.abs(union - 1500) / 1500 < 3.0 / math.sqrt(k),
      s"union_est $union vs 1500")
    val inter = row.getAs[Double]("inter_est")
    assert(math.abs(inter - 500) / 500 < 6.0 / math.sqrt(k),
      s"inter_est $inter vs 500")
  }

  test("kmvPairwise on disjoint sets reports zero overlap") {
    val sk = Sketches.kmvSketch(
      items(300, "a").unionAll(items(300, "b")), col("key"), Seq("g"), 64)
    val row = Sketches.kmvPairwise(sk, "g", 64).collect().head
    assert(row.getAs[Long]("n_common") === 0L)
    assert(row.getAs[Double]("jaccard_est") === 0.0)
    assert(row.getAs[Double]("inter_est") === 0.0)
  }

  test("kmvPairwise merged sketch is exact below k (small sets)") {
    // 20 + 20 distinct with 10 shared → union 30 < k = 64: estimates exact
    val pool = (0 until 30).map(i => s"s_$i")
    val a = pool.take(20).map(("a", _)).toDF("g", "key")
    val b = pool.drop(10).map(("b", _)).toDF("g", "key")
    val sk = Sketches.kmvSketch(a.unionAll(b), col("key"), Seq("g"), 64)
    val row = Sketches.kmvPairwise(sk, "g", 64).collect().head
    assert(row.getAs[Long]("n_common") === 10L)
    assert(row.getAs[Double]("union_est") === 30.0)
    assert(row.getAs[Double]("jaccard_est") === 10.0 / 30.0)
  }

  // ------------------------------------------------------ count-min
  private def freqDf = (1 to 40).flatMap(i =>
    Seq.fill(i % 5 + 1)(s"k_$i")).toDF("key")

  test("cms estimates are never below the true frequency") {
    val d = freqDf
    val sk = Sketches.cmsBuild(d, col("key"), 3, 16)
    val joined = Sketches.cmsEstimate(sk, d, "key", 3, 16)
      .join(d.groupBy("key").count(), "key")
      .collect()
    assert(joined.length === 40)
    joined.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("count"),
        s"underestimate at ${r.getAs[String]("key")}")
    }
  }

  test("cms is exact when the width kills collisions") {
    val d = freqDf
    val sk = Sketches.cmsBuild(d, col("key"), 4, 1 << 16)
    Sketches.cmsEstimate(sk, d, "key", 4, 1 << 16)
      .join(d.groupBy("key").count(), "key")
      .collect().foreach { r =>
        assert(r.getAs[Long]("cms_est") === r.getAs[Long]("count"))
      }
  }

  test("cms shard merge equals the single build") {
    val d = freqDf
    val half1 = d.filter(col("key") < "k_3")
    val half2 = d.filter(col("key") >= "k_3")
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(half1, col("key"), 3, 16),
      Sketches.cmsBuild(half2, col("key"), 3, 16))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val full = Sketches.cmsBuild(d, col("key"), 3, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged === full)
  }

  test("cms never-seen key estimates zero (absent cells coalesce)") {
    val sk = Sketches.cmsBuild(freqDf, col("key"), 3, 1 << 16)
    val probe = Seq("never_seen_a", "never_seen_b").toDF("key")
    Sketches.cmsEstimate(sk, probe, "key", 3, 1 << 16)
      .collect().foreach(r => assert(r.getAs[Long]("cms_est") === 0L))
  }
}
