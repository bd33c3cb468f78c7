package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("matchDistribution: quotas follow the target shape, shortfall " +
      "is reported not rebalanced, draw is deterministic") {
    // target: half low (1), half high (100) -> 2 bins, quota 5 each
    val target = ((1 to 10).map(_ => 1L) ++ (1 to 10).map(_ => 100L))
      .toDF("v")
    // source: 8 low candidates, 6 high
    val source = ((1L to 8L).map(i => (i, i)) ++
      (11L to 16L).map(i => (i, 60L + i))).toDF("id", "v")
    val got = Sampling.matchDistribution(target, source, col("v"),
        col("v"), "id", nBins = 2, n = 10, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 10)
    assert(got.count(_._2 == 0L) === 5 && got.count(_._2 == 1L) === 5)
    // deterministic: same inputs, same winners
    val again = Sampling.matchDistribution(target, source, col("v"),
        col("v"), "id", nBins = 2, n = 10, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // shortfall: only 3 high-bin candidates -> bin delivers 3, the
    // low bin does NOT absorb the missing 2
    val thin = ((1L to 8L).map(i => (i, i)) ++
      (11L to 13L).map(i => (i, 60L + i))).toDF("id", "v")
    val short = Sampling.matchDistribution(target, thin, col("v"),
        col("v"), "id", nBins = 2, n = 10, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(short.count(_._2 == 1L) === 3)
    assert(short.count(_._2 == 0L) === 5)
  }

  test("hashUnit is deterministic, in [0,1), and salt-independent draws") {
    val u1 = Sampling.hashUnit(col("id"), "a")
    val r = ids.select(u1.as("u")).collect().map(_.getDouble(0))
    assert(r.forall(u => u >= 0.0 && u < 1.0))
    val r2 = ids.select(Sampling.hashUnit(col("id"), "a").as("u"))
      .collect().map(_.getDouble(0))
    assert(r.sameElements(r2)) // rerun-stable
    val rb = ids.select(Sampling.hashUnit(col("id"), "b").as("u"))
      .collect().map(_.getDouble(0))
    assert(!r.sameElements(rb)) // different salt = different draw
  }

  test("sampleByHash keeps ~fraction and is a stable subset") {
    val kept = Sampling.sampleByHash(ids, "id", 0.25, "s").collect()
      .map(_.getLong(0)).toSet
    assert(math.abs(kept.size / 2000.0 - 0.25) < 0.05)
    // sampling at a higher rate with the same salt is a superset
    val keptMore = Sampling.sampleByHash(ids, "id", 0.5, "s").collect()
      .map(_.getLong(0)).toSet
    assert(kept.subsetOf(keptMore))
  }

  test("splitAssign covers every row, respects weights, disjoint splits") {
    val bySplit = Sampling.splitAssign(ids, "id",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), "sp")
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == 2000L)
    assert(math.abs(bySplit("train") / 2000.0 - 0.8) < 0.05)
    assert(math.abs(bySplit("valid") / 2000.0 - 0.1) < 0.03)
    assert(math.abs(bySplit("test") / 2000.0 - 0.1) < 0.03)
  }

  test("splitAssign normalizes weights (2:1:1 == 0.5:0.25:0.25)") {
    val a = Sampling.splitAssign(ids, "id",
      Seq("x" -> 2.0, "y" -> 1.0, "z" -> 1.0), "nw").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.splitAssign(ids, "id",
      Seq("x" -> 0.5, "y" -> 0.25, "z" -> 0.25), "nw").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("shardAssign: complete, balanced, layout-independent") {
    val n = 8
    val a = Sampling.shardAssign(ids, "id", n, "sh").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.forall(s => s >= 0 && s < n))
    // every shard hit, roughly uniformly (2000 ids over 8 shards)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == n)
    assert(sizes.values.forall(c => c > 150 && c < 350))
    // assignment is a function of the id, not the partitioning
    val b = Sampling.shardAssign(ids.repartition(7), "id", n, "sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("capPerKey: exact cap, under-cap keys intact, layout-stable") {
    val rows = (0L until 900L).map(i => (i, s"k${(i % 3).toInt}"))
      .toDF("id", "key")
      // key k0 also appears only 10 times extra under another name
      .union((1000L until 1010L).map(i => (i, "rare")).toDF("id", "key"))
    val kept = Sampling.capPerKey(rows, Seq("key"), "id", 100, "c")
    val byKey = kept.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("k0") == 100 && byKey("k1") == 100 && byKey("k2") == 100)
    assert(byKey("rare") == 10) // under the cap: every row survives
    // survivors are a stable function of (key, id), not the layout
    val again = Sampling.capPerKey(rows.repartition(13), Seq("key"),
      "id", 100, "c")
    assert(kept.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      again.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // ranking is hash aggregation, not a per-key window sort
    import org.apache.spark.sql.execution.window.WindowExec
    kept.collect()
    def anyWindow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[WindowExec] || p.children.exists(anyWindow) ||
        (p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => anyWindow(a.executedPlan)
          case _ => false
        })
    assert(!anyWindow(kept.queryExecution.executedPlan))
  }

  test("packBins: complete, deterministic, append-style fill") {
    val docs = (0L until 300L).map(i => (i, 10L + i % 7))
      .toDF("id", "w")
    val packed = Sampling.packBins(docs, "id", "w", budget = 100.0,
      nShards = 4, salt = "pk")
    assert(packed.count() == 300) // every row assigned
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // layout-independent
    val again = Sampling.packBins(docs.repartition(11), "id", "w",
        budget = 100.0, nShards = 4, salt = "pk").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == again.toSet)
    // append-style: a non-trailing bin closes only once the running
    // sum crosses the budget, but its own start can sit past its
    // boundary by the previous row's straddle — so each non-trailing
    // bin holds at least budget - max_weight tokens (max w here is 16)
    val fills = packed.groupBy("shard", "bin").agg(sum("w").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    fills.foreach { case (_, bins) =>
      val sorted = bins.sortBy(_._2)
      sorted.init.foreach { case (_, _, t) => assert(t >= 84L) }
    }
  }

  test("globalIndex equals the single-window formulation, any layout") {
    val df = (0L until 5000L).toDF("id").repartition(13)
    val h = Dedup.hash48(concat(lit("gi"), col("id").cast("string")))
    val got = Sampling.globalIndex(df, "id", h,
        (h * 64) / lit(Sampling.HashSpan.toLong))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(h, col("id"))
    val want = df.withColumn("idx",
        row_number().over(w).cast("long") - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // a permutation: every index 0..n-1 exactly once
    assert(got.values.toSeq.sorted == (0L until 5000L))
  }

  test("globalIndex rejects bucket cardinality above MaxBuckets") {
    assert(Sampling.MaxBuckets == (1 << 20))
    // A pathological caller passing a per-row bucket (here: the id
    // itself over 2^20 + 1 rows) must fail fast — and the probe is a
    // limit()ed collect, so the driver materializes at most
    // MaxBuckets+1 count rows even when the bucket column has billions
    // of distinct values.
    val big = spark.range(Sampling.MaxBuckets + 1L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Sampling.globalIndex(big, "id", col("id"), col("id"))
    }
    assert(e.getMessage.contains("distinct buckets"))
    // ...while a bounded bucket expression over the same rows is fine
    val ok = Sampling.globalIndex(
      (0L until 100L).toDF("id"),
      "id", col("id"), col("id") % 10).collect()
    assert(ok.length == 100)
  }

  test("deterministicShuffle + curriculumShards: stable, contiguous") {
    val docs = (0L until 2000L).map(i => (i, (i * 37) % 501))
      .toDF("id", "len")
    val s1 = Sampling.deterministicShuffle(docs, "id", nBuckets = 32,
      salt = "x").collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val s2 = Sampling.deterministicShuffle(docs.repartition(7), "id",
      nBuckets = 32, salt = "x").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(s1 == s2) // layout-independent
    val sh = Sampling.curriculumShards(docs, "id", col("len"),
      floor(col("len") / 50), nShards = 4)
    val rows = sh.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.map(_._4).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    // shards are contiguous in the global order and equal-sized
    val byShard = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    assert(byShard.values.map(_.length).toSet == Set(500))
    (0 to 2).foreach { s =>
      assert(byShard(s).max < byShard(s + 1).min)
    }
    // ordering respects the score: easiest shard tops out below the
    // hardest shard's floor
    val lens = rows.groupBy(_._4).view.mapValues(_.map(_._2)).toMap
    assert(lens(0).max <= lens(3).min)
  }

  test("temperatureRates upsample small sources; α=1 is flat maxRate") {
    // src0: 1000 rows, src1: 400, src2: 100
    val docs = ((0L until 1000L).map(i => (i, "src0")) ++
      (1000L until 1400L).map(i => (i, "src1")) ++
      (1400L until 1500L).map(i => (i, "src2")))
      .toDF("id", "source")
    val flat = Sampling.temperatureRates(docs, "source", alpha = 1.0,
      maxRate = 0.5).toMap
    assert(flat.values.toSet == Set(0.5))
    val r = Sampling.temperatureRates(docs, "source", alpha = 0.5,
      maxRate = 0.5).toMap
    // biggest source pinned at maxRate; smaller sources keep more,
    // clamped at 1 (src2's raw rate 0.5·sqrt(10) ≈ 1.58 → 1.0)
    assert(r("src0") == 0.5)
    assert(r("src0") < r("src1") && r("src1") < r("src2"))
    assert(r("src2") == 1.0)
    // α=0.5 math: rate_s = maxRate·(n_s/nMax)^(α-1), clamped — same
    // pow formulation as the implementation (sqrt differs by 1 ulp)
    assert(r("src1") ==
      math.min(1.0, 0.5 * math.pow(400.0 / 1000.0, -0.5)))
    // kept fractions track the rates
    val kept = Sampling.temperatureMix(docs, "id", "source", alpha = 0.5,
        maxRate = 0.5, salt = "t")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(math.abs(kept("src0") / 1000.0 - 0.5) < 0.06)
    assert(math.abs(kept("src1") / 400.0 - r("src1")) < 0.1)
    assert(kept("src2") == 100L) // clamped rate 1.0 keeps everything
  }

  test("weightedMix applies per-source rates with default for unlisted") {
    val docs = (0L until 3000L)
      .map(i => (i, s"src${(i % 3).toInt}")).toDF("id", "source")
    val kept = Sampling.weightedMix(docs, "id", "source",
        Map("src0" -> 1.0, "src1" -> 0.2), default = 0.0, salt = "m")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") == 1000L) // rate 1.0 keeps everything
    assert(math.abs(kept("src1") / 1000.0 - 0.2) < 0.06)
    assert(!kept.contains("src2")) // default 0.0 drops all
  }

  test("negativeSamples: uniform over [1,m] minus the positive, stable") {
    val pairs = (1L to 50L).map(u => (u, (u % 4) + 1)).toDF("u", "p")
    val universe = (1L to 4L).toDF("item")
    val out = Sampling.negativeSamples(pairs, "u", "p", universe,
        "item", 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 250)
    // never the positive, always inside the universe
    assert(out.forall { case (_, pos, _, neg) =>
      neg != pos && neg >= 1 && neg <= 4 })
    // every non-positive item is reachable (the bijection covers all)
    val seen = out.map(_._4).toSet
    assert(seen === Set(1L, 2L, 3L, 4L))
    // deterministic: same rows on rerun
    val again = Sampling.negativeSamples(pairs, "u", "p", universe,
        "item", 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sorted.toSeq === again.sorted.toSeq)
  }

  test("neymanAllocation: budget conserved, variance draws budget") {
    // stratum a: constant (sigma 0); b: small spread; c: wide spread,
    // same sizes — allocation must order alloc(c) > alloc(b) >
    // alloc(a) = 0 and sum exactly to the budget
    // σ_a = 0, σ_b = 10 (alternating 40/60), σ_c = 30 (alternating
    // 0/60), equal sizes → quotas 0 / 22.5 / 67.5; the tie on the .5
    // remainders breaks to the lexicographically smaller stratum
    val rows =
      (1 to 100).map(_ => ("a", 50L)) ++
      (1 to 100).map(i => ("b", 40L + (i % 2) * 20L)) ++
      (1 to 100).map(i => ("c", (i % 2) * 60L))
    val out = Sampling.neymanAllocation(rows.toDF("g", "v"), col("g"),
        col("v"), 90L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.values.sum === 90L)
    assert(out("a") === 0L)
    assert(out("c") > out("b") && out("b") > 0L)
  }

  test("neymanAllocation: all-constant strata degrade to proportional") {
    val rows = (1 to 30).map(_ => ("x", 5L)) ++
      (1 to 60).map(_ => ("y", 9L))
    val out = Sampling.neymanAllocation(rows.toDF("g", "v"), col("g"),
        col("v"), 9L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out === Map("x" -> 3L, "y" -> 6L))
  }
}