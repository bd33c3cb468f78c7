package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words appear in this one"),
    (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup finds identical content") {
    val groups = Dedup.exactDupGroups(docs, "text").collect()
    assert(groups.length == 1 && groups(0).getLong(1) == 2)
  }

  test("exactN sample: exact size, deterministic, partition-invariant") {
    val ids = spark.range(0, 500).select(col("id"))
    val s1 = Sampling.exactN(ids, "id", 20, salt = "t")
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 20)
    // same rows whatever the physical partitioning
    val s2 = Sampling.exactN(ids.repartition(7), "id", 20, salt = "t")
      .collect().map(_.getLong(0)).toSet
    assert(s2 == s1)
    // and they are exactly the 20 smallest (hash, id) keys
    val want = ids.select(col("id"),
        Sampling.hashUnit(col("id"), "t").as("u"))
      .collect().map(r => (r.getDouble(1), r.getLong(0)))
      .sorted.take(20).map(_._2).toSet
    assert(s1 == want)
    // different salt = a different (deterministic) sample
    val s3 = Sampling.exactN(ids, "id", 20, salt = "u")
      .collect().map(_.getLong(0)).toSet
    assert(s3 != s1)
  }

  test("corpus similarity matrix: identical groups 1.0, disjoint ~ 0") {
    val grouped = Seq(
      ("A", "the quick brown fox jumps over the lazy dog tonight"),
      ("A", "an unrelated second document padding the group corpus"),
      ("B", "the quick brown fox jumps over the lazy dog tonight"),
      ("B", "an unrelated second document padding the group corpus"),
      ("C", "zq wv xu yt rs completely disjoint vocabulary here now")
    ).toDF("src", "text")
      .select(col("src"), TextAnalysis.tokens(col("text")).as("toks"))
    val m = Dedup.corpusSimilarityMatrix(grouped, "src", numHashes = 32,
        k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // A and B hold the same shingle union: every slot matches
    assert(m(("A", "B")) == ((32L, 32L, 1.0)))
    // C shares no shingles with either: estimator reads (near) zero
    assert(m(("A", "C"))._3 < 0.2 && m(("B", "C"))._3 < 0.2)
  }

  test("fast-hash near-dup finds the same verified pairs as md5") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog at dawn today"),
      (2L, "the quick brown fox jumps over the lazy dog at dawn"),
      (3L, "completely different text with its own vocabulary here now"),
      (4L, "the quick brown fox jumps over the lazy dog at dawn today")
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.tokens(col("text")).as("toks"))
    def pairs(fast: Boolean) =
      Dedup.nearDuplicatesFromTokens(corpus, threshold = 0.5, k = 3,
          fast = fast)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val md5Pairs = pairs(fast = false)
    val fastPairs = pairs(fast = true)
    // both hashes are injective on this shingle set, so verified
    // Jaccard values — set-overlap ratios — are identical, not just
    // the pair membership
    assert(fastPairs == md5Pairs)
    assert(md5Pairs.keySet.contains((1L, 4L)) &&
      md5Pairs((1L, 4L)) == 1.0)
  }

  test("incremental near-dup: finds new-vs-corpus, never corpus-vs-corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog at dawn today"),
      // 2 is an exact dup of 1 INSIDE the corpus — the incremental
      // operator must not report it (only new-vs-corpus pairs)
      (2L, "the quick brown fox jumps over the lazy dog at dawn today"),
      (3L, "completely different corpus text with its own words here")
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.tokens(col("text")).as("toks"))
    val fresh = Seq(
      (100L, "the quick brown fox jumps over the lazy dog at dawn"),
      (101L, "brand new content matching nothing in the standing corpus")
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.tokens(col("text")).as("toks"))
    val pairs = Dedup.nearDuplicatesAgainstFromTokens(fresh, corpus,
        threshold = 0.5, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 100 is a near-dup of both corpus copies; 101 matches nothing,
    // and the corpus-internal (1,2) dup never appears
    assert(pairs == Set((100L, 1L), (100L, 2L)))
  }

  test("weightedExactN: inclusion tracks weight, deterministic, exact n") {
    val df = (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) 100L else 1L))
      .toDF("id", "w")
    val s1 = Sampling.weightedExactN(df, "id", "w", 50, salt = "t")
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 50)
    val s2 = Sampling.weightedExactN(df.repartition(7), "id", "w", 50,
      salt = "t").collect().map(_.getLong(0)).toSet
    assert(s2 == s1) // layout-invariant
    // heavy ids carry ~92% of total weight → should dominate the draw
    val heavy = s1.count(_ % 10 == 0)
    assert(heavy > 30, s"heavy=$heavy of 50")
    // non-positive weights are never drawn
    val withZero = df.withColumn("w",
      when(col("id") <= 900, lit(0L)).otherwise(col("w")))
    val s3 = Sampling.weightedExactN(withZero, "id", "w", 50, salt = "t")
      .collect().map(_.getLong(0))
    assert(s3.length == 50 && s3.forall(_ > 900))
  }

  test("takeTokenBudget: stable-order prefix per source, straddler kept") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 10L),
      ("b", 11L, 10L), ("b", 12L, 10L),
      ("c", 21L, 10L) // no budget for c → dropped
    ).toDF("src", "id", "w")
    val kept = Sampling.takeTokenBudget(df, "id", "w", "src",
      Map("a" -> 25.0, "b" -> 10.0), salt = "t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // a: cum-before 0/10/20 < 25 → 3 docs (third straddles the budget);
    // b: only the first-hash doc (cum-before 0 < 10)
    assert(kept.count(_._1 == "a") == 3)
    assert(kept.count(_._1 == "b") == 1)
    assert(!kept.exists(_._1 == "c"))
    val kept2 = Sampling.takeTokenBudget(df.repartition(5), "id", "w",
      "src", Map("a" -> 25.0, "b" -> 10.0), salt = "t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept2 == kept) // layout-invariant
  }

  test("packSequences: bins reassemble in pack order, totals bounded") {
    val df = (1 to 40).map(i => (i.toLong, s"d$i", 10L))
      .toDF("id", "text", "w")
    val rows = Sampling.packSequences(df, "id", "w", "text",
      budget = 50.0, nShards = 2, salt = "p").collect()
    // every doc appears exactly once across all sequences
    val all = rows.flatMap(_.getString(2).split("\n"))
    assert(all.sorted.toSeq == (1 to 40).map(i => s"d$i").sorted.toSeq)
    rows.foreach { r =>
      assert(r.getString(2).split("\n").length.toLong == r.getLong(3))
      assert(r.getLong(4) == r.getLong(3) * 10L) // weight total matches
    }
    // append-style: every non-trailing bin in a shard is filled to the
    // budget exactly (uniform weights 10 into budget 50 → 5 docs/bin)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val maxBin = rs.map(_.getLong(1)).max
      rs.filter(_.getLong(1) < maxBin)
        .foreach(r => assert(r.getLong(3) == 5L))
    }
  }

  test("jaccard: near-dups high, unrelated low, self = 1") {
    val j = docs.as("a").crossJoin(docs.as("b"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Dedup.jaccard(col("a.text"), col("b.text")).as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 2L)) > 0.5 && j((1L, 2L)) < 1.0)
    assert(j((1L, 3L)) == 0.0)
  }

  test("containment: subset reads 1.0 where symmetric jaccard stays low") {
    val rows = Seq(
      ("the quick brown fox", "the quick brown fox jumps over the lazy dog"),
      ("completely different words here", "the quick brown fox jumps"),
      ("", "the quick brown fox"))
      .toDF("sub", "sup")
      .select(Dedup.containment(col("sub"), col("sup")).as("c"),
        Dedup.containment(col("sup"), col("sub")).as("crev"),
        Dedup.jaccard(col("sub"), col("sup")).as("j"),
        Dedup.containmentHashes(Dedup.shingleHashes(col("sub")),
          Dedup.shingleHashes(col("sup"))).as("ch"))
      .collect()
    // the 4-token prefix: both its 3-gram shingles sit inside the full
    // doc's 7 — containment 1.0, jaccard only 2/7, reverse partial
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(0).getDouble(1) == 2.0 / 7.0)
    assert(rows(0).getDouble(2) == 2.0 / 7.0)
    assert(rows(1).getDouble(0) == 0.0) // disjoint
    assert(rows(2).getDouble(0) == 0.0) // empty sub: 0.0, never NaN
    // hashed-shingle formulation is value-identical
    rows.foreach(r => assert(r.getDouble(3) == r.getDouble(0)))
  }

  test("repetition metrics: uniform text low, repeated text high") {
    val r = Seq(
      (1L, "a b c d e f g h"),           // all distinct
      (2L, "spam spam spam spam"),       // one word repeated
      (3L, "x y x y x y x y"),           // repeated bigrams
      (4L, ""), (5L, "solo")             // degenerate: empty / 1 word
    ).toDF("id", "text").select(
      col("id"),
      TextAnalysis.topWordFrac(col("text")).as("twf"),
      TextAnalysis.dupNgramFrac(col("text"), 2).as("dbf"))
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2)))
      .toMap
    assert(r(1L) == (0.125, 0.0))  // 1/8 top word, 7 distinct bigrams
    assert(r(2L) == (1.0, 1.0 - 1.0 / 3.0)) // "spam spam" ×3, 1 distinct
    assert(r(3L)._1 == 0.5 && r(3L)._2 == 1.0 - 2.0 / 7.0)
    assert(r(4L) == (0.0, 0.0) && r(5L) == (1.0, 0.0))
  }

  test("vectorProfile: per-dim stats, NaN tally, collapsed dims visible") {
    val e = Seq(
      (1L, Array(1.0f, 5.0f, Float.NaN)),
      (2L, Array(3.0f, 5.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Profile.vectorProfile(e, "embedding").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got(0) == ((2L, 0L, 2.0, 1.0, 3.0)))
    assert(got(1)._4 == 5.0 && got(1)._5 == 5.0) // collapsed: min == max
    assert(got(2)._2 == 1L)                      // NaN tallied
    // NaN excluded from the stats (it would otherwise poison mean and
    // max, hiding exactly the degeneracies this profile looks for):
    assert(got(2)._3 == 0.0 && got(2)._4 == 0.0 && got(2)._5 == 0.0)
  }

  test("rateAnomaliesRobust: spike flagged, spike can't mask itself") {
    // g: 9/10/11 baseline + one 100-spike → median 10, MAD 1, z=90;
    // h: constant baseline + spike → MAD 0 → degenerate group skipped
    val rows = ((1 to 20).map(i => ("g", i.toLong, (9 + i % 3).toLong))
      ++ Seq(("g", 21L, 100L))
      ++ (1 to 10).map(i => ("h", i.toLong, 5L)) :+ ("h", 11L, 50L))
      .toDF("g", "t", "cnt")
    val got = Profile.rateAnomaliesRobust(rows, Seq("g"), "cnt", 3.0)
      .collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "g" && got(0).getLong(1) == 21L)
    assert(got(0).getDouble(3) == 90.0)
  }

  test("rate anomalies: zero-variance baselines skipped, spikes flagged") {
    // group g: constant baseline then a spike — trailing variance is 0
    // for every row after the constant run, so nothing NaN/Inf leaks;
    // group h: noisy baseline then a clear spike — flagged
    val rows = ((1 to 10).map(i => ("g", i.toLong, 5L)) :+ ("g", 11L, 50L)) ++
      ((1 to 10).map(i => ("h", i.toLong, (5 + i % 3).toLong)) :+
        ("h", 11L, 50L))
    val df = rows.toDF("grp", "bucket", "cnt")
    // threshold 3: early two-row trailing baselines legitimately reach
    // |z| ≈ 2.1 on the noisy group — only the real spike clears 3
    val got = Profile.rateAnomaliesTrailing(df, Seq("grp"), "bucket",
        "cnt", trailing = 8, zThreshold = 3.0)
      .select("grp", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("h", 11L)),
      s"expected only h's spike (g's zero-variance baseline skipped): $got")
    // global variant skips an all-constant group entirely
    val const = (1 to 5).map(i => ("c", i.toLong, 7L))
      .toDF("grp", "bucket", "cnt")
    assert(Profile.rateAnomalies(const, Seq("grp"), "cnt", 0.0).count() == 0)
  }

  test("histogram: half-open bins, range-clipped, boundary values") {
    val df = Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 10.0, -4.0)
      .toDF("v")
    val h = Profile.histogram(df, "v", lo = 1.0, hi = 3.0, bins = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // [1,2): 1.0, 1.5; [2,3): 2.0, 2.5; 3.0 excluded (half-open hi),
    // 0.5 / -4 / 10 out of range
    assert(h == Map(0L -> ((2L, 1.0, 1.5)), 1L -> ((2L, 2.0, 2.5))))
  }

  test("native repetition counts match the HOF formulations") {
    // disable the size(array_distinct) lowering for the comparison:
    // the shared session may have GraftFunctions.register'd the rule,
    // which would silently turn the HOF side of dupNgramFracHof into
    // the native expression and make this parity check vacuous
    spark.conf.set(
      graft.functions.LowerQuadraticArrayOps.EnabledConf, "false")
    try {
      val r = docs.union(Seq((9L, ""), (10L, "solo"),
          (11L, "x x x y y z")).toDF("doc_id", "text"))
        .select(col("doc_id"),
          TextAnalysis.topWordFrac(col("text")).as("n1"),
          TextAnalysis.topWordFracHof(col("text")).as("h1"),
          TextAnalysis.dupNgramFrac(col("text"), 2).as("n2"),
          TextAnalysis.dupNgramFracHof(col("text"), 2).as("h2"))
        .collect()
      r.foreach { x =>
        assert(x.getDouble(1) == x.getDouble(2), s"topWordFrac @ ${x.get(0)}")
        assert(x.getDouble(3) == x.getDouble(4), s"dupNgramFrac @ ${x.get(0)}")
      }
      assert(r.length == 7)
    } finally spark.conf.unset(
      graft.functions.LowerQuadraticArrayOps.EnabledConf)
  }

  test("corpus sketch similarity: self = 1, disjoint ~ 0, merge = union") {
    import org.apache.spark.sql.DataFrame
    def toks(df: DataFrame) = df.select(col("doc_id").as("id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val a = toks(docs)
    val b = toks(Seq((7L, "zz yy xx ww vv uu tt ss rr qq"))
      .toDF("doc_id", "text"))
    val self = Dedup.corpusSimilarity(a, a).collect()(0)
    assert(self.getDouble(2) == 1.0)
    val disj = Dedup.corpusSimilarity(a, b).collect()(0)
    assert(disj.getDouble(2) < 0.2) // no shared shingles; hash luck only
    // mergeability: the sketch of a union is the slot-min of sketches
    val merged = Dedup.corpusSignature(a.unionByName(b)).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sa = Dedup.corpusSignature(a).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sb = Dedup.corpusSignature(b).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == sa.map { case (s, v) => s -> math.min(v, sb(s)) })
  }

  test("native containment_long matches the array_intersect formulation") {
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .select(
        Dedup.shingleHashes(col("a.text"), 3).as("sa"),
        Dedup.shingleHashes(col("b.text"), 3).as("sb"))
      // degenerate rows: empty sub, empty sup, duplicate elements
      .union(Seq((Seq.empty[Long], Seq.empty[Long]),
        (Seq.empty[Long], Seq(1L, 2L)), (Seq(3L, 3L, 4L), Seq(3L)),
        (Seq(5L), Seq.empty[Long]))
        .toDF("sa", "sb"))
      .select(
        Dedup.containmentHashes(col("sa"), col("sb")).as("native"),
        Dedup.containmentHashesHof(col("sa"), col("sb")).as("hof"))
      .collect()
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(pairs.length == 20)
  }

  test("native jaccard_long matches the array_intersect formulation") {
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .select(
        Dedup.shingleHashes(col("a.text"), 3).as("sa"),
        Dedup.shingleHashes(col("b.text"), 3).as("sb"))
      // degenerate rows: empty vs empty, empty vs non-empty
      .union(Seq((Seq.empty[Long], Seq.empty[Long]),
        (Seq.empty[Long], Seq(1L, 2L)), (Seq(3L, 3L, 4L), Seq(3L)))
        .toDF("sa", "sb"))
      .select(
        Dedup.jaccardHashes(col("sa"), col("sb")).as("native"),
        Dedup.jaccardHashesHof(col("sa"), col("sb")).as("hof"))
      .collect()
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(pairs.length == 19)
  }

  test("native minhash_sigs is bit-identical to the HOF formulation") {
    val base = docs.select(col("doc_id"),
      Dedup.shingleHashes(col("text"), 3).as("sh"))
      // empty shingle set exercises the all-null-slots edge
      .union(Seq((99L, "")).toDF("doc_id", "text")
        .select(col("doc_id"), filter(Dedup.shingleHashes(col("text"), 3),
          _ =!= Dedup.hash48(lit(""))).as("sh")))
    val both = base.select(col("doc_id"),
      Dedup.minhashFromHashes(col("sh"), 32).as("native"),
      Dedup.minhashFromHashesHof(col("sh"), 32).as("hof"))
      .collect()
    both.foreach(r => assert(r.get(1) == r.get(2),
      s"signature mismatch for doc ${r.getLong(0)}"))
    assert(both.length == 5)
  }

  test("minhash LSH surfaces near-dup candidates, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical → all bands collide
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH bucket cap prunes boilerplate buckets; hotBuckets reports them") {
    // 30 identical boilerplate docs + 3 distinct docs
    val boiler = (100L until 130L).map(i =>
      (i, "this exact same license header appears on every single file"))
    val corpus = (boiler ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words appear in this one")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashCandidates(corpus, "doc_id", "text")
      .count()
    val capped = Dedup.minhashCandidates(corpus, "doc_id", "text",
      maxBucketSize = 10).collect().map(r => (r.getLong(0), r.getLong(1)))
    // boilerplate contributes 30*29/2 pairs uncapped; capped drops them
    assert(uncapped >= 435L)
    assert(!capped.exists(p => p._1 >= 100L || p._2 >= 100L))
    assert(capped.contains((1L, 2L)) || capped.contains((1L, 4L)) ||
      capped.nonEmpty) // the small-doc pairs survive
    val hot = Dedup.hotBuckets(corpus, "doc_id", "text", 10).collect()
    assert(hot.nonEmpty && hot.forall(_.getLong(2) == 30L))
  }

  test("nearDuplicates pipeline verifies candidates with jaccard") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((1L, 4L)))
    assert(nd.contains((1L, 2L)) || nd.contains((2L, 4L)))
  }

  test("substringContamination: verbatim ≥L runs flag, scattered overlap " +
      "does not") {
    def f(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val run30 = f("R", 30)
    val run29 = f("S", 29)
    val train = Seq(
      (1L, f("t1-", 6) ++ run30 ++ f("t1x", 4)),
      (2L, f("t2-", 3) ++ run29),
      // shares eval 200's VOCABULARY scattered (every gram broken up):
      // k-gram overlap is zero even though tokens overlap heavily
      (3L, run30.grouped(2).flatMap(g => g :+ "zz").toSeq)
    ).toDF("id", "toks")
    val evalSet = Seq(
      (200L, run30),           // verbatim ≥30: must flag train 1 only
      (201L, run29)            // 29 < L: must not flag
    ).toDF("id", "toks")
    val got = Decontaminate.substringContamination(train, evalSet,
        minRunLen = 30, k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set((1L, 200L, 1L, 30L, 30L)), s"got $got")
  }

  test("decontamination flags shared-shingle docs, skips clean ones") {
    def toks(s: String) = s.split(" ").toSeq
    val train = Seq(
      (1L, toks("alpha beta gamma delta epsilon zeta eta theta")),
      (2L, toks("one two three four five six seven eight nine"))
    ).toDF("id", "toks")
    val evalSet = Seq(
      // prefix excerpt of train doc 1 → shares 5-gram shingles
      (100L, toks("alpha beta gamma delta epsilon zeta")),
      (101L, toks("totally unrelated benchmark question text here"))
    ).toDF("id", "toks")
    val got = Decontaminate.contaminationFromTokens(train, evalSet,
        k = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // excerpt has 2 shingles (6 tokens, k=5), both inside doc 1's set
    assert(got.toSeq == Seq((1L, 100L, 2L)))
  }

  test("numeric profile: approx quantile sketch tracks exact percentile") {
    val vals = (1 to 5000).map(i => Tuple1(i.toDouble)).toDF("v")
    def qs(exact: Boolean): Seq[Double] =
      Profile.numericProfile(vals, Seq("v"), exact = exact)
        .collect()(0).getSeq[Double](1)
    val (ex, ap) = (qs(true), qs(false))
    assert(ex == Seq(1250.75, 2500.5, 3750.25)) // linear interpolation
    ex.zip(ap).foreach { case (e, a) =>
      assert(math.abs(e - a) / e < 0.01, s"approx $a vs exact $e")
    }
  }

  test("dedupSpans: first occurrence survives, empty docs vanish") {
    val corpus = Seq(
      (1L, "alpha\nboiler\nbeta"),   // first sees boiler
      (2L, "gamma\nboiler"),         // loses boiler, keeps gamma
      (3L, "boiler"),                // all spans seen → doc dropped
      (4L, "alpha\nalpha2")          // alpha seen in doc 1 → keeps alpha2
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSpans(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("alpha\nboiler\nbeta", 3L),
      2L -> ("gamma", 1L),
      4L -> ("alpha2", 1L)))
    // partition-invariant: same survivors under any physical layout
    val got2 = Dedup.dedupSpans(corpus.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got2 == got)
  }

  test("bpePieces: greedy longest-match with single-char fallback") {
    val v = graft.oracle.Fixtures.BpeVocab
    val got = Seq("the", "table", "customer", "part", "dup", "a", "xyz",
        "spark").toDF("w")
      .select(col("w"), TextAnalysis.bpePieces(col("w"), v).as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("the") == List("the"))          // longest beats "th"
    assert(got("table") == List("tab", "le"))  // "tab" beats "ta"
    assert(got("customer") == List("cust", "om", "er"))
    assert(got("part") == List("part"))        // beats "pa" + "rt"
    assert(got("dup") == List("du", "p"))      // trailing fallback char
    assert(got("a") == List("a"))              // pure fallback
    assert(got("xyz") == List("x", "y", "z"))
    assert(got("spark") == List("spark"))
    // reassembly invariant: pieces always concat back to the word
    got.foreach { case (w, ps) => assert(ps.mkString == w) }
  }

  test("substringRuns: exact maximal runs via anchored seed-and-extend") {
    // unique filler tokens per doc so only the planted runs share grams
    def f(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val run30 = f("R", 30)
    val run29 = f("S", 29)
    val runA = f("A", 30)
    val runB = f("B", 35)
    val corpus = Seq(
      (1L, f("f", 40) ++ run30 ++ f("g", 10)), // run at pos 41
      (2L, f("h", 5) ++ run30 ++ f("i", 20)),  // same run at pos 6
      (3L, f("j", 3) ++ run29),                // 29 < minRunLen
      (4L, run29 ++ f("k", 8)),
      // two runs on the SAME diagonal, split by a one-token mismatch
      (5L, Seq("x0") ++ runA ++ Seq("x1") ++ runB),
      (6L, runA ++ Seq("y1") ++ runB ++ Seq("y2"))
    ).toDF("id", "toks")
    val runs = Dedup.substringRuns(corpus, "id", col("toks"), 30, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(runs == Set(
      (1L, 2L, 41L, 6L, 30L),  // exact maximal run, exact positions
      (5L, 6L, 2L, 1L, 30L),   // first chain on diag 1
      (5L, 6L, 33L, 32L, 35L)  // second chain, same diag, separated
    ), s"got $runs")
    // pair rollup
    val pairs = Dedup.sharedSubstringRuns(corpus, "id", col("toks"), 30, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(pairs == Map(
      (1L, 2L) -> (1L, 30L, 30L),
      (5L, 6L) -> (2L, 35L, 65L)))
    // partition-invariant
    val runs2 = Dedup.substringRuns(corpus.repartition(7), "id",
        col("toks"), 30, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(runs2 == runs)
    // docs shorter than k emit nothing and nothing crashes
    val tiny = Seq((1L, Seq("a", "b")), (2L, Seq("a", "b")))
      .toDF("id", "toks")
    assert(Dedup.substringRuns(tiny, "id", col("toks"), 30, 8).isEmpty)
  }

  test("stripSubstringRuns: keep-first removal, overlaps merge, " +
      "all-duplicate docs vanish") {
    def f(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val run = f("R", 30)
    val corpus = Seq(
      (1L, f("a", 4) ++ run ++ f("b", 3)),  // first occurrence: kept
      (2L, f("c", 2) ++ run ++ f("d", 5)),  // later: run stripped
      (3L, run),                            // all duplicate: vanishes
      (4L, f("e", 10))                      // untouched
    ).toDF("id", "toks")
    val runs = Dedup.substringRuns(corpus, "id", col("toks"), 30, 8)
    val got = Dedup.stripSubstringRuns(corpus, "id", col("toks"), runs)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) ==
      ((f("a", 4) ++ run ++ f("b", 3)).mkString(" "), 37L, 0L))
    assert(got(2L) == ((f("c", 2) ++ f("d", 5)).mkString(" "), 7L, 30L))
    assert(!got.contains(3L), "fully-covered doc must be dropped")
    assert(got(4L) == (f("e", 10).mkString(" "), 10L, 0L))
    // overlapping intervals from two sources: covered positions are a
    // union, never double-removed
    val runX = f("X", 40)
    val c2 = Seq(
      (1L, runX.take(35)),                        // covers X1..X35
      (2L, runX.drop(5)),                         // covers X6..X40
      (9L, f("p", 2) ++ runX ++ f("q", 1))        // later than both
    ).toDF("id", "toks")
    val got2 = Dedup.stripSubstringRuns(c2, "id", col("toks"),
        Dedup.substringRuns(c2, "id", col("toks"), 30, 8))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got2(9L) == (("p1 p2 q1"), 3L, 40L), s"got ${got2.get(9L)}")
  }

  test("substringRunsAgainst: batch-vs-corpus equals the pair-restricted " +
      "self-join answer") {
    def f(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val run30 = f("R", 30)
    val run29 = f("S", 29)
    val corpus = Seq(
      (1L, f("c1-", 12) ++ run30 ++ f("c1x", 5)),
      (2L, run29 ++ f("c2-", 9)),
      (3L, f("c3-", 44))
    ).toDF("id", "toks")
    val batch = Seq(
      (100L, f("b1-", 3) ++ run30),          // ≥30 vs corpus 1 only
      (101L, run29 ++ f("b2-", 15)),         // 29 < minRunLen: no pair
      (102L, f("b3-", 35))                   // shares nothing
    ).toDF("id", "toks")
    val grams = Dedup.substringGrams(corpus, "id", col("toks"), 8)
    val got = Dedup.substringRunsAgainst(batch, grams, 30, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set((100L, 1L, 4L, 13L, 30L)), s"got $got")
    // same answer as the self-join over the union, restricted to
    // (batch, corpus) pairs — the incremental contract
    val self = Dedup.substringRuns(corpus.unionByName(batch), "id",
        col("toks"), 30, 8)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(3), r.getLong(2),
        r.getLong(4)))          // (id_a=corpus, id_b=batch) → reorder
      .filter { case (b, c, _, _, _) => b >= 100L && c < 100L }
      .toSet
    assert(self == got, s"self-join restriction $self != against $got")
  }

  test("substringRuns: gram-frequency cap drops boilerplate diagonals") {
    def f(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val boiler = f("Z", 30)
    // the same 30-run in 6 docs → every gram of it occurs 6 times
    val corpus = (1L to 6L).map(i => (i, f(s"u$i-", 4) ++ boiler))
      .toDF("id", "toks")
    val exact = Dedup.substringRuns(corpus, "id", col("toks"), 30, 8)
    assert(exact.count() == 15) // all 6·5/2 pairs
    val capped = Dedup.substringRuns(corpus, "id", col("toks"), 30, 8,
      maxGramFreq = 5)
    assert(capped.isEmpty) // capped out: the documented recall tradeoff
  }

  test("unigramLogProb: common-word docs beat rare-word docs") {
    val corpus = Seq(
      (1L, "the the the the"),       // hot token
      (2L, "the the rare1"),         // mixed
      (3L, "rare2 rare3")            // singletons
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(corpus, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val n = 9.0 // total tokens
    def lp(c: Double) = math.log(c / n)
    assert(got(1L)._1 == 4L && math.abs(got(1L)._2 - lp(6)) < 1e-12)
    assert(math.abs(got(2L)._2 - (2 * lp(6) + lp(1)) / 3) < 1e-12)
    assert(math.abs(got(3L)._2 - lp(1)) < 1e-12)
    assert(got(1L)._2 > got(2L)._2 && got(2L)._2 > got(3L)._2)
  }

  test("chunkTokens: sliding windows with overlap, trailing partial kept") {
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // 7 tokens
      (2L, "a"), (3L, "")           // single token; empty → no chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, "doc_id", "text",
        chunkSize = 4, overlap = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // starts 0,2,4,6 → windows of 4 advancing by 2, trailing partials
    assert(got((1L, 0)) == (("t1 t2 t3 t4", 4L)))
    assert(got((1L, 1)) == (("t3 t4 t5 t6", 4L)))
    assert(got((1L, 2)) == (("t5 t6 t7", 3L)))
    assert(got((1L, 3)) == (("t7", 1L)))
    assert(got((2L, 0)) == (("a", 1L)))
    assert(!got.keys.exists(_._1 == 3L))
  }

  test("bigramLogProb: fluent word order beats word salad") {
    val corpus = Seq(
      (1L, "a b c a b c a b c"),  // the common phrase
      (2L, "a b c"),              // same fluent order
      (3L, "c b a"),              // same words, unseen order
      (4L, "x")                   // no bigrams → dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(corpus, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(4L))
    assert(got(2L)._1 == 2L)
    // corpus: c2(ab)=4, c2(bc)=4, c2(ca)=2, c2(cb)=1, c2(ba)=1
    //         c1(a)=4, c1(b)=5, c1(c)=3
    val exp2 = (math.log(4.0 / 4.0) + math.log(4.0 / 5.0)) / 2
    assert(math.abs(got(2L)._2 - exp2) < 1e-12)
    val exp3 = (math.log(1.0 / 3.0) + math.log(1.0 / 5.0)) / 2
    assert(math.abs(got(3L)._2 - exp3) < 1e-12)
    // fluent order beats word salad built from the same vocabulary
    assert(got(3L)._2 < got(1L)._2 && got(1L)._2 < got(2L)._2)
  }

  test("keySkew: heaviest keys first with exact shares, bounded output") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "i")
    val got = Profile.keySkew(df, Seq("k"), 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))
  }

  test("quantizeInt8: integral codes in [-127,127], high top-k recall") {
    val e = Seq(
      (1L, Array(0.6f, 0.8f, 0.0f)),
      (2L, Array(-0.3f, 0.4f, 0.5f))).toDF("vec_id", "embedding")
    val qz = Similarity.normalized(e, "vec_id", "embedding")
      .select(col("id"), Similarity.quantizeInt8(col("nvec")).as("z"))
      .select(col("id"), col("z.scale"), col("z.q")).collect()
    qz.foreach { r =>
      val q = r.getSeq[Double](2)
      assert(q.forall(v => v == math.rint(v) || v == math.floor(v)))
      assert(q.map(math.abs).max == 127.0) // max-component hits full range
      assert(r.getDouble(1) > 0)
    }
    // recall vs the float path on a real-ish spread of vectors
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (math.sin(i * 0.7 + d) + 0.1 * d).toFloat))
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") < 3), vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedTopK(
        vecs.filter(col("vec_id") < 3), vecs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall")
  }

  test("numericProfileByGroup: per-group exact quantiles in long form") {
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0),
      ("b", 10.0, 1.0), ("b", 20.0, 2.0)).toDF("g", "x", "y")
    val got = Profile
      .numericProfileByGroup(df, "g", Seq("x", "y"), exact = true)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))
        -> r.getDouble(3))
      .toMap
    assert(got.size == 2 * 2 * 3) // groups × cols × probabilities
    assert(got(("a", "x", 0)) == 1.5)  // p25 of 1,2,3 interpolated
    assert(got(("a", "x", 1)) == 2.0)  // median of 1,2,3
    assert(got(("b", "y", 1)) == 1.5)  // median of 1,2
    assert(got(("b", "x", 2)) == 17.5) // p75 of 10,20
  }

  test("duplicateClusters: transitive closure to component-min labels") {
    // chain 1-2, 2-3, 3-4 needs multiple propagation rounds; 10-11 is a
    // separate component; 20 appears only as the greater pair member
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (5L, 20L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 20L -> 5L))
  }

  test("dropDuplicateMembers keeps canonicals and singletons only") {
    val corpus = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("id", "cluster_id")
    val kept = Dedup.dropDuplicateMembers(corpus, clusters, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 9L)) // canonical 1, self-canonical 4, singleton 9
  }

  test("duplicateClusters: empty pair set yields empty mapping") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.duplicateClusters(empty).count() == 0)
  }

  test("simhash: identical texts equal, near texts close in hamming") {
    val s = docs.select(col("doc_id"),
      Dedup.simhash48(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(1L), s(2L)) < hamming(s(1L), s(3L)))
  }

  test("native dot_double: codegen expression matches the HOF fold") {
    graft.functions.GraftFunctions.register(spark)
    val sql = spark.sql(
      "SELECT dot_double(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .collect()(0).getDouble(0)
    assert(sql == 32.0)
    // SQL path coerces non-double arrays instead of misreading storage
    val ints = spark.sql("SELECT dot_double(array(1, 2), array(3, 4))")
      .collect()(0).getDouble(0)
    assert(ints == 11.0)
    val df = Seq((Seq(0.1, 0.2, 0.3), Seq(-1.0, 2.5, 0.7))).toDF("a", "b")
    val native = df.select(
      graft.functions.DotProduct.dot(col("a"), col("b"))).collect()(0)
      .getDouble(0)
    val fold = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)).collect()(0).getDouble(0)
    assert(native == fold) // bit-identical summation order
  }

  test("hash48 column expression matches driver-side hash48Value") {
    val vals = Seq("", "abc", "hello world", "ünïcödé ☃")
    val got = vals.toDF("s")
      .select(col("s"), Dedup.hash48(col("s")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) == Dedup.hash48Value(v), v))
  }

  test("column profile: exact stats in one scan (opt-in exact mode)") {
    val df = Seq((1, Some("a")), (2, None), (2, Some("c")))
      .toDF("k", "v")
    val prof = Profile.columnProfile(df, Seq("k", "v"), exact = true)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(prof("k") == ((3L, 0L, 2L, "1", "2")))
    assert(prof("v") == ((3L, 1L, 2L, "a", "c")))
  }

  test("column profile default (approx): estimate within HLL error of exact") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_orderkey", "l_returnflag", "l_shipdate")
    val exact = Profile.columnProfile(li, cols, exact = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.columnProfile(li, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val e = exact(c).toDouble
      assert(math.abs(approx(c) - e) / e <= 0.15,
        s"$c: approx ${approx(c)} vs exact $e")
    }
  }

  test("bounded_top_k matches window row_number under any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 2000)
      .map(i => ((i % 7).toLong, (i * 37 % 500).toDouble, i.toLong))
      .toDF("query_id", "sim", "neighbor_id")
      .repartition(13)
    val viaAgg = df.groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopK.topk(
        col("sim"), col("neighbor_id"), 9).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 9)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("bounded_top_k multiset: duplicated rows occupy rank slots") {
    // one key, 2 distinct ids each duplicated 5 times, k = 6: window
    // row_number keeps 6 rows (5×id1 + 1×id2); a set-semantics buffer
    // would collapse to 2
    val df = (1 to 10).map(i => (1L, 1.0, ((i - 1) / 5 + 1).toLong))
      .toDF("q", "sim", "nid").repartition(4)
    val rows = df.groupBy(col("q"))
      .agg(graft.functions.BoundedTopK.topk(
        col("sim"), col("nid"), 6).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(rows == Seq(1L, 1L, 1L, 1L, 1L, 2L))
  }

  test("IVF k-means: nLists centroids, bounded list skew, decent recall") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val nLists = 8
    val cents = Similarity.kmeansCentroids(e, nLists)
    assert(cents.count() == nLists)
    val index = Similarity.ivfIndexKMeans(e, nLists = nLists)
    val sizes = index.groupBy("list_id").count().collect()
      .map(_.getLong(1))
    val n = sizes.sum
    assert(sizes.length == nLists, s"empty lists: only ${sizes.length}")
    assert(sizes.max <= 4 * n / nLists,
      s"unbalanced: max ${sizes.max} of $n over $nLists lists")
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopKWith(queries, index, cents, 10,
      nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.4, s"recall $recall")
  }

  test("kmeansFitFull: deterministic across runs, unit norms, assigns all") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val fit1 = Similarity.kmeansFitFull(e, nLists = 4, iters = 2)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val fit2 = Similarity.kmeansFitFull(e, nLists = 4, iters = 2)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    // bitwise equality: distributed sums are decimal-exact, driver math
    // is fixed-order — the oracle's literal-centroid re-fit depends on it
    assert(fit1.toSeq == fit2.toSeq)
    assert(fit1.length == 4)
    fit1.foreach { case (_, c) =>
      val nrm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"centroid norm $nrm")
    }
    val cents = Similarity.kmeansFitFull(e, nLists = 4, iters = 2)
    val index = Similarity.ivfIndexWith(e, cents)
    assert(index.count() == Similarity.normalized(e, "vec_id", "embedding")
      .count())
    // full-data refinement should not be WORSE balanced than the plain
    // sample fit's documented bound
    val sizes = index.groupBy("list_id").count().collect().map(_.getLong(1))
    assert(sizes.length == 4 && sizes.max <= 3 * sizes.sum / 4,
      s"unbalanced: ${sizes.mkString(",")}")
  }

  test("contaminationBloom is lossless vs the exact pass; empty eval → 0") {
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val base = corpus.select(col("doc_id").as("id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val evalSet = base.filter(col("id") % 20 === 0)
      .select((col("id") + 9000000).as("id"), col("toks"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val exact = graft.ext.Decontaminate
      .contaminationFromTokens(base, evalSet, k = 5, minShared = 2)
      .collect().map(key).toSet
    val bloom = graft.ext.Decontaminate
      .contaminationBloom(base, evalSet, k = 5, minShared = 2)
      .collect().map(key).toSet
    assert(exact.nonEmpty && bloom == exact)
    // an undersized filter raises false positives, never losses
    val tiny = graft.ext.Decontaminate.contaminationBloom(base, evalSet,
        k = 5, minShared = 2, estimatedEvalShingles = 16, numBits = 64)
      .collect().map(key).toSet
    assert(tiny == exact)
    val none = graft.ext.Decontaminate.contaminationBloom(base,
      evalSet.filter(col("id") < 0), k = 5, minShared = 2)
    assert(none.count() == 0)
  }

  test("semanticContamination flags planted eval near-copies only") {
    val dim = 8
    def basis(i: Int): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    val evalSet = (0 until 4).map(i => (i.toLong, basis(i)))
      .toDF("vec_id", "embedding")
    // train: ids 100+i are near-copies (tiny second component), ids
    // 200+i are orthogonal basis vectors
    val train = ((0 until 4).map(i => (100L + i,
        basis(i).updated((i + 4) % dim, 0.01f))) ++
      (0 until 4).map(i => (200L + i, basis(i + 4))))
      .toDF("vec_id", "embedding")
    val got = graft.ext.Decontaminate.semanticContamination(
        train, evalSet, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0 until 4).map(i => (100L + i, i.toLong)).toSet)
  }

  test("randomProjection: basis vectors recover the sign rows") {
    val dim = 16
    val df = (0 until dim).map(i =>
        (i.toLong, Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val k = 4
    val got = Similarity.randomProjection(df, "vec_id", "embedding",
        inDims = dim, outDims = k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val scale = 1.0 / math.sqrt(k.toDouble)
    (0 until dim).foreach { i =>
      val want = (0 until k).map(j =>
        Similarity.projectionSigns(dim, j, scale)(i))
      assert(got(i.toLong) == want, s"dim $i")
    }
    // mismatched vector lengths are dropped, not silently mis-projected
    val short = Seq((99L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.randomProjection(short, "vec_id", "embedding",
      inDims = dim, outDims = k).count() == 0)
  }

  test("normalizeText canonicalizes case/punct/whitespace variants") {
    val df = Seq(
      (1L, "  Hello,   WORLD!! 42 "),
      (2L, "hello world 42"),
      (3L, "different text")).toDF("id", "text")
    val r = df.select(col("id"),
        TextAnalysis.normalizeText(col("text")).as("n"),
        TextAnalysis.normalizedHash(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(r.find(_._1 == 1L).get._2 == "hello world 42")
    assert(r.find(_._1 == 1L).get._3 == r.find(_._1 == 2L).get._3)
    assert(r.find(_._1 == 3L).get._3 != r.find(_._1 == 2L).get._3)
  }

  test("multi-probe LSH: candidate superset of single-probe, same plan k") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val single = Similarity.knnJoinLsh(e, 3, nPlanes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.knnJoinLshMultiProbe(e, 3, nPlanes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every query keeps at least its single-probe neighbor count, and
    // the probe expansion must recover additional Hamming-1 neighbors
    // somewhere in the corpus
    val exact = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 20), e, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(ann: Set[(Long, Long)]) =
      (exact & ann).size.toDouble / exact.size
    assert(recall(multi) >= recall(single),
      s"multi ${recall(multi)} < single ${recall(single)}")
    assert(multi.size > single.size, "probing added no candidates")
  }

  test("charBigramEntropy: zero for runs, matches reference, spam low") {
    def ref(s: String): Double = {
      val bgs = (0 until s.length - 1).map(i => s.substring(i, i + 2))
      val counts = scala.collection.immutable.TreeMap(
        bgs.groupBy(identity).view.mapValues(_.size.toLong).toSeq: _*)
      val n = bgs.size.toDouble
      var acc = 0.0
      counts.values.foreach(c => acc += c.toDouble * math.log(c.toDouble))
      math.log(n) - acc / n
    }
    val texts = Seq((1L, "aaaaaaaa"), (2L, "the quick brown fox jumps"),
      (3L, "ha ha ha ha ha ha"))
    val got = texts.toDF("id", "text")
      .select(col("id"),
        TextAnalysis.charBigramEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    texts.foreach { case (id, s) => assert(got(id) == ref(s), s"id $id") }
    assert(got(1L) == 0.0)
    assert(got(3L) < got(2L), "spam must score below prose")
  }

  test("Features.trailing matches brute force, layout-invariant") {
    val ev = Seq(
      // user 1: events at 0s, 30m, 65m, 70m (1h window in micros)
      (1L, 1L, 0L, 150L), (2L, 1L, 1800L * 1000000, 250L),
      (3L, 1L, 3900L * 1000000, 100L), (4L, 1L, 4200L * 1000000, 300L),
      // user 2: single event; user 3: two ties at the same timestamp
      (5L, 2L, 1000L * 1000000, 500L),
      (6L, 3L, 2000L * 1000000, 10L), (7L, 3L, 2000L * 1000000, 20L)
    ).toDF("event_id", "user_id", "tus", "cents")
    def run(df: org.apache.spark.sql.DataFrame) =
      Features.trailing(df, "user_id", col("tus"), col("cents"),
          3600L * 1000000L)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    val got = run(ev)
    val rows = Seq((1L, 1L, 0L, 150L), (2L, 1L, 1800L * 1000000, 250L),
      (3L, 1L, 3900L * 1000000, 100L), (4L, 1L, 4200L * 1000000, 300L),
      (5L, 2L, 1000L * 1000000, 500L),
      (6L, 3L, 2000L * 1000000, 10L), (7L, 3L, 2000L * 1000000, 20L))
    rows.foreach { case (id, u, t, _) =>
      val frame = rows.filter { case (_, u2, t2, _) =>
        u2 == u && t2 <= t && t2 >= t - 3600L * 1000000L }
      assert(got(id) == ((frame.size.toLong, frame.map(_._4).sum)),
        s"event $id")
    }
    // ties share identical frames (value-based RANGE, not row-based)
    assert(got(6L) == got(7L))
    assert(run(ev.repartition(5)) == got)
  }

  test("zValue matches reference interleave; buckets are square tiles") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
        .sum
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val rows = grid.select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 6), s"($x,$y)")
    }
    // z >> 8 buckets the 64×64 grid into contiguous 16×16 tiles: every
    // bucket spans ≤ 15 in BOTH dimensions — the multi-dim pruning win
    rows.groupBy(_._3 >> 8).foreach { case (_, tile) =>
      val xs = tile.map(_._1); val ys = tile.map(_._2)
      assert(tile.length == 256)
      assert(xs.max - xs.min == 15 && ys.max - ys.min == 15)
    }
  }

  test("zoneMap stats + scanFlag prune disjoint files only") {
    // 4 synthetic files: x∈[0,9] y∈[0,9] / x∈[10,19] y∈[0,9] /
    // x∈[0,9] y∈[10,19] / x∈[10,19] y∈[10,19]
    val rows = for (x <- 0L until 20L; y <- 0L until 20L) yield (x, y)
    val zm = Layout.zoneMap(rows.toDF("x", "y"),
        (col("x") / 10).cast("long") * 2 + (col("y") / 10).cast("long"),
        Seq("x" -> col("x"), "y" -> col("y")))
      .withColumn("scanned",
        Layout.scanFlag(Seq(("x", lit(3L), lit(6L)), ("y", lit(12L), lit(30L)))))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))
      .toMap
    // only the (x-low, y-high) file intersects x∈[3,6] ∧ y∈[12,30]
    assert(zm(0L) === ((0L, 9L, 0L, 9L, 100L, false)))
    assert(zm(1L) === ((0L, 9L, 10L, 19L, 100L, true)))
    assert(zm(2L) === ((10L, 19L, 0L, 9L, 100L, false)))
    assert(zm(3L) === ((10L, 19L, 10L, 19L, 100L, false)))
  }

  test("zoneMap is one map-side-combinable hash aggregate") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    val plan = Layout.zoneMap(df, col("x") % 4,
        Seq("y" -> col("y"))).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("SortAggregate") && !plan.contains("Window"))
  }

  test("compactionPlan bins files in order by the offset rule") {
    val files = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L))
      .toDF("fid", "sz")
    val bins = Layout.compactionPlan(files, col("fid"), col("sz"), 10L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    assert(bins === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    // an oversize file claims its own bin range; order is preserved
    val big = Seq((1L, 25L), (2L, 5L), (3L, 5L)).toDF("fid", "sz")
    val b2 = Layout.compactionPlan(big, col("fid"), col("sz"), 10L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    assert(b2 === Map(1L -> 0L, 2L -> 2L, 3L -> 3L))
  }

  test("zOrdered range-partitions and locally sorts by the z-value") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y").repartition(9)
    val z = Layout.zOrdered(grid, Seq("x", "y"), bits = 5, numFiles = 4)
    // per-partition z sequences are sorted and partition ranges disjoint
    val parts = z.select(spark_partition_id().as("p"), col("zval"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    parts.values.foreach(zs => assert(zs == zs.sorted))
    val ranges = parts.toSeq.sortBy(_._1)
      .map { case (_, zs) => (zs.min, zs.max) }
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
    // nothing lost, z computed over all rows
    assert(z.count() == 32L * 32L)
  }

  test("PQ: deterministic fit, valid codes, decent ADC recall") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val m1 = Similarity.pqFit(e, m = 16, ks = 16)
    val m2 = Similarity.pqFit(e, m = 16, ks = 16)
    // bitwise-equal fits: the oracle embeds a re-fit's codebooks
    assert(m1.codebooks.flatten.flatten.toSeq ==
      m2.codebooks.flatten.flatten.toSeq)
    assert(m1.biases.flatten.toSeq == m2.biases.flatten.toSeq)
    val enc = Similarity.pqEncode(e, m1)
    assert(enc.count() ==
      Similarity.normalized(e, "vec_id", "embedding").count())
    val codes = enc.select(explode(col("codes")).as("c"))
      .collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 16))
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(queries, e, 10, m1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.3, s"ADC recall $recall")
  }

  test("langHalves flags mixed-language concatenations only") {
    val df = Seq(
      (1L, "the cat and the dog of a to the house " +
        "el perro y la casa de que el gato y la luna"),
      (2L, "the cat and the dog of a to the house and the tree of a"))
      .toDF("id", "text")
    val r = df.select(col("id"),
        TextAnalysis.langHalves(col("text")).as("lh"))
      .select(col("id"), col("lh.lang_a"), col("lh.lang_b"))
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getString(2)))
      .toMap
    assert(r(1L) == (("en", "es")))
    assert(r(2L)._1 == r(2L)._2)
    // null text: both halves 'de', matching langId(NULL) and the oracle
    val n = Seq((3L, null.asInstanceOf[String])).toDF("id", "text")
      .select(TextAnalysis.langHalves(col("text")).as("lh"),
        TextAnalysis.langId(col("text")).as("whole"))
      .collect()(0)
    assert(n.getStruct(0).getString(0) == "de" &&
      n.getStruct(0).getString(1) == "de" && n.getString(1) == "de")
  }

  test("joinSizeEstimate predicts the exact join size and the hot key") {
    // key 7 is hot on both sides: 20×30 = 600 rows from one key
    val l = ((1L to 100L).map(k => (k, k)) ++
      (1L to 19L).map(i => (1000L + i, 7L))).toDF("row_id", "k")
    val r = ((1L to 100L).map(k => (k, k)) ++
      (1L to 29L).map(i => (2000L + i, 7L))).toDF("row_id", "k")
    val est = graft.ext.Profile.joinSizeEstimate(l, r, "k").collect()(0)
    val actual = l.join(r, "k").count()
    assert(est.getLong(0) == actual)
    assert(est.getLong(1) == 7L)
    assert(est.getLong(2) == 20L * 30L)
    // disjoint extra keys on one side contribute nothing
    val l2 = l.unionByName(Seq((9999L, 9999L)).toDF("row_id", "k"))
    assert(graft.ext.Profile.joinSizeEstimate(l2, r, "k")
      .collect()(0).getLong(0) == actual)
    // fully disjoint key sets: (0, NULL, NULL), never a NULL count or
    // an ANSI element_at error
    val d = graft.ext.Profile.joinSizeEstimate(
      l.withColumn("k", col("k") + 100000L), r, "k").collect()(0)
    assert(d.getLong(0) == 0L && d.isNullAt(1) && d.isNullAt(2))
  }

  test("IVF-PQ: probe-restricted ADC subset of full-scan ADC, recall ok") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val model = Similarity.pqFit(e, m = 16, ks = 16)
    val cents = Similarity.kmeansCentroids(e, nLists = 8)
    val queries = e.filter(col("vec_id") < 10)
    val ivfpq = Similarity.ivfPqTopK(queries, e, 10, model, cents,
        nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same ADC scores as the full-scan PQ search — probe restriction
    // can only REMOVE candidates, so sets relate by recall, and both
    // must overlap the exact answer reasonably
    val full = Similarity.pqTopK(queries, e, 10, model).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallVsFull = (ivfpq & full).size.toDouble / full.size
    val recallVsExact = (ivfpq & exact).size.toDouble / exact.size
    assert(recallVsFull > 0.5, s"vs full-ADC $recallVsFull")
    assert(recallVsExact > 0.25, s"vs exact $recallVsExact")
    assert(ivfpq.size == full.size, "both return k per query")
  }

  test("dedup/similarity release their caches before returning") {
    spark.catalog.clearCache()
    Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5).count()
    Dedup.minhashCandidates(docs, "doc_id", "text").count()
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 50)
    Similarity.lshCandidatePairs(e, nPlanes = 6, threshold = 0.3).count()
    Similarity.ivfIndex(e, nLists = 4).count()
    Similarity.knnJoinLsh(e, 3, nPlanes = 6).count()
    TextAnalysis.unigramLogProb(docs, "doc_id", "text").count()
    TextAnalysis.bigramLogProb(docs, "doc_id", "text").count()
    assert(org.apache.spark.sql.GraftSqlShim.cacheIsEmpty(spark),
      "an operator left an InMemoryRelation cached after returning")
  }

  test("cosine similarity: known vectors") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val sims = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(sims((1L, 3L)) - 1.0) < 1e-12) // parallel
    assert(math.abs(sims((1L, 2L))) < 1e-12) // orthogonal
  }

  test("brute-force top-k ranks by cosine") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      df.filter(col("vec_id") === 0L), df, 2).collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    // closest to (1,0): vec 3 (cos≈0.9988) then vec 1 (cos≈0.9939)
    assert(top.toSeq == Seq((3L, 1), (1L, 2)))
  }

  test("semanticCanonical: within-cluster near-dups map to min partner") {
    // first-2 centroids are the axes (vecs 0, 1); 2/3 near-dup with 0
    // on x, 4 with 1 on y, 5 in a cluster but far from its members
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.99f, 0.14f)), (3L, Seq(0.995f, 0.1f)),
      (4L, Seq(0.05f, 1.0f)), (5L, Seq(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.firstIdCentroids(df, 2)
    val got = Dedup.semanticCanonical(df, cents, threshold = 0.98)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 and 3 both canonicalize to 0 (their smallest partner, not 2→3's
    // pairwise chain); 4's partner is 1; 5 survives (cos ≈ 0.71..0.76)
    assert(got == Map(2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("LSH pairs are a subset of exact pairs at the same threshold") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 100)
    val exact = Similarity.exactPairs(e, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCandidatePairs(e, nPlanes = 6, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("knnJoinLsh: neighbors are bucket-mates ranked by exact cosine") {
    // two tight clusters far apart: in-bucket neighbors are in-cluster
    val vecs = (0 until 20).map { i =>
      val base = if (i < 10) Array(1.0f, 0.05f * i, 0.0f)
                 else Array(-1.0f, 0.0f, 0.05f * (i - 10))
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val knn = Similarity.knnJoinLsh(vecs, 3, nPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(knn.nonEmpty)
    // neighbors never cross the cluster boundary (opposite sign dim 0
    // → different sign bit on virtually every hyperplane)
    knn.foreach { case (q, n, _) =>
      assert((q < 10) == (n < 10), s"cross-cluster pair ($q,$n)") }
    // ranks are 1..k dense per query and ordered by descending cosine
    knn.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.size).toSeq)
    }
  }

  test("knnJoinLsh bucket cap prunes a degenerate hub, others untouched") {
    // 30 identical vectors form one hub bucket; 6 spread vectors stay
    val hub = (0 until 30).map(i =>
      (i.toLong, Array(1.0f, 1.0f, 1.0f)))
    val rest = (100 until 106).map { i =>
      (i.toLong, Array.tabulate(3)(d =>
        (math.sin(i * 1.7 + d) - 0.4).toFloat))
    }
    val vecs = (hub ++ rest).toDF("vec_id", "embedding")
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val capped = edges(Similarity.knnJoinLsh(vecs, 3, nPlanes = 4,
      maxBucketSize = 10))
    // hub ids (bucket of 30 > cap 10) produce no rows
    assert(capped.forall(_._1 >= 100L))
    // maxBucketSize = 0 is the explicit uncapped escape hatch (the
    // DEFAULT is now DefaultBucketCap — on, per the round-4 directive)
    val uncapped = edges(Similarity.knnJoinLsh(vecs, 3, nPlanes = 4,
      maxBucketSize = 0))
    assert((0 until 30).map(_.toLong).toSet
      .subsetOf(uncapped.map(_._1).toSet))
    // recall bound made concrete: non-hub queries keep their EXACT
    // uncapped edge set — pruning touched only the oversized bucket
    assert(capped.toSet == uncapped.filter(_._1 >= 100L).toSet)
    // hubness-report cross-check: capped-away hub members show zero
    // in-degree, exactly what the in-degree diagnostic would surface.
    // (Uncapped, the hub's smallest ids dominate in-degree — 29 ties at
    // sim 1.0 rank by id — so only SOME hub ids appear as neighbors.)
    val hubIds = (0 until 30).map(_.toLong).toSet
    assert(hubIds.intersect(capped.map(_._2).toSet).isEmpty)
    assert(hubIds.intersect(uncapped.map(_._2).toSet).nonEmpty)
    // the default cap (4096) never binds at this size: identical to
    // the uncapped run
    assert(edges(Similarity.knnJoinLsh(vecs, 3, nPlanes = 4)).toSet ==
      uncapped.toSet)
  }

  test("knnJoinLshMulti: recall never below single-table, no dup pairs") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (math.sin(i * 0.9 + d * 1.3) + 0.05 * d).toFloat))
    }.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = pairs(Similarity.bruteForceTopK(vecs, vecs, 3)).toSet
    val single = pairs(Similarity.knnJoinLsh(vecs, 3, nPlanes = 8))
    val multi = pairs(Similarity.knnJoinLshMulti(vecs, 3,
      nPlanes = 8, nTables = 2))
    // union of tables can only widen the candidate set
    assert((multi.toSet & exact).size >= (single.toSet & exact).size)
    // distinct() collapsed pairs found by both tables
    assert(multi.size == multi.toSet.size)
    // every query's ranks stay dense 1..n
    multi.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.size <= 3)
    }
  }

  test("IVF top-k: probe-restricted search has decent recall") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Similarity.ivfIndex(e, nLists = 8)
    val approx = Similarity.ivfTopK(queries, index, e, 10,
      nProbe = 4, nLists = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing half the lists should recover a good share of true top-10
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.4, s"recall $recall")
    assert(approx.size == exact.size) // k results per query either way
  }

  test("text analysis: tokens, ratios, langid, fingerprint") {
    val df = Seq("The quick brown fox!").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.wordTokenCount(col("text")).as("nw"),
      TextAnalysis.alphaRatio(col("text")).as("alpha"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()(0)
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 5) // 4 words + '!'
    assert(r.getDouble(2) > 0.7 && r.getDouble(2) < 1.0)
    assert(r.getString(3).length == 32)
    val lang = Seq("the cat and the dog of a house to a")
      .toDF("t").select(TextAnalysis.langId(col("t"))).collect()(0)
      .getString(0)
    assert(lang == "en")
    val zh = Seq("这是中文文本").toDF("t")
      .select(TextAnalysis.langId(col("t"))).collect()(0).getString(0)
    assert(zh == "zh")
  }

  test("multimodal: real WAV decode recovers encoded PCM statistics") {
    val ids = Seq(0L, 1L, 7L, 49L, 255L, 4096L)
    // expected stats straight from the synthetic-PCM formulas
    def expect(id: Long): (Int, Long, Long) = {
      val n = Multimodal.synthAudioSamples(id)
      val samples = (0 until n).map(i => Multimodal.synthAudioSample(id, i))
      (n, samples.map(s => math.abs(s).toLong).sum,
        samples.count(s => math.abs(s) >= Multimodal.ClipLevel).toLong)
    }
    val meta = Multimodal.decodeAudio(
        Multimodal.synthesizeAudio(ids.toDF("doc_id"), "doc_id"))
      .collect().map(m => m.id -> m).toMap
    ids.foreach { id =>
      val (n, sumAbs, clipped) = expect(id)
      val m = meta(id)
      assert(m.format == "wav" && m.sample_rate == 8000 &&
        m.channels == 1 && m.bits == 16, s"container facts for $id: $m")
      assert(m.n_bytes == 44 + 2 * n && m.n_samples == n &&
        m.duration_us == n * 125L, s"sizing for $id: $m")
      assert(m.sum_abs == sumAbs && m.n_clipped == clipped,
        s"sample stats for $id: $m")
    }
    // corrupt inputs: truncated header, lying RIFF magic, null — all
    // degrade to the typed unknown row, never an exception
    val wav = Multimodal.encodeWav(7L)
    Seq(wav.take(10), "RIFFxxxxWAVEgarbage".getBytes("US-ASCII"),
        Array.empty[Byte]).foreach { bad =>
      val m = Multimodal.decodeWav(99L, bad)
      assert(m.format == "unknown" && m.n_samples == 0 &&
        m.sum_abs == 0L, s"must degrade typed: $m")
    }
  }

  test("multimodal: real BMP/PNG decode recovers encoded pixels") {
    val ids = Seq(0L, 1L, 7L, 12L, 90L, 255L, 256L).toDF("doc_id")
    // expected stats straight from the synthetic-content formulas
    def expect(id: Long): (Int, Int, Long, Long, Long) = {
      val (w, h) = Multimodal.synthDims(id)
      val sr = (0 until w).map(x => (id + x) % 256).sum * h
      val sg = (id % 256) * w * h
      val sb = (0 until h).map(y => (id * 3 + y) % 256).sum * w
      (w, h, sr, sg, sb)
    }
    for (fmt <- Seq("bmp", "png")) {
      val meta = Multimodal.decode(
          Multimodal.synthesizeImages(ids, "doc_id", fmt))
        .collect().map(m => m.id -> m).toMap
      assert(meta.size == 7)
      meta.foreach { case (id, m) =>
        val (w, h, sr, sg, sb) = expect(id)
        assert(m.format == fmt && m.width == w && m.height == h)
        assert(m.channels == 3 && m.n_frames == 1)
        assert((m.sum_red, m.sum_green, m.sum_blue) == ((sr, sg, sb)),
          s"pixel sums for id=$id fmt=$fmt")
        if (fmt == "bmp") // uncompressed: exact byte length
          assert(m.n_bytes == 54 + ((24 * w + 31) / 32) * 4 * h)
        else assert(m.n_bytes > 8) // compressed: just non-trivial
      }
    }
  }

  test("multimodal: JPEG round-trip decodes container facts; lossy pixels") {
    val ids = Seq(0L, 1L, 7L, 12L, 90L, 255L, 256L).toDF("doc_id")
    val meta = Multimodal.decode(
        Multimodal.synthesizeImages(ids, "doc_id", "jpeg"))
      .collect().map(m => m.id -> m).toMap
    assert(meta.size == 7)
    meta.foreach { case (id, m) =>
      val (w, h) = Multimodal.synthDims(id)
      // container facts are exact even under lossy DCT encoding
      assert(m.format == "jpeg" && m.width == w && m.height == h,
        s"container facts for id=$id")
      assert(m.channels == 3 && m.n_frames == 1)
      // pixels decoded (not the unknown row): green is constant across
      // the raster, so its decoded mean must be near id%256 even lossy
      val g = m.sum_green.toDouble / (w * h)
      assert(math.abs(g - (id % 256)) <= 16.0,
        s"decoded green mean for id=$id: $g vs ${id % 256}")
    }
  }

  test("multimodal: corrupt blobs degrade to typed unknown rows") {
    val d = Seq((1L, "hello"), (2L, "BM garbage that is not a bitmap"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val withBin = Multimodal.withBinary(d, "doc_id", "text")
    val meta = Multimodal.decode(withBin).collect()
      .map(m => m.id -> m).toMap
    // plain text, text that passes the magic sniff but fails the
    // header guard / codec, and a null blob: all typed unknown
    Seq(1L, 2L, 3L).foreach { id =>
      val m = meta(id)
      assert(m.format == "unknown" && m.width == 0 && m.height == 0)
      assert(m.sum_red == 0L && m.channels == 0)
    }
    assert(meta(1L).n_bytes == 5 && meta(3L).n_bytes == 0)
    // determinism: same input → same output
    val again = Multimodal.decode(withBin).collect()
      .map(m => m.id -> m).toMap
    assert(again == meta)
    val frames = Multimodal.sampleFrames(withBin, 3).collect()
    assert(frames.nonEmpty &&
      frames.forall(_.getAs[Int]("offset") < 31))
  }

  test("multimodal: perceptual dHash matches analytic bits, survives " +
      "container change and brightness shift") {
    // independent re-derivation of the 56 bits from the synthetic
    // pixel formulas (no image codec involved)
    def expectHash(id: Long): Long = {
      val w = (id % 13 + 1).toInt; val h = (id % 7 + 1).toInt
      def luma(x: Int, y: Int): Int = {
        val sx = x * w / 8; val sy = y * h / 8
        val r = ((id + sx) % 256).toInt
        val g = (id % 256).toInt
        val b = ((id * 3 + sy) % 256).toInt
        (r * 299 + g * 587 + b * 114) / 1000
      }
      var hash = 0L; var bit = 0
      for (y <- 0 until 8; x <- 0 until 7) {
        if (luma(x + 1, y) > luma(x, y)) hash |= 1L << bit
        bit += 1
      }
      hash
    }
    val ids = Seq(0L, 1L, 7L, 12L, 90L, 255L, 256L).toDF("doc_id")
    val bmp = Multimodal.perceptualHash(
        Multimodal.synthesizeImages(ids, "doc_id", "bmp"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val png = Multimodal.perceptualHash(
        Multimodal.synthesizeImages(ids, "doc_id", "png"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    Seq(0L, 1L, 7L, 12L, 90L, 255L, 256L).foreach { id =>
      assert(bmp(id) == expectHash(id), s"analytic dHash for id=$id")
      assert(bmp(id) == png(id), s"container invariance for id=$id")
      assert(bmp(id) >= 0L) // 56 bits: never sign-negative
    }
    // uniform brightness shift leaves every gradient bit unchanged
    import java.awt.image.BufferedImage
    def img(shift: Int): BufferedImage = {
      val im = new BufferedImage(9, 9, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 9; x <- 0 until 9) {
        val v = math.min(255, (x * 17 + y * 5) % 200 + shift)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    assert(Multimodal.dHash56(img(0)) == Multimodal.dHash56(img(40)))
    // corrupt blobs degrade to the typed unknown row with hash 0
    val bad = Multimodal.perceptualHash(
        Multimodal.withBinary(
          Seq((1L, "not an image")).toDF("doc_id", "text"),
          "doc_id", "text"))
      .collect()
    assert(bad.length == 1 && bad(0).getString(1) == "unknown" &&
      bad(0).getLong(4) == 0L)
  }

  test("phashNearDuplicates: banded LSH equals brute force through the " +
      "real decode path; planted twins surface; cap yields a subset") {
    import spark.implicits._
    val ids = (1L to 60L).toDF("doc_id")
    val hashes = Multimodal.perceptualHash(
        Multimodal.synthesizeNearDupImages(ids, "doc_id", every = 5))
      .select(col("id"), col("dhash"))
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    // brute-force reference over the SAME decoded hashes
    val ref = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d)).toSet
    val got = Multimodal.phashNearDuplicates(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == ref, "pigeonhole completeness: banded == brute force")
    // planted twins: original 2k vs perturbed 2k+1 — a one-pixel edit,
    // so some twins land within distance 7 and must be reported
    val twins = hs.toMap
    val near = (1L to 60L).filter(_ % 5 == 0).filter { k =>
      java.lang.Long.bitCount(twins(k * 2) ^ twins(k * 2 + 1)) <= 7
    }
    assert(near.nonEmpty, "fixture must plant at least one near twin")
    near.foreach { k =>
      assert(got.exists(p => p._1 == k * 2 && p._2 == k * 2 + 1),
        s"planted twin pair for doc $k must surface")
    }
    // hot-bucket cap: output is a SUBSET (whole buckets dropped from
    // candidate generation — documented recall, never extra pairs)
    val capped = Multimodal.phashNearDuplicates(hashes,
        maxBucketSize = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped.subsetOf(got))
  }

  /** Brute-force Jaccard reference over distinct token sets. */
  private def refJaccardPairs(docs: Seq[(Long, Seq[String])],
      num: Long, den: Long): Set[(Long, Long, Long)] = {
    val sets = docs.map { case (id, ts) => id -> ts.toSet }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      if inter * den >= (sa.size + sb.size - inter) * num
    } yield (a, b, inter)).toSet
  }

  test("law: jaccardJoinExact equals brute force — no LSH misses") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocab = (0 until 30).map(i => s"w$i")
    val docGen = org.scalacheck.Gen.listOfN(14,
      Gen.zip(Gen.choose(0L, 13L), Gen.someOf(vocab).map(_.toSeq)))
      .map(_.distinctBy(_._1))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(docGen) { docs =>
        val df = docs.toDF("id", "toks")
        val got = Dedup.jaccardJoinExact(df, "id", col("toks"), 6L, 10L)
          .select("id_a", "id_b", "inter").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        got == refJaccardPairs(docs, 6L, 10L)
      })
    assert(res.passed, res.status.toString)
  }

  test("jaccardJoinExact: exact rational threshold includes J == τ") {
    // inter 7, union 10 → J = 7/10 EXACTLY: must be in at τ = 7/10
    val a = (1 to 9).map(i => s"t$i")           // 9 tokens
    val b = (1 to 7).map(i => s"t$i") :+ "t10"  // 8 tokens, inter 7
    val in = Dedup.jaccardJoinExact(
        Seq((1L, a), (2L, b)).toDF("id", "toks"), "id", col("toks"),
        7L, 10L)
      .collect()
    assert(in.length === 1 && in.head.getAs[Long]("inter") === 7L)
    assert(in.head.getAs[Double]("jaccard") === 0.7)
    // one token less of overlap (inter 6, union 11) must be out
    val c = (1 to 6).map(i => s"t$i") ++ Seq("t11", "t12", "t13")
    val out = Dedup.jaccardJoinExact(
      Seq((1L, a), (2L, c)).toDF("id", "toks"), "id", col("toks"),
      7L, 10L)
    assert(out.count() === 0L)
  }

  test("bloomIndex/bloomScanFlag: no false negatives, real pruning") {
    // 20 files × 50 distinct keys each, disjoint ranges
    val rows = (0L until 1000L).map(i => (i / 50L, s"k$i"))
    val df = rows.toDF("f", "v")
    val idx = Layout.bloomIndex(df, col("f"), col("v"))
    // metadata-bounded: at most files × words rows
    assert(idx.count() <= 20L * 8L)
    // a probe present in files 3 and 7 MUST scan both (no false negs)
    val probes = Seq("k170", "k371").toDF("v")
    val scanned = Layout.bloomScanFlag(idx, probes)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(scanned.size === 20)
    assert(scanned(3L) && scanned(7L))
    // 512 bits / 50 keys → FP rate ~0.8%: pruning must actually fire
    assert(scanned.count(_._2) < 10, s"pruned too little: $scanned")
    // an absent key scans (almost) nothing
    val none = Layout.bloomScanFlag(idx, Seq("nope").toDF("v"))
      .where(col("scanned")).count()
    assert(none <= 2)
  }

  test("redactPii scrubs every occurrence of every pattern type") {
    import spark.implicits._
    val out = Seq(
      "mail a@b.co then c.d@e.org end",
      "call 555-867-5309 or 555 123 4567",
      "hosts 10.0.0.1 and 192.168.10.42",
      "clean text stays clean",
      "mixed a@b.co at 10.0.0.1 call 555-867-5309")
      .toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) === "mail <EMAIL> then <EMAIL> end")
    assert(out(1) === "call <PHONE> or <PHONE>")
    assert(out(2) === "hosts <IP> and <IP>")
    assert(out(3) === "clean text stays clean")
    assert(out(4) === "mixed <EMAIL> at <IP> call <PHONE>")
  }

  test("labelDisagreement flags the planted mislabeled point") {
    // two tight clusters; point 5 sits in cluster A but carries B's label
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), "A"), (2L, Seq(0.9f, 0.1f), "A"),
      (3L, Seq(1.0f, 0.1f), "A"), (5L, Seq(0.95f, 0.05f), "B"),
      (10L, Seq(0.0f, 1.0f), "B"), (11L, Seq(0.1f, 0.9f), "B"),
      (12L, Seq(0.0f, 0.9f), "B"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelDisagreement(
        Similarity.bruteForceTopK(vecs, vecs, 3), vecs)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3),
        r.getBoolean(5)))
      .toMap
    assert(out(5L)._1 === "B")
    assert(out(5L)._2 === 3L && out(5L)._3, "planted point must flag")
    // the well-labeled cluster cores must not flag
    assert(!out(1L)._3 && !out(10L)._3)
  }

  test("pcaFit finds the dominant direction, deterministically") {
    val vecs = (1 to 30).map(i =>
      (i.toLong, Seq(i.toFloat, i.toFloat, 0.01f))) ++
      Seq((100L, Seq(0.5f, -0.5f, 0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val pc = Similarity.pcaFit(df, iters = 50)
    // dominant mass sits on (1,1,~0)/sqrt(2)
    val target = math.sqrt(0.5)
    assert(math.abs(pc(0) - target) < 0.01, pc.toSeq.toString)
    assert(math.abs(pc(1) - target) < 0.01)
    assert(math.abs(pc(2)) < 0.05)
    // unit norm, positive-pivot sign, bitwise rerun stability
    assert(math.abs(pc.map(x => x * x).sum - 1.0) < 1e-12)
    assert(pc(pc.indices.maxBy(i => math.abs(pc(i)))) > 0)
    assert(Similarity.pcaFit(df, iters = 50).toSeq === pc.toSeq)
    // projection scores follow the data's dominant coordinate
    val sc = Similarity.pcaScores(df, pc)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc(30L) > sc(1L) && sc(30L) > 20.0)
  }

  test("bm25TopK: hand-computed rational score, zero-match filtered") {
    val corpus = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(corpus, col("doc_id"), col("text"),
        Seq("x"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // N=2, L=5, df=1 → idf = (4−2+1)/(2+1) = 1;
    // tf=2, len=3 → tfpart = 22·2·5 / (10·2·5 + 3·5 + 9·3·2) = 220/169
    val expect = BigDecimal(220.0 / 169.0)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq((1L, expect, 1L))) // doc 2 matched nothing
  }

  test("bm25TopK ranks by tf saturation and idf rarity") {
    val corpus = Seq(
      (1L, "a a a b"), (2L, "a b c"), (3L, "b c d"), (4L, "c d e"))
      .toDF("doc_id", "text")
    // 'a' appears in 2 docs, 'e' in 1: doc 4's rare-term hit (idf 7/3)
    // outranks doc 1's tf=3 common-term hit (idf 1, saturating), which
    // outranks doc 2's single common hit; doc 3 matches nothing
    val out = TextAnalysis.bm25TopK(corpus, col("doc_id"), col("text"),
        Seq("a", "e"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(4L, 1L, 2L))
    val ranks = TextAnalysis.bm25TopK(corpus, col("doc_id"),
        col("text"), Seq("a"), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(ranks === Seq(1L, 2L)) // topN honored, tf-desc order
  }

  test("rrfFuse: hand-computed reciprocal-rank fusion of two runs") {
    val runA = Seq((1L, 1L, 1L), (1L, 2L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val runB = Seq((1L, 2L, 1L), (1L, 3L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = Similarity.rrfFuse(runA, runB, topN = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // d2 rides both legs (1/62 + 1/61), d1 only A (1/61), d3 only B
    // (1/62) — fusion promotes the doc both retrievers agree on
    assert(out.map(_._1).toSeq === Seq(2L, 1L, 3L))
    assert(math.abs(out(0)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(out(1)._2 - 1.0 / 61) < 1e-12)
    assert(out.map(_._3).toSeq === Seq(1L, 2L, 3L))
    // equal fused scores tie-break by doc_id ascending
    val tied = Similarity.rrfFuse(
      Seq((1L, 9L, 1L), (1L, 4L, 2L)).toDF("query_id", "doc_id", "rank"),
      Seq((1L, 4L, 1L), (1L, 9L, 2L)).toDF("query_id", "doc_id", "rank"),
      topN = 10).orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(tied === Seq(4L, 9L))
  }

  test("silhouetteSimplified: aligned = 1, tie = 0 in smaller list") {
    val cents = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0))).toDF("list_id", "cvec")
    val vecs = Seq(
      (1L, Array(3.0f, 0.0f)),   // exactly centroid 0: s = 1
      (2L, Array(0.0f, 0.5f)),   // exactly centroid 1: s = 1
      (3L, Array(1.0f, 1.0f))    // equidistant tie: list 0, s = 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.silhouetteSimplified(vecs, cents)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L) === ((2L, 0.5)))  // mean of s=1 (vec 1) and s=0 (tie)
    assert(out(1L) === ((1L, 1.0)))
  }

  test("silhouetteSimplified: tight cluster outscores a diffuse one") {
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0))).toDF("list_id", "cvec")
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f)),  // hugging centroid 0
      (2L, Array(1.0f, 0.0f, 0.05f)),
      (3L, Array(0.5f, 1.0f, 0.0f)),   // diffuse around centroid 1
      (4L, Array(0.0f, 1.0f, 0.9f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.silhouetteSimplified(vecs, cents)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) > out(1L))
    assert(out.values.forall(s => s >= 0.0 && s <= 1.0))
    // deterministic: a second run is bit-identical
    val again = Similarity.silhouetteSimplified(vecs, cents)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === out)
  }
}