package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Algebraic laws of the round-11 operators on random inputs — the
  * [[EvalPropSpec]] discipline: each law pins the distributed plan to
  * a straight-line driver-side reference or an exact identity, so a
  * regression in shuffle/aggregate/sampling wiring (not just in
  * formulas) fails loudly.
  */
class Round11PropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("law: bounded_min_k equals sorted.take(k) under any partitioning") {
    val gen = for {
      n <- Gen.choose(0, 60)
      vs <- Gen.listOfN(n, Gen.choose(-1000L, 1000L))
      k <- Gen.choose(1, 12)
      parts <- Gen.choose(1, 7)
    } yield (vs, k, parts)
    check(Prop.forAll(gen) { case (vs, k, parts) =>
      val got =
        (if (vs.isEmpty) spark.emptyDataset[Long].toDF("x")
         else vs.toDF("x").repartition(parts))
          .agg(graft.functions.BoundedMinK.minK(col("x"), k))
          .collect()(0).getSeq[Long](0).toList
      got == vs.sorted.take(k)
    })
  }

  /** Random corpora over a tiny alphabet (so runs actually collide),
    * with an explicit planted shared run in half the cases.
    */
  private val corpusGen: Gen[List[(Long, Seq[String])]] = for {
    nDocs <- Gen.choose(2, 6)
    docs <- Gen.listOfN(nDocs,
      Gen.choose(12, 50).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c"))))
    plantRun <- Gen.oneOf(true, false)
    runLen <- Gen.choose(12, 25)
  } yield {
    val run = (1 to runLen).map(i => s"R$i")
    docs.zipWithIndex.map { case (toks, i) =>
      val t =
        if (plantRun && i < 2) toks.take(5) ++ run ++ toks.drop(5)
        else toks
      (i.toLong, t.toSeq)
    }
  }

  test("law: anchored self-join substring runs equal the sampling-free " +
      "batch-vs-corpus reference") {
    // substringRunsAgainst never samples (every batch gram joins), so
    // against(corpus, grams(corpus)) restricted to new_id < corpus_id
    // is an UNSAMPLED reference for the anchored self-join — equality
    // on random corpora is the covering-lemma losslessness, exercised
    // end-to-end rather than argued
    // cap = 0 is the exact path; the nonzero caps exercise the
    // round-12 unified semantics (hot grams invisible to seeding AND
    // extension in BOTH variants — the covering argument is cap-stable:
    // a surviving chain of >= stride consecutive positions still
    // contains a surviving anchor, so anchored == against under any cap)
    val gen = for {
      corpus <- corpusGen
      cap <- Gen.oneOf(0, 1, 2, 4)
    } yield (corpus, cap)
    check(Prop.forAll(gen) { case (corpus, cap) =>
      val df = corpus.toDF("id", "toks")
      val l = 12; val k = 8
      val anchored = Dedup.substringRuns(df, "id", col("toks"), l, k,
          maxGramFreq = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val reference = Dedup.substringRunsAgainst(df,
          Dedup.substringGrams(df, "id", col("toks"), k), l, k,
          maxGramFreq = cap)
        .filter(col("new_id") < col("corpus_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      anchored == reference
    })
  }

  test("law: strip conserves tokens — kept + removed = total, and " +
      "vanished docs are exactly the fully-covered ones") {
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("id", "toks")
      val runs = Dedup.substringRuns(df, "id", col("toks"), 12, 8)
      val stripped = Dedup.stripSubstringRuns(df, "id", col("toks"), runs)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      val sizes = corpus.map { case (id, t) => id -> t.size.toLong }.toMap
      // coverage per doc from the run intervals (driver-side reference)
      val covered = runs.collect()
        .groupBy(_.getLong(1))
        .map { case (id, rs) =>
          id -> rs.flatMap(r =>
            r.getLong(3) to (r.getLong(3) + r.getLong(4) - 1)).toSet
        }
      corpus.forall { case (id, toks) =>
        val cov = covered.getOrElse(id, Set.empty[Long])
        stripped.get(id) match {
          case None => cov.size == toks.size // fully covered → dropped
          case Some((text, kept, removed)) =>
            kept + removed == sizes(id) &&
              removed == cov.size &&
              // reassembled text is exactly the uncovered tokens in order
              text == toks.zipWithIndex
                .collect { case (t, i) if !cov((i + 1).toLong) => t }
                .mkString(" ")
        }
      }
    })
  }

  test("law: bpeTokenCounts via the distinct-word join equals the " +
      "direct per-row segmentation") {
    val docGen = for {
      n <- Gen.choose(1, 6)
      words <- Gen.listOfN(n, Gen.oneOf("the", "table", "customer",
        "part", "dup", "spark", "xyz", "scan", "batch", "a"))
    } yield words.mkString(" ")
    check(Prop.forAll(Gen.listOfN(4, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val vocab = graft.oracle.Fixtures.BpeVocab
      val joined = TextAnalysis.bpeTokenCounts(df, "id", col("text"),
          vocab)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val direct = df.select(col("id"),
          size(flatten(transform(TextAnalysis.tokens(col("text")),
            w => TextAnalysis.bpePieces(w, vocab)))).cast("long")
            .as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      joined == direct
    })
  }

  test("law: WAV round-trip recovers the synthetic PCM for random ids") {
    check(Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      val m = Multimodal.decodeWav(id, Multimodal.encodeWav(id))
      val n = Multimodal.synthAudioSamples(id)
      val samples = (0 until n).map(i => Multimodal.synthAudioSample(id, i))
      m.format == "wav" && m.n_samples == n &&
        m.sum_abs == samples.map(s => math.abs(s).toLong).sum &&
        m.n_clipped == samples.count(s =>
          math.abs(s) >= Multimodal.ClipLevel) &&
        m.duration_us == n * 1000000L / Multimodal.AudioRate
    })
  }
}
