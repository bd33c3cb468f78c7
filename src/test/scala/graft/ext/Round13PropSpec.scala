package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Algebraic laws of the round-13 operators — the house discipline:
  * pin each distributed plan to a reference implementation on random
  * inputs so wiring regressions (not just formula bugs) fail loudly.
  */
class Round13PropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  /** Random corpora with a SAME-POSITION boilerplate prefix on a random
    * subset — the one-diagonal/many-partners shape the grouped
    * extension targets — plus free tails over a tiny alphabet (so
    * accidental runs also collide) and an optional planted mid-doc run.
    */
  private val templateCorpusGen: Gen[List[(Long, Seq[String])]] = for {
    nDocs <- Gen.choose(3, 8)
    boilerLen <- Gen.choose(12, 24)
    withBoiler <- Gen.listOfN(nDocs, Gen.oneOf(true, true, false))
    docs <- Gen.listOfN(nDocs,
      Gen.choose(12, 40).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c"))))
    plantRun <- Gen.oneOf(true, false)
    runLen <- Gen.choose(12, 20)
  } yield {
    val boiler = (1 to boilerLen).map(i => s"B$i")
    val run = (1 to runLen).map(i => s"R$i")
    docs.zip(withBoiler).zipWithIndex.map { case ((toks, b), i) =>
      val base = if (b) boiler ++ toks else toks.toSeq
      val t = if (plantRun && i < 2) base.take(5) ++ run ++ base.drop(5)
        else base
      (i.toLong, t)
    }
  }

  test("law: grouped-diagonal substring extension ≡ the direct " +
      "per-candidate extension, under any cap") {
    val gen = for {
      corpus <- templateCorpusGen
      cap <- Gen.oneOf(0, 1, 2, 4)
    } yield (corpus, cap)
    check(Prop.forAll(gen) { case (corpus, cap) =>
      val df = corpus.toDF("id", "toks")
      val l = 12; val k = 8
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      rows(Dedup.substringRuns(df, "id", col("toks"), l, k,
        maxGramFreq = cap)) ==
        rows(Dedup.substringRunsDirect(df, "id", col("toks"), l, k,
          maxGramFreq = cap))
    })
  }

  test("law: distributed BPE merge learning ≡ the single-task trainer " +
      "on random word histograms") {
    val histGen: Gen[List[(String, Long)]] = for {
      n <- Gen.choose(1, 25)
      ws <- Gen.listOfN(n,
        Gen.choose(1, 8).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))))
      cs <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield ws.map(_.mkString).zip(cs)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toList
    val gen = for {
      hist <- histGen
      nMerges <- Gen.choose(1, 12)
      minCount <- Gen.choose(1L, 4L)
    } yield (hist, nMerges, minCount)
    check(Prop.forAll(gen) { case (hist, nMerges, minCount) =>
      val df = hist.toDF("w", "cnt")
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList.sortBy(_._1)
      val single = rows(TextAnalysis.learnBpeMergesFromHistogram(df,
        nMerges, minCount))
      rows(TextAnalysis.learnBpeMergesDistributed(df, nMerges,
        minCount)) == single &&
        rows(TextAnalysis.learnBpeMergesDistributedDelta(df, nMerges,
          minCount)) == single
    })
  }
}
