package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Algebraic laws of the round-12 operators on random inputs — the
  * [[EvalPropSpec]] discipline: each law pins the distributed plan to
  * a straight-line driver-side reference or an exact identity, so a
  * regression in join/aggregate wiring (not just in formulas) fails
  * loudly.
  */
class Round12PropSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  /** Driver-side greedy longest-match reference: at each position the
    * longest vocab piece that matches steps the cursor, else 1.
    */
  private def greedyPieceCount(w: String, vocab: Set[String]): Long = {
    var pos = 0; var n = 0L
    val maxLen = if (vocab.isEmpty) 0 else vocab.map(_.length).max
    while (pos < w.length) {
      val step = (math.min(maxLen, w.length - pos) to 1 by -1)
        .find(l => vocab(w.substring(pos, pos + l)))
        .getOrElse(1)
      pos += step; n += 1
    }
    n
  }

  test("law: join-based bpePieceCounts equals the driver-side greedy " +
      "reference AND the literal-array bpePieces, any vocab shape") {
    // tiny alphabet so pieces actually hit; piece lengths 1..5 so
    // end-of-word truncated probes (a length-l probe near the end
    // yields a shorter substring) are exercised; vocabs WITHOUT
    // single-char pieces exercise the fallback-1 arm
    val gen = for {
      nPieces <- Gen.choose(1, 12)
      pieces <- Gen.listOfN(nPieces,
        Gen.choose(1, 5).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString)))
      nWords <- Gen.choose(1, 8)
      words <- Gen.listOfN(nWords,
        Gen.choose(1, 12).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString)))
    } yield (pieces.distinct, words.distinct)
    check(Prop.forAll(gen) { case (pieces, words) =>
      val got = TextAnalysis.bpePieceCounts(
          words.toDF("w"), pieces.toDF("piece"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaLiterals = words.toDF("w")
        .select(col("w"), size(TextAnalysis.bpePieces(col("w"), pieces))
          .cast("long").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ref = words.map(w => w -> greedyPieceCount(w, pieces.toSet))
        .toMap
      got == ref && viaLiterals == ref
    })
  }
}
