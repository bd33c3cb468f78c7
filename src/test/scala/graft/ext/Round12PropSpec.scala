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

  /** Naive recompute-everything BPE reference: full pair recount and
    * full-histogram merge application every step — no incremental
    * index, no containing-words bookkeeping, deliberately nothing in
    * common with [[BpeTrainer]]'s update structure.
    */
  private def naiveMerges(hist: Map[String, Long], nMerges: Int,
      minCount: Long): List[(Long, String, String, String, Long)] = {
    def applyMerge(s: List[String], l: String, r: String): List[String] =
      s match {
        case a :: b :: rest if a == l && b == r =>
          (l + r) :: applyMerge(rest, l, r)
        case a :: rest => a :: applyMerge(rest, l, r)
        case Nil => Nil
      }
    var state: Map[List[String], Long] =
      hist.map { case (w, c) => w.map(_.toString).toList -> c }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Long, String, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= nMerges && !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (s, c) =>
        s.zip(s.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val cands = pc.filter(_._2 >= minCount)
      if (cands.isEmpty) stop = true
      else {
        val ((l, rt), c) = cands.minBy { case ((l, rt), c) =>
          (-c, l, rt)
        }
        state = state.map { case (s, cn) => applyMerge(s, l, rt) -> cn }
        out += ((r.toLong, l, rt, l + rt, c))
        r += 1
      }
    }
    out.toList
  }

  /** Textbook full-matrix Levenshtein DP — nothing in common with
    * either Spark's banded builtin or the PassJoin candidate plan.
    */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("law: editDistancePairs equals the all-pairs DP reference — " +
      "short strings, equal lengths, and empty strings included") {
    val gen = for {
      d <- Gen.choose(1, 3)
      n <- Gen.choose(2, 10)
      strs <- Gen.listOfN(n,
        Gen.choose(0, 12).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString)))
    } yield (d, strs.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    check(Prop.forAll(gen) { case (d, rows) =>
      val got = Dedup.editDistancePairs(rows.toDF("id", "s"), "id",
          col("s"), d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ref = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib
        dist = lev(sa, sb)
        if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
      // segment-frequency cap: a cap that nothing reaches is the
      // exact join; a tight cap is a SUBSET with exact distances
      val uncapped = Dedup.editDistancePairs(rows.toDF("id", "s"),
          "id", col("s"), d, maxSegFreq = 1000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val capped = Dedup.editDistancePairs(rows.toDF("id", "s"),
          "id", col("s"), d, maxSegFreq = 1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == ref && uncapped == ref && capped.subsetOf(ref)
    })
  }

  test("law: editDistanceAgainst equals the batch×corpus DP reference — " +
      "corpus strings longer AND shorter than the probes, shorts on " +
      "both sides") {
    val strGen = Gen.choose(0, 12).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString))
    val gen = for {
      d <- Gen.choose(1, 3)
      nc <- Gen.choose(1, 8)
      corpus <- Gen.listOfN(nc, strGen)
      nb <- Gen.choose(1, 6)
      batch <- Gen.listOfN(nb, strGen)
    } yield (d,
      corpus.zipWithIndex.map { case (s, i) => (i.toLong, s) },
      batch.zipWithIndex.map { case (s, i) => (100L + i, s) })
    check(Prop.forAll(gen) { case (d, corpus, batch) =>
      val c = corpus.toDF("__id", "__s")
        .withColumn("__l", length(col("__s")))
      val got = Dedup.editDistanceAgainst(batch.toDF("id", "s"), "id",
          col("s"), Dedup.editSegmentFrame(c, d),
          c.select(col("__id").as("id"), col("__s").as("s")),
          c.select(col("__l").as("len"), col("__id").as("id")), d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ref = (for {
        (ib, sb) <- batch; (ic, sc) <- corpus
        dist = lev(sb, sc)
        if dist <= d
      } yield (ib, ic, dist.toLong)).toSet
      got == ref
    })
  }

  test("law: the indexed incremental BPE trainer learns the same merge " +
      "sequence as the naive recompute-everything reference") {
    val gen = for {
      nWords <- Gen.choose(1, 12)
      words <- Gen.listOfN(nWords,
        Gen.choose(1, 8).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
      counts <- Gen.listOfN(nWords, Gen.choose(1L, 20L))
      nMerges <- Gen.choose(1, 8)
      minCount <- Gen.choose(1L, 3L)
    } yield (words.zip(counts).groupMapReduce(_._1)(_._2)(_ + _),
      nMerges, minCount)
    check(Prop.forAll(gen) { case (hist, nMerges, minCount) =>
      val got = TextAnalysis.learnBpeMergesFromHistogram(
          hist.toSeq.toDF("w", "cnt"), nMerges, minCount)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toList
      got == naiveMerges(hist, nMerges, minCount)
    })
  }
}
