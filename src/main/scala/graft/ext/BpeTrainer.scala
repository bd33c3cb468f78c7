package graft.ext

import scala.collection.mutable

/** One learned BPE merge: at step `merge_rank` the adjacent symbol
  * pair (lhs, rhs) — the most frequent pair at that step, with total
  * corpus occurrence count `cnt` — becomes the single symbol `merged`.
  */
final case class BpeMerge(merge_rank: Long, lhs: String, rhs: String,
    merged: String, cnt: Long)

/** Sequential BPE merge learning over a word histogram — the classic
  * indexed incremental trainer: maintain adjacent-pair counts plus a
  * pair → containing-words index so each merge step touches only the
  * words that actually contain the merged pair, not the whole
  * histogram. Argmax is a deterministic full scan per step
  * (count desc, then (lhs, rhs) lexicographic — ties impossible to
  * break differently across engines, so the DuckDB twin reproduces the
  * exact merge sequence).
  *
  * This is deliberately NOT a distributed loop: each merge depends on
  * the previous one, so BPE learning is inherently sequential — the
  * corpus-scale work is the word HISTOGRAM (a distributed hash-agg in
  * [[TextAnalysis.learnBpeMerges]]); the trainer then runs once,
  * executor-side, over that vocabulary-sized frame (the standard
  * map-reduce split for BPE: even web-scale corpora reduce to a
  * histogram of ~10⁷–10⁸ distinct words, and the indexed update makes
  * each of the ~50k production merges proportional to the affected
  * words only). A per-merge distributed variant would pay nMerges
  * shuffle jobs for data that fits one task.
  */
object BpeTrainer {

  /** Words as codepoint symbols — matches character (not UTF-16 unit)
    * semantics, so substr/len arithmetic agrees with the SQL twin on
    * any input, not just ASCII.
    */
  private def toSymbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  def train(words: Iterator[(String, Long)], nMerges: Int,
      minCount: Long): Iterator[BpeMerge] = {
    require(nMerges >= 1 && nMerges <= 65536, s"bad nMerges $nMerges")
    require(minCount >= 1L, s"bad minCount $minCount")
    val ws = words.toArray
    val syms: Array[Array[String]] = ws.map(w => toSymbols(w._1))
    val freq: Array[Long] = ws.map(_._2)
    val cnt = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String),
      mutable.HashSet[Int]]
    def pairsOf(i: Int): IndexedSeq[(String, String)] = {
      val s = syms(i)
      (0 until s.length - 1).map(j => (s(j), s(j + 1)))
    }
    def add(i: Int): Unit = {
      val ps = pairsOf(i)
      ps.foreach(p => cnt.update(p, cnt.getOrElse(p, 0L) + freq(i)))
      ps.distinct.foreach(p =>
        where.getOrElseUpdate(p, mutable.HashSet.empty) += i)
    }
    def remove(i: Int): Unit = {
      val ps = pairsOf(i)
      ps.foreach { p =>
        val c = cnt(p) - freq(i)
        if (c == 0L) cnt.remove(p) else cnt.update(p, c)
      }
      ps.distinct.foreach(p => where.get(p).foreach(_ -= i))
    }
    ws.indices.foreach(add)
    val out = mutable.ArrayBuffer.empty[BpeMerge]
    var r = 1L
    var stop = false
    while (r <= nMerges && !stop) {
      var bl: String = null; var br: String = null; var bc = 0L
      cnt.foreach { case ((l, rt), c) =>
        if (c >= minCount && (bl == null || c > bc || (c == bc &&
            (l < bl || (l == bl && rt < br))))) {
          bl = l; br = rt; bc = c
        }
      }
      if (bl == null) stop = true
      else {
        val merged = bl + br
        val affected = where.getOrElse((bl, br),
          mutable.HashSet.empty).toArray
        affected.foreach { i =>
          remove(i)
          // leftmost-first non-overlapping application
          val s = syms(i)
          val ns = mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == bl && s(j + 1) == br) {
              ns += merged; j += 2
            } else { ns += s(j); j += 1 }
          }
          syms(i) = ns.toArray
          add(i)
        }
        out += BpeMerge(r, bl, br, merged, bc)
        r += 1
      }
    }
    out.iterator
  }
}
