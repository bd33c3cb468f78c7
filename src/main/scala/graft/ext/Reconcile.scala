package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table reconciliation — "what changed between two versions of a
  * table": row-level added/removed/changed/unchanged status off a
  * primary key, and per-column drift counts. The audit step a pipeline
  * runs after re-ingesting a source, before re-training on it.
  *
  * Scale design (100 TB lens):
  *  - the STATUS pass joins (pk, row_hash) ONLY — two narrow columns
  *    per side regardless of table width; the md5 row hash
  *    short-circuits the wide compare, so "mostly unchanged" (the
  *    common case) costs one narrow co-partitioned join + one bounded
  *    agg (≤4 output rows);
  *  - the COLUMN-DRIFT pass carries values but aggregates only rows
  *    whose hashes differ (the changed set, typically a tiny fraction)
  *    — a single hash-agg of boolean sums, one output row per column,
  *    unpivoted with `stack` (no shuffle beyond the join's);
  *  - both joins are plain pk equi-joins: they co-locate under
  *    bucketing ([[graft.sources.Bucketing]]) and AQE handles the
  *    small-side broadcast when one version is a delta.
  *
  * Hashing is engine-portable: md5 over U+0001-joined string casts with
  * a U+0002 null sentinel, so a DuckDB oracle derives identical
  * statuses (and the oracle's IS DISTINCT FROM formulation agrees with
  * the hash short-circuit up to md5 collisions).
  */
object Reconcile {

  /** Portable row digest over `cols`: null-safe, order-sensitive. */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))

  /** Row-level diff status. Output: pk cols ++ (status: string in
    * added | removed | changed | unchanged). Only (pk, hash) cross the
    * join — call sites wanting values join back by pk on the (small)
    * non-unchanged slice.
    */
  def tableDiff(
      oldDf: DataFrame, newDf: DataFrame,
      pk: Seq[String], compare: Seq[String]): DataFrame = {
    val o = oldDf.select(pk.map(col) :+
      rowHash(compare.map(col)).as("__oh"): _*)
    val n = newDf.select(pk.map(c => col(c).as(s"__n_$c")) :+
      rowHash(compare.map(col)).as("__nh"): _*)
    val cond = pk.map(c => col(c) === col(s"__n_$c")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .select(
        pk.map(c => coalesce(col(c), col(s"__n_$c")).as(c)) :+
          when(col("__nh").isNull, lit("removed"))
            .when(col("__oh").isNull, lit("added"))
            .when(col("__oh") =!= col("__nh"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** Status cardinalities — the one-line reconciliation report. */
  def diffCounts(
      oldDf: DataFrame, newDf: DataFrame,
      pk: Seq[String], compare: Seq[String]): DataFrame =
    tableDiff(oldDf, newDf, pk, compare)
      .groupBy(col("status")).agg(count(lit(1)).as("n_rows"))

  /** Per-column drift: for each compared column, how many pk-matched
    * rows changed IN THAT COLUMN. The wide value compare runs only on
    * rows the hash already marked changed. Output: (column_name,
    * n_changed), one row per compared column.
    */
  def columnDrift(
      oldDf: DataFrame, newDf: DataFrame,
      pk: Seq[String], compare: Seq[String]): DataFrame = {
    val o = oldDf.select(pk.map(col) ++ compare.map(c =>
      col(c).as(s"__o_$c")) :+
      rowHash(compare.map(col)).as("__oh"): _*)
    val n = newDf.select(pk.map(c => col(c).as(s"__n_$c")) ++
      compare.map(c => col(c).as(s"__n_v_$c")) :+
      rowHash(compare.map(col)).as("__nh"): _*)
    val cond = pk.map(c => col(c) === col(s"__n_$c")).reduce(_ && _)
    val changed = o.join(n, cond, "inner")
      .filter(col("__oh") =!= col("__nh"))
    val sums = changed.agg(
      count(lit(1)).as("__n"),
      compare.map(c => sum((!(col(s"__o_$c") <=> col(s"__n_v_$c")))
        .cast("long")).as(s"__d_$c")): _*)
    // unpivot the single agg row to (column_name, n_changed); stack is
    // a pure projection — no extra shuffle, and coalesce(0) covers the
    // zero-changed-rows case where the sums come back null
    val stackExpr = compare.map(c =>
      s"'$c', coalesce(__d_$c, 0L)").mkString(", ")
    sums.selectExpr(
      s"stack(${compare.size}, $stackExpr) AS (column_name, n_changed)")
  }

  /** Population stability index between two snapshots of a numeric
    * column, over the same fixed-width bins as [[Profile.histogram]]:
    * per bin, both counts and the PSI term (p−q)·ln(p/q) with shares
    * floored at `eps` so empty bins contribute a finite penalty (the
    * standard smoothing). Σ terms ≥ 0.2 is the conventional "shifted"
    * alarm. Two histogram aggregates (bins-bounded), a full-outer join
    * of two ≤`bins`-row frames, totals folded from the joined frame
    * under a scoped cache — input scanned ONCE per side at any scale.
    * Float ops (shares, ln) run on exact integer inputs, so terms are
    * engine-portable under the same platform-libm caveat as the
    * entropy scores.
    */
  def psi(oldDf: DataFrame, newDf: DataFrame, c: String,
      lo: Double, hi: Double, bins: Int,
      eps: Double = 1e-6): DataFrame = {
    val ho = graft.ext.Profile.histogram(oldDf, c, lo, hi, bins)
      .select(col("bin"), col("cnt").as("n_old"))
    val hn = graft.ext.Profile.histogram(newDf, c, lo, hi, bins)
      .select(col("bin").as("__graft_bin_n"), col("cnt").as("n_new"))
    val joined = ho.join(hn, col("bin") === col("__graft_bin_n"),
        "full_outer")
      .select(
        coalesce(col("bin"), col("__graft_bin_n")).as("bin"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    graft.ext.CacheScope.withCached(joined) { j =>
      val totals = broadcast(j.agg(
        sum(col("n_old")).as("__graft_to"),
        sum(col("n_new")).as("__graft_tn")))
      val p = greatest(
        col("n_old").cast("double") / col("__graft_to").cast("double"),
        lit(eps))
      val q = greatest(
        col("n_new").cast("double") / col("__graft_tn").cast("double"),
        lit(eps))
      j.crossJoin(totals)
        .select(col("bin"), col("n_old"), col("n_new"),
          ((p - q) * log(p / q)).as("psi_term"))
    }
  }

  /** Embedding-distribution drift between a reference and a current
    * vector corpus (the vector twin of [[columnDrift]]): centroid
    * cosine and the L2 norm of the mean-vector shift — the two
    * numbers a retraining monitor alarms on when an upstream encoder
    * or data mix changes.
    *
    * Determinism: per-dim vector components are snapped to `scale`
    * fixed point (floor(x·scale) — exact float→int), per-dim sums are
    * EXACT decimal(38,0), and the identities
    *
    *   cos(x̄_r, x̄_c) = cos(S_r, S_c)      (cosine ignores 1/n scaling)
    *   ‖x̄_r − x̄_c‖ = √Σ_d(S_r·n_c − S_c·n_r)² / (n_r·n_c·scale)
    *
    * reduce everything to exact integer cross-moments with a
    * correctly-rounded double finish — no per-row float sum anywhere,
    * so the statistic hash-matches across engines and reruns.
    *
    * Scale design: one posexplode scan per side → a ≤dims-row
    * aggregate each; the cross-moment fold runs on dims rows. Vector
    * corpora of any size reduce to 2·dims metadata rows before any
    * join. Assumes fixed dimensionality per corpus (enforce upstream
    * with a len() filter, as the similarity family does). Overflow
    * headroom: (S·n)² must fit decimal(38), i.e. corpus size
    * n ≲ 10¹⁹ ⁄ ²/√scale ≈ 3·10⁶ at the default scale — above that,
    * shard the corpora and fold the per-shard dim sums first (the
    * shape is mergeable), or drop `scale` a few decades.
    */
  def embeddingDrift(ref: DataFrame, cur: DataFrame, vecCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"need scale > 0, got $scale")
    def dimSums(df: DataFrame, s: String, n: String): DataFrame =
      df.select(posexplode(col(vecCol)).as(Seq("__d", "__v")))
        .select(col("__d"),
          floor(col("__v").cast("double") * scale).cast("long")
            .as("__c"))
        .groupBy("__d")
        .agg(sum(col("__c").cast("decimal(38,0)")).as(s),
          count(lit(1)).as(n))
    val r = dimSums(ref, "__sr", "__nr")
    val c = dimSums(cur, "__sc", "__nc")
    def d(cn: Column) = cn.cast("double")
    val dec = (cn: Column) => cn.cast("decimal(38,0)")
    r.join(c, "__d")
      .agg(first(col("__nr")).as("__fnr"), first(col("__nc")).as("__fnc"),
        count(lit(1)).as("dims"),
        sum(dec(col("__sr")) * dec(col("__sc"))).as("__rc"),
        sum(dec(col("__sr")) * dec(col("__sr"))).as("__rr"),
        sum(dec(col("__sc")) * dec(col("__sc"))).as("__cc"),
        sum((dec(col("__sr")) * dec(col("__nc")) -
          dec(col("__sc")) * dec(col("__nr"))) *
          (dec(col("__sr")) * dec(col("__nc")) -
            dec(col("__sc")) * dec(col("__nr")))).as("__sh"))
      .select(col("__fnr").as("n_ref"), col("__fnc").as("n_cur"),
        col("dims"),
        when(col("__rr") > 0 && col("__cc") > 0,
          d(col("__rc")) / (sqrt(d(col("__rr"))) * sqrt(d(col("__cc")))))
          .as("centroid_cos"),
        (sqrt(d(col("__sh"))) /
          (d(col("__fnr")) * d(col("__fnc")) * scale.toDouble))
          .as("mean_shift_l2"))
  }
}
