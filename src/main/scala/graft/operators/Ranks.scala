package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed, skew-proof per-key ranking.
  *
  * `Window.partitionBy(key).orderBy(...)` parks every row of a key on
  * ONE reducer — for a per-language rank over a crawl-scale corpus
  * where one language carries most of the mass, that single task is
  * the whole job. This helper computes the exact same percent_rank
  * with no corpus-scale single-key sort anywhere, using the same
  * two-phase distributed prefix-sum machinery as
  * [[Analytics.avgRank2Kinds]] (explicit quantile splits + the
  * codegen [[graft.plans.ArrayCountLess]] bucket assignment), extended
  * with a tie-break term so it ranks (v, id) pairs, not just values.
  */
object Ranks {

  /** Exact `percent_rank() OVER (PARTITION BY kind ORDER BY v, id)`
    * without a per-kind window. Adds column `pct` (double,
    * bit-identical to the window formulation: zero-based rank and
    * kind size are exact longs, converted and divided in double the
    * same way Spark's PercentRank does) to the input rows.
    *
    * rank decomposes as two prefix sums, each balanced:
    *
    *  1. BELOW — rows of the kind with strictly smaller v: computed on
    *     the DISTINCT-(kind, v) table, so a mega-tie (the zero-filled
    *     degenerate docs all sharing v = 0) is ONE row there. Buckets
    *     come from per-kind equi-depth splits over distinct values;
    *     the only windows run per (kind) over nB bucket-count rows and
    *     per (kind, bucket) over |distinct|/nB rows.
    *  2. TIE — same-(kind, v) rows with smaller id: computed ONLY for
    *     rows in tie groups (cnt > 1; singleton groups — virtually all
    *     of a real corpus — skip the machinery entirely). Ids inside a
    *     group are sub-bucketed by one GLOBAL equi-depth id-split
    *     array (one tiny aggregate over the tie rows, broadcast), so
    *     the per-group prefix window sees at most nB cell rows and the
    *     intra-cell row_number window sees ~|group|/nB rows. The only
    *     way to re-create the single-reducer problem is an adversarial
    *     corpus where one tie group's ids also all collide into one
    *     global id bucket — ids are assigned, not data, so that is a
    *     caller bug, not a data property.
    *
    * Determinism under recomputation follows avgRank2Kinds: bucket
    * assignment is a pure function of the row and a broadcast splits
    * array, and ANY splits yield the same prefix sums, so
    * approx-percentile merge-order wobble cannot change results (no
    * sampled range exchange whose pids an offset table could go stale
    * against) — and for the same reason the double cast of `id` in the
    * tie-break sub-bucketing needs no 2^53 representability bound
    * (rounding collapse just merges buckets; exactness is unaffected).
    * Contract: `id` unique within (kind, v); `v`, `id` non-null
    * (a null v would need avgRank2Kinds' null-bucket story — callers
    * here zero-fill instead).
    */
  def percentRankByKey(df: DataFrame, kind: Column, v: Column,
      id: Column): DataFrame =
    ranked(df, kind, v, id)
      .withColumn("pct",
        when(col("_nk") > 1,
          (col("_below") + col("_tie")).cast("double") /
            (col("_nk") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .drop("_k", "_v", "_id", "_cnt", "_below", "_tie", "_nk")

  /** Exact 0-based `rank() OVER (PARTITION BY kind ORDER BY v, id)` as
    * a LONG column `as` — the integer form of [[percentRankByKey]],
    * same machinery, same contracts. On an input whose (kind, v, id)
    * rows are DISTINCT this is also the dense rank of (v, id) pairs
    * within each kind, which is what [[SuffixRanks]]'s prefix-doubling
    * rounds consume (rank-of-rank-pairs; only order and equality
    * matter, so 0-based is as good as 1-based).
    */
  def rankByKey(df: DataFrame, kind: Column, v: Column,
      id: Column, as: String): DataFrame =
    ranked(df, kind, v, id)
      .withColumn(as, col("_below") + col("_tie"))
      .drop("_k", "_v", "_id", "_cnt", "_below", "_tie", "_nk")

  private def ranked(df: DataFrame, kind: Column, v: Column,
      id: Column): DataFrame = {
    // Multi-consumer cut: the input (whose lineage may be an expensive
    // scoring pass — ccnet's is the whole perplexity computation)
    // feeds the distinct-value table and the row-level join below.
    // Without it every downstream branch re-executes that lineage.
    val in = df.withColumn("_k", kind).withColumn("_v", v)
      .withColumn("_id", id)
      .persist()
    val nB = math.max(2,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val probs = (1 until nB).map(i => i.toDouble / nB).mkString(",")

    // ---- term 1: rows with strictly smaller v, per kind ----
    val dv = in.groupBy(col("_k"), col("_v"))
      .agg(count(lit(1)).as("_cnt"))
      // feeds the splits aggregate AND the bucketed chain (the
      // avgRank2Kinds compute-dedup cut)
      .persist()
    val splits = dv.groupBy(col("_k"))
      .agg(expr(s"percentile_approx(_v, array($probs), 1000)")
        .as("_splits"))
    val bucketed = dv.join(broadcast(splits), Seq("_k"))
      .withColumn("_b", graft.plans.ArrayCountLess(col("_splits"), col("_v")))
      .drop("_splits")
    val wOff = Window.partitionBy(col("_k")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("_k"), col("_b"))
      .agg(sum(col("_cnt")).as("_ps"))
      .withColumn("_off", coalesce(sum(col("_ps")).over(wOff), lit(0L)))
      .select(col("_k"), col("_b"), col("_off"))
    val wIn = Window.partitionBy(col("_k"), col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = bucketed.join(broadcast(offsets), Seq("_k", "_b"))
      .withColumn("_below",
        col("_off") + coalesce(sum(col("_cnt")).over(wIn), lit(0L)))
      .select(col("_k"), col("_v"), col("_cnt"), col("_below"))

    // ---- term 2: same-v rows with smaller id (tie groups only) ----
    // rows feeds three consumers (solo, the id-splits aggregate, the
    // sub-bucketed tie chain) — cut once; the recompute from here is
    // one equi-join over cached inputs, not the caller's lineage.
    val rows = in.join(below, Seq("_k", "_v")).persist()
    val solo = rows.filter(col("_cnt") === 1)
      .withColumn("_tie", lit(0L))
    val tied = rows.filter(col("_cnt") > 1)
    val idSplits = tied
      .agg(expr(
        s"percentile_approx(CAST(_id AS DOUBLE), array($probs), 1000)")
        .as("_isp"))
    val tiedB = tied
      .crossJoin(broadcast(idSplits))
      .withColumn("_ib",
        graft.plans.ArrayCountLess(col("_isp"), col("_id").cast("double")))
      .drop("_isp")
    val wCell = Window.partitionBy(col("_k"), col("_v")).orderBy(col("_ib"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellOff = tiedB
      .groupBy(col("_k"), col("_v"), col("_ib"))
      .agg(count(lit(1)).as("_cc"))
      .withColumn("_coff", coalesce(sum(col("_cc")).over(wCell), lit(0L)))
      .select(col("_k"), col("_v"), col("_ib"), col("_coff"))
    val wRow = Window.partitionBy(col("_k"), col("_v"), col("_ib"))
      .orderBy(col("_id"))
    val tiedRanked = tiedB
      .join(broadcast(cellOff), Seq("_k", "_v", "_ib"))
      .withColumn("_tie", col("_coff") + row_number().over(wRow) - 1)
      .drop("_ib", "_coff")

    // ---- assemble: pct = rank0 / (n_kind - 1), Spark's own corner
    // included (a singleton kind is 0.0, not 0/0). Kind sizes come
    // from the cached distinct table, not another pass over `in`. ----
    // No |id| < 2^53 guard: the double cast of _id feeds ONLY the
    // sub-bucket assignment, and the machinery is splits-agnostic —
    // ANY bucket boundaries yield the same prefix sums, so ids that
    // round-collapse into one bucket value still rank exactly
    // (within-cell ordering is by the exact _id, not the cast). An
    // eager check here would also execute the caller's full upstream
    // lineage just to CONSTRUCT the plan; id-uniqueness within
    // (kind, v) stays the one documented caller contract.
    val nk = dv.groupBy(col("_k")).agg(sum(col("_cnt")).as("_nk"))
    solo.unionByName(tiedRanked)
      .join(broadcast(nk), Seq("_k"))
  }
}
