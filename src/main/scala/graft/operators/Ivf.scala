package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Similarity.{cosine, topKPerQuery}

/** IVF (inverted-file) ANN: partition the vector space by a small set
  * of centroids (Lloyd iterations, all DataFrame ops), store each
  * vector under its nearest centroid, probe only the nProbe closest
  * cells at query time. The centroid table is tiny and broadcast; the
  * corpus is touched once per build pass and once per query.
  *
  * Determinism: centroid updates average per-dimension with DECIMAL
  * sums (order-independent), and assignment argmin breaks ties on
  * centroid id — so the index build is bit-identical under any
  * partitioning, unlike a naive double-mean k-means.
  *
  * At 100 TB the build is the standard two-phase k-means (assign =
  * broadcast join + argmin, update = one hash agg over (cluster, dim));
  * the probe is an equi-join on cell id. Nothing here is driver-bound
  * except the k x dim centroid table itself.
  */
object Ivf {

  /** Process-level memo of built centroid tables keyed by (corpus dir,
    * nCells, iters) — "build the index once" across every consumer in
    * one process (ivf_topk, ann_topk, knn_graph, the oracleAux
    * exports), instead of re-running the Lloyd build per call. The
    * cached value is the k x dim floats THEMSELVES (a centroid table
    * is k rows by construction — driver-resident by design, like the
    * broadcast it feeds), so re-materialization is a local-relation
    * createDataFrame: it survives `Cleanup.dropPersisted`, needs no
    * checkpoint blocks, and never replays lineage. The build is
    * bit-deterministic (IvfSpec), so cache-hit vs rebuild cannot
    * change any result. The 100 TB analog is the persisted index file
    * a deployment builds once and every query job reads — that path
    * is `ivfTopK(prebuilt = ...)`, spec-gated via a parquet
    * round-trip.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
      Seq[(Int, Seq[Float])]]()

  /** Assumes an immutable corpus at a given path (the Tables footer
    * cache contract): rewriting embeddings in-place at a cached path
    * in-process would serve stale centroids.
    */
  def cachedCentroids(spark: SparkSession, dir: String, nCells: Int,
      iters: Int): DataFrame = {
    val key = (dir, nCells, iters)
    val rows = Option(centroidCache.get(key)).getOrElse {
      val built = buildCentroids(Tables.embeddings(spark, dir), nCells, iters)
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1)))
        .toSeq
      centroidCache.put(key, built)
      built
    }
    import spark.implicits._
    rows.toDF("cid", "cvec")
  }

  /** Nearest-centroid assignment: broadcast the centroid array table,
    * score each (vector, centroid) pair, keep the argmin by (dist,
    * centroid id). Returns (vec_id, cell).
    *
    * The argmin is a min_by hash aggregate over NARROW rows (vec_id,
    * cid, d) — the previous row_number window sorted the k-way fanout
    * with the full embedding and centroid arrays riding through the
    * exchange. Same deterministic (dist, cid) tie-break, map-side
    * combined to one row per vector before the shuffle.
    */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cid"),
        (-cosine(col("embedding"), col("cvec"))).as("d"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("cell"))

  /** Driver-side cosine distance for the tiny candidate reduction —
    * candidates are O(k log n) rows, never data-sized. */
  private def localCosDist(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** k-means||-style scalable init (Bahmani et al., "Scalable
    * k-means++", VLDB'12), made fully deterministic: the per-point
    * coin flip is a fixed xxhash64 of (round, vec_id) mapped to
    * [0, 1), so the sample — and therefore the whole init — is
    * bit-identical under any partitioning, task order, or cluster
    * size (the determinism contract every graft build step carries).
    *
    * Why not first-k-by-id: the first k vectors say nothing about the
    * data's geometry — adjacent ids are often near-identical (the
    * driver testdata's replicated doc embeddings, any corpus sorted
    * by ingest time), which seeds duplicate centroids and leaves
    * whole regions probed by no cell. k-means|| seeds proportionally
    * to residual cost, the same guarantee k-means++ gives, in
    * O(rounds) scans instead of k sequential ones.
    *
    * Shape per round (all corpus passes are DataFrame ops):
    *   1. distance-to-candidate-set: one broadcast crossJoin + a
    *      map-side-combined min aggregate (narrow (vec_id, d) rows);
    *   2. one scalar cost aggregate (phi);
    *   3. an independent coin per point: sample iff
    *      u(round, vec_id) < l * d(x) / phi, l = overFactor * k.
    * Expected l candidates per round — the candidate table stays
    * k-sized, broadcastable, and the collect()s here are all
    * candidate-sized or scalar (same driver-residency argument as
    * the centroid table itself).
    *
    * The ~l*rounds weighted candidates reduce to exactly
    * min(k, corpus) driver-side by greedy weighted farthest-first
    * (max w(c) * dist-to-chosen, ties toward smaller id) — the
    * deterministic variant of the weighted k-means++ reclustering
    * the paper prescribes. If sampling under-fills (degenerate
    * corpora: all points identical -> phi = 0 after round one), the
    * remainder tops up from the smallest unchosen vec_ids, so the
    * contract "exactly min(k, n) centroids" always holds.
    */
  def scalableInitCentroids(emb: DataFrame, k: Int,
      rounds: Int = 4, overFactor: Int = 2): Seq[(Int, Seq[Float])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.filter(size(col("embedding")) > 0)
      .select(col("vec_id"), col("embedding"))
    val seed = vecs.orderBy(col("vec_id")).limit(1)
      .as[(Long, Seq[Float])].collect()
    if (seed.isEmpty) return Seq.empty
    val l = math.max(1, overFactor * k)
    var cands = scala.collection.mutable.LinkedHashMap(
      seed.head._1 -> seed.head._2)
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val candDf = broadcast(
        cands.toSeq.map(_._2).toDF("cvec"))
      val dists = vecs.crossJoin(candDf)
        .select(col("vec_id"), col("embedding"),
          (lit(1.0) - cosine(col("embedding"), col("cvec"))).as("dc"))
        .groupBy(col("vec_id"))
        .agg(min(col("dc")).as("d"), first(col("embedding")).as("embedding"))
      val phi = dists.agg(sum(col("d"))).as[Option[Double]].head().getOrElse(0.0)
      if (phi <= 0) exhausted = true // every point IS a candidate
      else {
        // u in [0,1): 2^40 buckets of a fixed-seed hash — far below
        // any meaningful sampling-probability resolution
        val buckets = 1L << 40
        val u = pmod(xxhash64(lit(round), col("vec_id")), lit(buckets))
          .cast("double") / lit(buckets.toDouble)
        val picked = dists
          .filter(u < least(lit(1.0), lit(l.toDouble) * col("d") / lit(phi)))
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Seq[Float])].collect()
        // collect() row order varies with partitioning; candidate
        // ORDER feeds the greedy reduction, so pin it by id
        picked.sortBy(_._1).foreach { case (id, v) =>
          if (!cands.contains(id)) cands += id -> v
        }
      }
      round += 1
    }
    // weights: corpus points per nearest candidate (ties toward the
    // smaller candidate POSITION, matching assign()'s cid tie-break)
    val ordered = cands.toVector
    val posDf = broadcast(ordered.zipWithIndex
      .map { case ((_, v), i) => (i, v) }.toDF("pos", "cvec"))
    val weights = vecs.crossJoin(posDf)
      .select(col("vec_id"), col("pos"),
        (lit(1.0) - cosine(col("embedding"), col("cvec"))).as("dc"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("pos"), struct(col("dc"), col("pos"))).as("pos"))
      .groupBy(col("pos")).agg(count(lit(1)).as("w"))
      .as[(Int, Long)].collect().toMap
    // greedy weighted farthest-first down to k
    val target = math.min(k, ordered.size)
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Seq[Float])]()
    val remaining = scala.collection.mutable.ArrayBuffer(
      ordered.zipWithIndex.map { case ((id, v), i) =>
        (id, v, weights.getOrElse(i, 0L)) }: _*)
    val first0 = remaining.zipWithIndex
      .minBy { case ((id, _, w), _) => (-w, id) }._2
    chosen += ((remaining(first0)._1, remaining(first0)._2))
    remaining.remove(first0)
    while (chosen.size < target && remaining.nonEmpty) {
      val next = remaining.zipWithIndex.minBy { case ((id, v, w), _) =>
        val d = chosen.iterator.map(c => localCosDist(v, c._2)).min
        (-(w.toDouble * d), id)
      }._2
      chosen += ((remaining(next)._1, remaining(next)._2))
      remaining.remove(next)
    }
    // degenerate top-up: smallest unchosen ids until min(k, n)
    if (chosen.size < k) {
      val have = chosen.map(_._1).toSet
      val extra = vecs.filter(!col("vec_id").isin(have.toSeq: _*))
        .orderBy(col("vec_id")).limit(k - chosen.size)
        .as[(Long, Seq[Float])].collect()
      chosen ++= extra
    }
    // weighted Lloyd refinement over the candidate set (the paper's
    // "recluster the weighted candidates" step): candidates with
    // their corpus weights stand in for the data distribution, so a
    // few driver-side iterations move the k greedy picks to the
    // weighted candidate centroid — all O(|cands| * k) per round on
    // candidate-sized arrays, deterministic (ties toward the smaller
    // center index), no corpus pass
    val wcands = ordered.zipWithIndex
      .map { case ((_, v), i) => (v, weights.getOrElse(i, 0L).toDouble) }
    var centers = chosen.toVector.map(_._2)
    var moved = true
    var refineIt = 0
    while (moved && refineIt < 20) {
      val sums = Array.fill(centers.size)(
        new Array[Double](centers.head.length))
      val wsum = new Array[Double](centers.size)
      wcands.foreach { case (v, w) =>
        if (w > 0) {
          var best = 0; var bestD = Double.MaxValue
          var i = 0
          while (i < centers.size) {
            val d0 = localCosDist(v, centers(i))
            if (d0 < bestD) { bestD = d0; best = i }
            i += 1
          }
          var j = 0
          while (j < v.length) { sums(best)(j) += w * v(j); j += 1 }
          wsum(best) += w
        }
      }
      val next = centers.indices.map { i =>
        if (wsum(i) == 0) centers(i) // empty center keeps its seed
        else sums(i).map(s => (s / wsum(i)).toFloat).toSeq
      }.toVector
      moved = next != centers
      centers = next
      refineIt += 1
    }
    centers.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** k deterministic Lloyd iterations. Init = k-means|| with a fixed
    * hash-seed ([[scalableInitCentroids]]); `init = "first-k"` keeps
    * the first-k-vectors-by-id seeding (the pre-r12 behavior, still
    * useful as the comparison arm in specs).
    *
    * Each iteration is exactly TWO exchanges: the assignment argmin
    * (carrying the vector through as a first() — constant per group)
    * and one wide aggregate of `dim` per-dimension DECIMAL sums keyed
    * on the cell (the simhash trick: a fixed-width column battery
    * map-side combines to one row per cell, where the posexplode
    * formulation shuffled corpus x dim narrow rows and needed a second
    * aggregate to re-assemble arrays). Means stay decimal-sum /
    * count — order-independent, bit-identical to the per-dim layout.
    *
    * `dim` <= 0 (the default) derives the dimensionality from the
    * first vector — one 1-row lookup at build time. A WRONG explicit
    * dim would silently truncate (element_at past the end is NULL and
    * VecDot skips mismatched tails), so auto-derive unless the caller
    * knows better.
    */
  def buildCentroids(emb: DataFrame, k: Int, iters: Int,
      dim: Int = 0, init: String = "scalable"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d = if (dim > 0) dim
      else {
        // skip NULL/empty vectors; an empty table builds an empty
        // centroid table whatever the width, so any positive d works
        val probe = emb.select(size(col("embedding")).as("d"))
          .filter(col("d") > 0).limit(1).collect()
        if (probe.isEmpty) 1 else probe.head.getInt(0)
      }
    var centroids = init match {
      case "first-k" =>
        emb.filter(col("vec_id") < k)
          .select(col("vec_id").cast("int").as("cid"),
            col("embedding").as("cvec"))
      case _ =>
        scalableInitCentroids(emb, k).toDF("cid", "cvec")
    }
    val sums = (0 until d).map(i =>
      sum(element_at(col("embedding"), i + 1).cast("decimal(28,12)"))
        .as(s"s$i"))
    (1 to iters).foreach { _ =>
      val assigned = emb
        .crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("embedding"), col("cid"),
          (-cosine(col("embedding"), col("cvec"))).as("d"))
        .groupBy(col("vec_id"))
        .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("cell"),
          first(col("embedding")).as("embedding"))
      centroids = assigned
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cell").as("cid"),
          array((0 until d).map(i =>
            (col(s"s$i") / col("n")).cast("float")): _*).as("cvec"))
    }
    centroids
  }

  /** IVF top-k: nProbe-cell search for the query set over a centroid
    * index that is built at most once per process (`cachedCentroids`)
    * — or not at all when the caller passes a persisted index via
    * `prebuilt` (schema (cid int, cvec array<float>), e.g. read back
    * from parquet; see IvfSpec). Parity with `Pq.pqTopK`'s prebuilt
    * path: the 100 TB deployment builds the index once, writes it,
    * and every query job starts here.
    */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2, prebuilt: Option[DataFrame] = None): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // The centroid table is the index artifact — k rows, consumed by
    // BOTH the corpus assignment and the query probes. cachedCentroids
    // hands back a local relation (no lineage to re-execute, nothing
    // persisted), so no checkpoint cut is needed here.
    val centroids = prebuilt.getOrElse(
      cachedCentroids(spark, dir, nCells, iters))
    val cells = assign(emb, centroids)
    val indexed = emb.join(cells, "vec_id")

    // each query probes its nProbe nearest cells
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("qd"), col("cid"))
    val probes = queries
      .crossJoin(broadcast(centroids))
      .withColumn("qd", -cosine(col("qv"), col("cvec")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))

    topKPerQuery(
      indexed
        .join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("qv"), col("embedding"))),
      k)
  }
}
