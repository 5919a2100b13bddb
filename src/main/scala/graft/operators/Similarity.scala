package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * random-hyperplane LSH bucketed variant as the scale path, and a
  * cosine near-dup join.
  *
  * Numeric policy: every dot product is computed as a SEQUENTIAL
  * left-fold over the zipped arrays in double precision
  * (`aggregate(zip_with(...))`). Fold order is part of the operator
  * contract — it makes results bit-reproducible across partitionings
  * and engines (the DuckDB oracle folds in the same element order).
  *
  * Scale notes: brute-force is O(|Q|·N) — fine when the query set is
  * broadcastable, never for self-joins. The self-join near-dup path and
  * the ANN path both block first (LSH buckets), so the quadratic term
  * only touches bucket-mates. At 100 TB you'd additionally shard
  * vectors by bucket into partitioned storage; the plan shape here
  * (bucket key -> shuffle -> within-bucket pairs) is that layout's
  * query side.
  */
object Similarity {

  private val Dim = 64

  /** Sequential-fold double dot product — a custom codegen'd Catalyst
    * expression (graft.plans.VecDot). The equivalent
    * `aggregate(zip_with(...))` higher-order form is interpreted and
    * ~10x slower in the O(n^2) join hot paths; on null-free arrays the
    * two are bit-equal (left-to-right double accumulation). They differ
    * only on null ELEMENTS: VecDot skips them (contributes 0) while the
    * HOF fold propagates null through `acc + v` and returns NULL.
    */
  def dot(a: Column, b: Column): Column = graft.plans.VecDot(a, b)

  /** The HOF formulation, kept as the reference semantics the custom
    * expression must match (see SimilaritySpec).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Per-query top-k of a scored (query_id, vec_id, cos) relation —
    * the shared ranking contract of every search variant: rank by
    * (cos desc, vec_id) with deterministic ties, emit
    * (query_id, neighbor_id, rank, cos_sim@6dp) ordered.
    */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** A bucket key plus its full Hamming ball up to `maxFlips` bit
    * flips (multi-probe set): vectors near a hyperplane land on
    * either side, so probing adjacent sign patterns recovers most
    * lost neighbors at a fraction of brute-force cost. Generates ALL
    * sum(C(nPlanes, f)) for f <= maxFlips probe keys — tuning
    * maxFlips up monotonically widens the ball (at maxFlips = nPlanes
    * it degenerates to brute force over every bucket).
    */
  private[graft] def probeBuckets(bucket: Column, nPlanes: Int,
      maxFlips: Int = 1): Seq[Column] = {
    require(maxFlips >= 0 && maxFlips <= nPlanes,
      s"maxFlips must be in [0, $nPlanes], got $maxFlips")
    val flips = for {
      f <- 1 to maxFlips
      combo <- (0 until nPlanes).combinations(f)
    } yield combo.foldLeft(bucket)((b, j) =>
      b.bitwiseXOR(shiftleft(lit(1L), j)))
    bucket +: flips.toSeq
  }

  /** Brute-force cosine top-k: each query vector (vec_id < nQueries)
    * against the whole corpus. The query side is broadcast — the corpus
    * is scanned once, no shuffle of the big side before the per-query
    * top-k (TakeOrdered via window row_number).
    */
  def cosineTopK(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    topKPerQuery(
      emb.as("corpus")
        .join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("qv"), col("embedding"))),
      k)
  }

  /** Deterministic random hyperplanes: seeded PRNG materialized as
    * literal arrays (no runtime randomness — required for resumable /
    * reproducible runs).
    */
  private def hyperplanes(nPlanes: Int): Seq[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Seq.fill(nPlanes)(Array.fill(Dim)(rng.nextGaussian()))
  }

  /** Sign-bucket key: bit j = sign of <v, plane_j>. */
  def lshBucket(v: Column, nPlanes: Int): Column =
    hyperplanes(nPlanes).zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) >= 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k entry point — routes to the IVF index with a deeper
    * probe profile (8 of 16 cells) than `ivf_topk`'s cost-tuned 4.
    *
    * This was a hyperplane-LSH multi-probe search through round 5; it
    * measured recall@5 ≈ 0.54 while probing ~34% of the corpus on the
    * synthetic embeddings (near-isotropic — LSH's worst case: sign-bit
    * agreement barely separates neighbors from the bulk), versus 0.88
    * at 25% probed for IVF cells on the same data. An ANN op that
    * returns the true neighbor half the time is a trap for users, so
    * the published entry point now goes through the measured-best
    * index; the hyperplane machinery (`lshBucket`/`probeBuckets`)
    * remains the blocking layer of `cosineNearDupLsh`, where the
    * Hamming-ball self-join shape is the right one. The spec floor on
    * this path is recall@5 >= 0.8.
    *
    * Deliberately arity-reduced when the backend switched from
    * hyperplane LSH: the old positional params 5-6 meant (nPlanes,
    * maxFlips), and keeping the arity would let an existing positional
    * caller silently get (nCells, nProbe) semantics. Index tuning goes
    * through `Ivf.ivfTopK` directly, where the names are the contract.
    */
  def annTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5): DataFrame =
    Ivf.ivfTopK(spark, dir, nQueries, k, nCells = 16, nProbe = 8)

  /** Scale-path near-dup join: LSH-bucketed self-join. One side probes
    * its own bucket plus every ≤maxFlips bit-flip neighbor
    * (multi-probe); the other keeps its single bucket — so the
    * quadratic term only touches bucket-mates: sum(C(nPlanes, f),
    * f <= maxFlips) / 2^nPlanes of the corpus in expectation (11/16 at
    * the defaults). Approximate: recall vs `cosineNearDupExact` is
    * measured in the spec (>= 0.7 floor). The round-5 defaults
    * (maxFlips = 1, 5/16 probed) measured recall 0.52 — the same
    * half-wrong trap the hyperplane ann_topk was demoted for — so the
    * default probe ball was widened; the threshold-0.4 pairs this op
    * hunts sit at ~66 degrees, where 4 sign bits discriminate weakly,
    * and the extra probe mass is what buys the recall. The
    * oracle-checked query uses the exact variant below.
    *
    * Why the plane count is FIXED rather than scaled with log2(N)
    * (resolved design boundary, not deferred work): at the operating
    * threshold cos = 0.4 (angle 66.4 deg), a random hyperplane agrees
    * on a threshold pair with probability q1 = 1 - 66.4/180 = 0.631,
    * and on a random isotropic pair with q2 = 0.5 — an LSH exponent
    * rho = ln(q1)/ln(q2) = 0.66. The two scale-up shapes both fail on
    * the constants that rho implies:
    *
    *  - Proportional multi-probe (planes ~ log2(N), maxFlips = n/2 to
    *    hold recall): a random pair's Hamming distance is Bin(n, 1/2),
    *    which concentrates at n/2, so the n/2-ball catches ~half of
    *    ALL pairs as n grows — candidate mass converges to N^2/4, a
    *    constant-factor saving over brute force, not a scale path
    *    (and the probe-key fanout sum(C(n, f), f <= n/2) ~ 2^(n-1) is
    *    itself exponential).
    *  - Banded multi-table (Indyk-Motwani AND-OR): bands of
    *    b = log2(N) bits suppress random collisions to 1/N, but a
    *    threshold pair then collides per band with q1^b = N^-0.66, so
    *    constant recall needs ~N^0.66 tables — ~720 full hash+shuffle
    *    passes at N = 20k for recall 0.9, with the brute-force
    *    crossover far above any corpus this op would be pointed at.
    *
    * So sign-bit LSH at 66 deg is inherently a moderate-N,
    * constant-factor candidate reducer (measured here: ~11/16 of the
    * pair space probed, recall >= 0.7 spec floor); the at-scale
    * embedding-similarity paths are the IVF-cell family
    * (`semanticDedup`, `knnGraph`, `Ivf.ivfTopK`), whose cell
    * occupancy — unlike sign-bucket occupancy — is controlled by the
    * index build (sqrt(N) cells), keeping in-cell quadratic terms
    * linear overall.
    */
  def cosineNearDupLsh(spark: SparkSession, dir: String,
      threshold: Double = 0.4, nPlanes: Int = 4,
      maxFlips: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"),
        lshBucket(col("embedding"), nPlanes).as("bucket"))
    val probing = emb.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(probeBuckets(col("bucket"), nPlanes, maxFlips): _*))
        .as("bucket"))
    probing.as("a")
      .join(emb.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_id_1"),
        col("b.vec_id").as("vec_id_2"),
        round(col("cos"), 6).as("cos_sim"))
      .distinct()
      .orderBy(col("vec_id_1"), col("vec_id_2"))
  }

  /** Exact embedding-cosine near-dup join: all pairs with cosine >=
    * threshold, brute force (the correctness baseline).
    *
    * The `<` condition makes this a nested-loop join; the streamed side
    * is explicitly repartitioned because its parallelism IS the join's
    * parallelism — a small corpus arriving as one parquet split would
    * otherwise run the whole O(n^2) loop on a single core (and at
    * cluster scale, however many cores the scan happened to get).
    */
  def cosineNearDupExact(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
    emb.repartition(col("vec_id")).as("a")
      .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_id_1"),
        col("b.vec_id").as("vec_id_2"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy(col("vec_id_1"), col("vec_id_2"))
  }

  /** Semantic dedup (the SemDeDup shape, Abbas et al. 2023): bucket
    * the corpus by IVF cell, and within each cell drop every vector
    * that has a LOWER-id neighbor at cosine >= threshold — the
    * cell-bucketed scale variant of embedding near-dup removal a
    * training-data pipeline runs before sampling. Per-cluster scope is
    * the operator's semantics, not an approximation bug: cross-cell
    * pairs are deliberately out of contract (that is what makes the
    * quadratic term touch only cell-mates at 100 TB), and the cell
    * assignment comes from the shared process-level IVF index
    * (`Ivf.cachedCentroids` — built once, reused by every ANN
    * consumer). Emits the full audit table (vec_id, cell, kept), not
    * just the keep-list, so downstream sampling can weight by cluster
    * and audits can count drops per cell.
    *
    * Deterministic: the drop rule's only tie-break is vec_id order,
    * and the index build is bit-deterministic (IvfSpec). The oracle
    * recomputes the within-cell pair scan and drop rule in SQL from
    * the exported cell assignment.
    */
  def semanticDedup(spark: SparkSession, dir: String,
      threshold: Double = 0.4, nCells: Int = 16,
      iters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val indexed = emb
      .join(Ivf.assign(emb, Ivf.cachedCentroids(spark, dir, nCells, iters)),
        "vec_id")
      // both sides of the within-cell self-join read this; one cut
      .localCheckpoint()
    val dropped = indexed.as("a")
      .join(indexed.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(
        dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    indexed.select(col("vec_id"), col("cell"))
      .join(dropped.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(!col("is_dup"), lit(true)).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** Contrastive-pair mining: for each query vector, the most similar
    * SAME-label vector (the positive) and the most similar OTHER-label
    * vector (the hard negative), plus the contrastive margin — the
    * batch-construction op a metric-learning / embedding-finetune
    * pipeline runs over an embedded corpus.
    *
    * One brute-force pass against the broadcast query set (the
    * cosine_topk shape) and ONE aggregate: both argmaxes are
    * conditional max_by's over the same scored stream (rows of the
    * other class carry a NULL ordering key and are ignored by max_by),
    * so corpus scan + scoring happen exactly once. Ties break on the
    * lower vec_id via the (cos, -vec_id) ordering struct. A query
    * whose class has no second member yields NULL positive columns
    * rather than dropping the row.
    */
  def hardNegatives(spark: SparkSession, dir: String,
      nQueries: Int = 10): DataFrame = {
    // norms precomputed per ROW (the knnGraph/cosineNearDupExact
    // shape): cosine() inline would re-derive each corpus self-dot
    // once per query and each query self-dot once per corpus row —
    // 3x the multiply-adds in the O(N*Q) loop for bit-identical cos
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    val queries = emb
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
      .filter(col("query_id") < nQueries)
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        dot(col("qv"), col("embedding")) / (col("qnrm") * col("nrm")))
    def argmax(cond: Column) = max_by(
      struct(col("vec_id"), col("cos")),
      when(cond, struct(col("cos"), -col("vec_id"))))
    val agg = scored.groupBy(col("query_id"))
      .agg(argmax(col("label") === col("q_label")).as("pos"),
        argmax(col("label") =!= col("q_label")).as("neg"))
    // left join FROM the query set: a query with zero candidates (a
    // 1-vector corpus) still emits its row with NULL pos/neg, matching
    // the oracle's LEFT JOIN shape
    queries.select(col("query_id"), col("q_label").cast("long").as("q_label"))
      .join(agg, Seq("query_id"), "left")
      .select(col("query_id"), col("q_label"),
        col("pos.vec_id").as("pos_id"),
        round(col("pos.cos"), 6).as("pos_cos"),
        col("neg.vec_id").as("neg_id"),
        round(col("neg.cos"), 6).as("neg_cos"),
        round(col("pos.cos") - col("neg.cos"), 6).as("margin"))
      .orderBy(col("query_id"))
  }

  /** Per-label kNN graph: every vector's k nearest same-label
    * neighbors by cosine — the all-rows top-k similarity join (kNN
    * graphs feed clustering, label propagation, and within-class
    * near-dup audits). EXACT output, bucketed plan: candidates come
    * from IVF cells, never from a label-wide all-pairs join, and
    * exactness is restored by a branch-and-bound cell pruning that is
    * provable on ANY input — not a tuned-probe-depth bet.
    *
    * The triangle inequality for angles gives, for query q, cell
    * centroid c, and any member x of the cell,
    * θ(q,x) >= θ(q,c) − α_c where α_c = max member angle to c; cos is
    * decreasing on [0,π], so cos(q,x) <= cos(max(0, θ(q,c) − α_c)).
    * Two passes:
    *  1. score q against its OWN (label, cell) mates; the k-th best
    *     cosine τ_q lower-bounds the final k-th best;
    *  2. for every remote (label, cell), score its members only if the
    *     bound clears τ_q — a pruned cell provably contains no top-k
    *     neighbor (member cos <= bound < τ_q <= final k-th value, and
    *     strictly-worse rows can't enter the (cos desc, id) ranking).
    * A query with fewer than k own-cell mates has no τ and prunes
    * nothing — still exact.
    *
    * Cost is data-adaptive: on clustered corpora (real embedding
    * spaces) most remote cells fail the bound and the quadratic term
    * collapses to near cell-local; on the adversarial isotropic case
    * it degrades toward the all-pairs cost while STAYING exact —
    * the behavior of every exact branch-and-bound search. All joins
    * key on (label, cell); the only nested loop is the N x nCells
    * scoring against the broadcast 16-row centroid table (the
    * `ivf_topk` probe shape). At 100 TB: build the IVF index once
    * (`Ivf.buildCentroids` is the standard two-exchange Lloyd pass),
    * and the bound filter is what keeps the candidate join from
    * touching every cell pair.
    *
    * iters defaults to 0 — cells are the Voronoi regions of the first
    * nCells vectors, no Lloyd pass at all. The bound only needs a
    * FIXED reference vector per cell (θ(q,x) >= θ(q,v_c) − θ(x,v_c)
    * holds for any v_c); centroid quality affects the prune ratio,
    * never correctness, and for an index rebuilt per call the Lloyd
    * iterations cost more than the pruning they buy (measured: 4.1 s
    * -> 2.4 s at sf0.1 dropping them). A long-lived index over a real
    * clustered corpus should pass iters >= 1.
    */
  /** ceil(sqrt(N)) cells, floor 16 — the balanced IVF sizing knnGraph
    * defaults to (see the comment inside). Exposed so the bench's
    * untimed index prebuild can warm the same centroid set the query
    * will resolve to.
    */
  def autoCells(spark: SparkSession, dir: String): Int =
    math.max(16, math.ceil(math.sqrt(
      Tables.embeddings(spark, dir).count().toDouble)).toInt)

  def knnGraph(spark: SparkSession, dir: String, k: Int = 3,
      nCells: Int = 0, iters: Int = 0): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
    // Cell count: the OUTPUT is exact regardless (the bound pruning
    // below is provably safe), so the count is purely a cost knob —
    // and a FIXED count is a scale cliff: own-cell candidate pairs
    // grow as (N/cells)^2 per cell = N^2/cells total, measured 9x
    // time at the 10x scale-up. nCells <= 0 (the default) resolves to
    // ceil(sqrt(N)) (floor 16): assignment work N*cells = N^1.5 and
    // in-cell pair work N^2/cells = N^1.5 balance — the standard IVF
    // sizing. Deterministic (count-derived), so plans are stable for
    // a given corpus.
    val cells = if (nCells > 0) nCells else autoCells(spark, dir)
    // centroid index: a local relation from the process-level cache
    // (built at most once per (dir, nCells, iters) across the suite).
    // The cell-annotated corpus IS read by several branches below
    // (own-cell join sides, remote join, per-cell stats), and Spark
    // re-executes subtrees per branch — the cut materializes it once.
    val centroids = Ivf.cachedCentroids(spark, dir, cells, iters)
    val indexed = emb.join(Ivf.assign(emb, centroids), "vec_id")
      .localCheckpoint()
    // pass 1: candidates sharing the query's (label, cell)
    val own = indexed.as("a")
      .join(indexed.as("b"),
        col("a.label") === col("b.label") &&
          col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.label").as("label"),
        col("b.vec_id").as("neighbor_id"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    // τ_q = k-th best own-cell cosine: a LOWER bound on the final k-th
    // best (the final ranking is over a superset of these candidates).
    // Queries with < k own-cell mates emit no row -> null τ -> no
    // pruning for them.
    val tau = own.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col("vec_id").as("query_id"), col("cos").as("tau"))
    def clamp1(c: Column): Column = greatest(lit(-1.0), least(lit(1.0), c))
    // per-(label, cell) bounding cap: max member angle to the centroid
    val stats = indexed
      .join(broadcast(centroids), col("cell") === col("cid"))
      .groupBy(col("label"), col("cell"))
      .agg(max(acos(clamp1(cosine(col("embedding"), col("cvec")))))
        .as("alpha"))
    // pass 2: remote (label, cell)s surviving the bound. The margin
    // absorbs fp rounding in the bound so pruning never fires on a
    // float-level tie. It must cover the ACOS-AMPLIFIED error, not
    // raw double ulps: acos has condition number 1/sqrt(1-x^2), so
    // near |cos| ~ 1 the ~1e-13 dot-product rounding can grow to
    // ~1e-7 on the bound's cosine scale. 1e-6 dominates that with an
    // order of headroom, and costs nothing in pruning power (cell
    // bounds that matter clear tau by far more than 1e-6).
    val qside = indexed
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("qv"), col("nrm").as("qnrm"),
        col("cell").as("q_cell"))
      .join(tau, Seq("query_id"), "left")
    val probes = qside
      .crossJoin(broadcast(centroids))
      .filter(col("cid") =!= col("q_cell"))
      .join(broadcast(stats),
        col("label") === col("q_label") && col("cell") === col("cid"))
      .withColumn("bound",
        cos(greatest(lit(0.0),
          acos(clamp1(cosine(col("qv"), col("cvec")))) - col("alpha"))))
      .filter(col("tau").isNull || col("bound") >= col("tau") - lit(1e-6))
      .select(col("query_id"), col("q_label"), col("qv"), col("qnrm"),
        col("cell"))
    val remote = probes.as("q")
      .join(indexed.as("m"),
        col("m.label") === col("q.q_label") &&
          col("m.cell") === col("q.cell") &&
          col("m.vec_id") =!= col("q.query_id"))
      .select(col("q.query_id").as("vec_id"), col("q.q_label").as("label"),
        col("m.vec_id").as("neighbor_id"),
        (dot(col("q.qv"), col("m.embedding")) /
          (col("q.qnrm") * col("m.nrm"))).as("cos"))
    own.unionAll(remote)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("label"), col("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy(col("vec_id"), col("rank"))
  }
}
