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

  /** k deterministic Lloyd iterations. Init = the first k vectors by
    * id (deterministic; at scale you'd use k-means|| with a fixed
    * seed — same plan shape).
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
      dim: Int = 0): DataFrame = {
    val d = if (dim > 0) dim
      else {
        // skip NULL/empty vectors; an empty table builds an empty
        // centroid table whatever the width, so any positive d works
        val probe = emb.select(size(col("embedding")).as("d"))
          .filter(col("d") > 0).limit(1).collect()
        if (probe.isEmpty) 1 else probe.head.getInt(0)
      }
    var centroids = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"),
        col("embedding").as("cvec"))
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
