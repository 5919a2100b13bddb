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

  /** IVF top-k: index build + nProbe-cell search for the query set. */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // The built centroid table is the index artifact — k rows. It is
    // consumed by BOTH the corpus assignment and the query probes, and
    // Spark re-executes a subtree per use, so without a cut here the
    // whole iterative Lloyd build (several shuffles per iteration) runs
    // twice. localCheckpoint materializes the k-row table once and
    // truncates the lineage — the batch analog of writing the index to
    // storage, which is what a 100 TB build would do anyway.
    val centroids = buildCentroids(emb, nCells, iters).localCheckpoint()
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
