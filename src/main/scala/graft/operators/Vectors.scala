package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Embedding-column analytics beyond search: per-label centroids and
  * norm statistics — the health checks a vector pipeline runs after
  * every embedding job (collapsed clusters, norm drift, dead labels).
  *
  * Numeric policy: per-dimension sums go through DECIMAL so they are
  * independent of row order (a float sum in shuffle order is not
  * reproducible run-to-run, let alone across engines); each mean is a
  * single IEEE division of identical decimals, so the DuckDB oracle
  * matches exactly. The per-dimension layout (posexplode ->
  * groupBy(label, dim)) is also the 100 TB shape: it shuffles scalar
  * (label, dim, value) triples that partial-aggregate map-side,
  * instead of carrying whole vectors into an array-fold aggregate.
  */
object Vectors {

  /** Per-label: vector count, centroid L2 norm (norm of the mean
    * vector — near 0 = the label's embeddings cancel out / are
    * isotropic), and mean vector L2 norm.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)

    val norms = emb
      .select(col("label"),
        sqrt(graft.plans.VecDot(col("embedding"), col("embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("nrm").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("avg_norm"))

    val centroid = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("v").cast("decimal(20,6)")).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"),
        (col("s").cast("double") / col("n")).as("mean"))
      .select(col("label"), (col("mean") * col("mean"))
        .cast("decimal(28,16)").as("m2"))
      .groupBy(col("label"))
      .agg(round(sqrt(sum(col("m2")).cast("double")), 6).as("centroid_norm"))

    norms.join(centroid, Seq("label"))
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        col("centroid_norm"), col("avg_norm"))
      .orderBy(col("label"))
  }
}
