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

  /** Symmetric int8 scalar quantization of the embedding column — the
    * 4x-compression step a vector store applies before indexing:
    *
    *   scale = max(|v_i|) / 127,   q_i = round(v_i / scale)
    *
    * Per vector, emits the scale, a checksum of the quantized codes
    * (sum — order-free, exact integers) and the max absolute
    * reconstruction error. Pure per-row projection: no shuffle until
    * the output sort, embeddings never leave their input partition —
    * at 100 TB this runs at scan speed and the narrow (id, 3 scalars)
    * result is all that moves. All arithmetic is IEEE double widened
    * from the float input, identically reproducible in the oracle.
    * Zero vectors (scale 0) quantize to all-zero codes with zero error
    * rather than dividing by zero.
    */
  def vecQuantize(spark: SparkSession, dir: String): DataFrame =
    // the working column is named scale_RAW, distinct from the rounded
    // output alias "scale": lateral column alias resolution would
    // otherwise bind same-select references to the freshly aliased
    // (rounded) value and quantize against the wrong step size
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        (aggregate(col("embedding"), lit(0.0d),
          (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0d)
          .as("scale_raw"),
        col("embedding"))
      .select(col("vec_id"), round(col("scale_raw"), 9).as("scale"),
        when(col("scale_raw") === 0d, lit(0L)).otherwise(
          aggregate(col("embedding"), lit(0L),
            (acc, x) => acc + round(x.cast("double") / col("scale_raw"), 0)
              .cast("long"))).as("q_sum"),
        when(col("scale_raw") === 0d, lit(0.0d)).otherwise(
          aggregate(col("embedding"), lit(0.0d),
            (acc, x) => greatest(acc,
              abs(x.cast("double") -
                round(x.cast("double") / col("scale_raw"), 0) * col("scale_raw")))))
          .as("max_err"))
      .select(col("vec_id"), col("scale"), col("q_sum"),
        round(col("max_err"), 9).as("max_err"))
      .orderBy(col("vec_id"))
}
