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

  /** Top principal component of the embedding corpus by distributed
    * power iteration — the de-biasing primitive ("all-but-the-top",
    * Mu & Viswanath, ICLR 2018) an embedding pipeline applies before
    * similarity work: estimate the mean and the dominant covariance
    * direction, then subtract/project them out. Emits one row per
    * dimension: (dim, mu, loading) — the mean vector and the unit
    * top-component estimate after `iters` fixed iterations (the
    * pagerankNearDup contract: fixed-k, bit-reproducible, replayable
    * by the oracle; no convergence test).
    *
    * Matrix-free: with centered covariance C = Σ_i (x_i−μ)(x_i−μ)ᵀ,
    *
    *   C v = Σ_i d_i x_i − μ Σ_i d_i,   d_i = x_i·v − μ·v
    *
    * so one iteration is ONE scan computing per-row d_i (VecDot, the
    * codegen dot product) and ONE hash aggregate of dim+1 DECIMAL
    * sums (the buildCentroids column-battery shape) that map-side
    * combines to a single row. The driver holds only dim-sized
    * vectors between iterations — the cachedCentroids posture; at
    * 100 TB each iteration is a scan + an allreduce of `dim` doubles,
    * the textbook distributed power iteration. v0 = e1 (so v_k is
    * exactly normalize(C^k e1) — deterministic; a corpus whose top
    * eigenvector is exactly orthogonal to e1 is measure-zero and
    * would converge to the next component instead, still
    * deterministically).
    *
    * Cross-engine exactness (every step replayed by the DuckDB
    * oracle): VecDot folds left-to-right == DuckDB list_dot_product;
    * per-row terms cross decimal(28,12) sums (order-independent, so
    * also partitioning-independent); μ uses the 6dp-quantized decimal
    * sums of the labelCentroids policy; driver-side normalization
    * accumulates in index order == list_dot_product(sv, sv). A
    * degenerate corpus (all-zero vectors) yields norm 0 and keeps the
    * zero vector rather than dividing by it; an empty corpus returns
    * zero rows.
    */
  def pcaTopComponent(spark: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import spark.implicits._
    cachedPcaFit(spark, dir, iters) match {
      case None =>
        Seq.empty[(Long, Double, Double)].toDF("dim", "mu", "loading")
      case Some((mu, v)) =>
        mu.indices.map(j => (j + 1L, mu(j), v(j)))
          .toDF("dim", "mu_raw", "loading_raw")
          .select(col("dim"), round(col("mu_raw"), 6).as("mu"),
            round(col("loading_raw"), 6).as("loading"))
          .orderBy(col("dim"))
    }
  }

  /** Process-level memo of the k-component PCA fit keyed by
    * (dir, iters, k) — the cachedCentroids contract: the artifact is
    * a handful of dim-sized vectors (driver-resident by design), the
    * build is bit-deterministic, and the corpus at a path is assumed
    * immutable. All consumers (pca_top_component, abtt_debias,
    * pca_components) and the bench's untimed prewarm share builds: a
    * request for k components is served by TRUNCATING any cached fit
    * with the same (dir, iters) and k' >= k — orthogonalized power
    * iteration extracts components sequentially, so the first k of a
    * larger fit are bit-identical to a k-component fit (PcaSpec
    * asserts it) — and one k=2 build therefore serves the whole
    * family. None = empty corpus.
    */
  private val pcaCache =
    new graft.sources.StampedCache[(String, Int, Int),
      Option[(Array[Double], Seq[(Double, Array[Double])])]]()

  def cachedPcaFit(spark: SparkSession, dir: String,
      iters: Int): Option[(Array[Double], Array[Double])] =
    cachedPcaFitK(spark, dir, iters, 1).map { case (mu, comps) =>
      (mu, comps.head._2)
    }

  /** Stamp-validated ([[graft.sources.CorpusStamp]]) like the other
    * offline-artifact caches: a corpus rewrite transparently refits. */
  def cachedPcaFitK(spark: SparkSession, dir: String, iters: Int,
      k: Int): Option[(Array[Double], Seq[(Double, Array[Double])])] = {
    val stamp =
      graft.sources.CorpusStamp.of(spark, s"$dir/embeddings.parquet")
    // serve a smaller request from a larger same-stamp fit's prefix
    val prefix = pcaCache.snapshot(stamp).collectFirst {
      case ((d, it, kk), Some((mu, comps)))
        if d == dir && it == iters && kk >= k =>
          Some((mu, comps.take(k)))
    }
    prefix.getOrElse {
      pcaCache.get((dir, iters, k), stamp) { pcaFitK(spark, dir, iters, k) }
    }
  }

  /** Bench hook: force the next cachedPcaFitK call to refit. Drops
    * EVERY same-(dir, iters) entry with kk >= k, not just the exact
    * key: the prefix path above serves a k-request from any larger
    * same-stamp fit, so an exact-key invalidate would leave a servable
    * alias and the forced rebuild would silently time a cache hit. */
  private[graft] def invalidatePcaFit(dir: String, iters: Int, k: Int)
      : Unit = pcaCache.invalidateWhere {
    case (d, it, kk) => d == dir && it == iters && kk >= k
  }

  /** k-component fit by orthogonalized power iteration: component c's
    * iterate s = C v has the already-extracted components projected
    * out by classical Gram-Schmidt (s −= (v_p·s) v_p, sequentially)
    * BEFORE normalization — so later components are orthogonal to
    * earlier ones by construction, not only in the converged limit
    * (plain λ-deflation left a measured ~0.01 residual overlap at 3
    * iterations). The correction needs NO extra distributed work: a
    * driver-side subtraction of dim-sized vectors after the same
    * one-scan battery aggregate. Each component's eigenvalue is the
    * final iterate's Rayleigh estimate ‖(I−VVᵀ)C v‖ (the norm of the
    * last projected s). Returns (mu, per-component (λ, v) in order).
    * None = empty corpus.
    */
  private def pcaFitK(spark: SparkSession, dir: String, iters: Int,
      k: Int): Option[(Array[Double], Seq[(Double, Array[Double])])] = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("embedding")).filter(col("embedding").isNotNull)
    // 1-row dim probe (the Ivf.buildCentroids pattern)
    val probe = emb.select(size(col("embedding")).as("d"))
      .filter(col("d") > 0).limit(1).collect()
    if (probe.isEmpty) return None
    val dim = probe.head.getInt(0)
    def xd(j: Int) = element_at(col("embedding"), j + 1).cast("double")

    // mean pass: n + dim quantized decimal sums in one aggregate
    val muRow = emb.agg(
        count(lit(1)).as("n"),
        (0 until dim).map(j =>
          sum(xd(j).cast("decimal(20,6)")).as(s"m$j")): _*)
      .collect().head
    val n = muRow.getLong(0)
    if (n == 0) return None
    val mu = Array.tabulate(dim) { j =>
      val s = muRow.getDecimal(j + 1)
      (if (s == null) java.math.BigDecimal.ZERO else s).doubleValue / n
    }

    val comps = scala.collection.mutable.ArrayBuffer[(Double, Array[Double])]()
    (0 until k).foreach { c =>
      // v0 for component c = e_{c+1}: deterministic, and distinct per
      // component so a later component does not start parallel to an
      // earlier one's converged direction
      var v = Array.tabulate(dim)(j => if (j == c % dim) 1.0 else 0.0)
      var lastNorm = 0.0
      (1 to iters).foreach { _ =>
        // μ·v on the driver, index order (== list_dot_product)
        var mdv = 0.0
        var j = 0
        while (j < dim) { mdv += mu(j) * v(j); j += 1 }
        val vLit = array(v.toIndexedSeq.map(lit): _*)
        val scored = emb.select(
          (Similarity.dot(col("embedding"), vLit) - lit(mdv)).as("dd"),
          col("embedding"))
        val aggRow = scored.agg(
            sum(col("dd").cast("decimal(28,12)")).as("b"),
            (0 until dim).map(j =>
              sum((col("dd") * xd(j)).cast("decimal(28,12)")).as(s"a$j")): _*)
          .collect().head
        def dec(i: Int): Double = {
          val d = aggRow.getDecimal(i)
          (if (d == null) java.math.BigDecimal.ZERO else d).doubleValue
        }
        val b = dec(0)
        val s = Array.tabulate(dim)(j => dec(j + 1) - mu(j) * b)
        // classical Gram-Schmidt against the extracted components:
        // each projection uses the CURRENT s (after the previous
        // subtraction), dot accumulated in index order
        comps.foreach { case (_, vp) =>
          var dvp = 0.0
          j = 0
          while (j < dim) { dvp += vp(j) * s(j); j += 1 }
          j = 0
          while (j < dim) { s(j) = s(j) - dvp * vp(j); j += 1 }
        }
        var ss = 0.0
        j = 0
        while (j < dim) { ss += s(j) * s(j); j += 1 }
        val norm = math.sqrt(ss)
        lastNorm = norm
        v = if (norm == 0) s else s.map(_ / norm)
      }
      comps += ((lastNorm, v))
    }
    Some((mu, comps.toSeq))
  }

  /** Top-k principal components (k=2 shipped): the full ABTT recipe
    * removes the top FEW components, not one — this emits them with
    * their Rayleigh eigenvalue estimates. One row per (component,
    * dim); loadings and eigenvalues share pcaTopComponent's numeric
    * contract, so the DuckDB oracle replays both components exactly
    * (the deflation terms are pure scalar/list arithmetic in the
    * final CTEs).
    */
  def pcaComponents(spark: SparkSession, dir: String, k: Int = 2,
      iters: Int = 3): DataFrame = {
    import spark.implicits._
    cachedPcaFitK(spark, dir, iters, k) match {
      case None =>
        Seq.empty[(Long, Long, Double, Double)]
          .toDF("component", "dim", "eigenvalue", "loading")
      case Some((_, comps)) =>
        comps.zipWithIndex.flatMap { case ((lam, v), c) =>
          v.indices.map(j => ((c + 1).toLong, (j + 1).toLong, lam, v(j)))
        }.toDF("component", "dim", "ev_raw", "loading_raw")
          .select(col("component"), col("dim"),
            round(col("ev_raw"), 6).as("eigenvalue"),
            round(col("loading_raw"), 6).as("loading"))
          .orderBy(col("component"), col("dim"))
    }
  }

  /** All-but-the-top de-biasing applied per vector: with the corpus
    * mean μ and top component v from the shared PCA fit, emit each
    * vector's signed projection onto v after centering and the L2 norm
    * of what remains once that component is removed:
    *
    *   proj  = x·v − μ·v
    *   resid = sqrt(max(0, x·x − 2 x·μ + μ·μ − proj²))
    *
    * — the audit table of a de-biasing pass (how much of each vector
    * the dominant direction explains) and, with proj zeroed, the ABTT
    * transform itself. Pure per-row projection against two broadcast
    * dim-vectors: no shuffle until the output sort, embeddings never
    * leave their input partition — at 100 TB this runs at scan speed
    * (the vecQuantize posture). The residual uses the expanded
    * ||x−μ||² form so every term is a VecDot/list_dot_product
    * left-to-right fold the oracle reproduces bit-for-bit; the
    * max(,0) clamp absorbs the one case where cancellation could go
    * epsilon-negative (a vector exactly on the component line).
    * Rows with a NULL embedding carry no projection and are dropped.
    */
  def abttDebias(spark: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import spark.implicits._
    cachedPcaFit(spark, dir, iters) match {
      case None =>
        Seq.empty[(Long, Double, Double)].toDF("vec_id", "proj", "resid_norm")
      case Some((mu, v)) =>
        var mdv = 0.0
        var mdm = 0.0
        var j = 0
        while (j < mu.length) {
          mdv += mu(j) * v(j); mdm += mu(j) * mu(j); j += 1
        }
        val vLit = array(v.toIndexedSeq.map(lit): _*)
        val muLit = array(mu.toIndexedSeq.map(lit): _*)
        val x = col("embedding")
        Tables.embeddings(spark, dir)
          .filter(x.isNotNull)
          .select(col("vec_id"),
            (Similarity.dot(x, vLit) - lit(mdv)).as("proj_raw"),
            (Similarity.dot(x, x) - lit(2.0) * Similarity.dot(x, muLit) +
              lit(mdm)).as("cnorm2"))
          .select(col("vec_id"), round(col("proj_raw"), 6).as("proj"),
            round(sqrt(greatest(
              col("cnorm2") - col("proj_raw") * col("proj_raw"),
              lit(0.0))), 6).as("resid_norm"))
          .orderBy(col("vec_id"))
    }
  }
}
