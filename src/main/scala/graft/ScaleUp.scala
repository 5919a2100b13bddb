package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver testdata: replicates an input
  * scale-factor directory `factor` times with per-replica key
  * remapping, producing a larger dataset with the same shape for
  * scale validation (the sf1 baseline VERDICT r11 asked for).
  *
  * Design constraints, in order:
  *
  *  1. **Referential integrity per replica.** Every foreign key is
  *     offset by `rep * KeyStride` in both the referencing and the
  *     referenced table, so each replica is a self-consistent TPC-H
  *     universe and every join's selectivity matches the original.
  *     `KeyStride = 10M` is > any key domain at sf0.1 (max is
  *     l_orderkey ~ 600k), so replica id = key / 10M — easy to audit.
  *  2. **No cross-replica duplicate cliques.** A naive copy makes
  *     every document 10x exactly duplicated and every embedding 10x
  *     repeated: similarity self-joins then produce O(factor^2)
  *     pairs per original pair — a synthetic quadratic cliff that a
  *     REAL 10x corpus does not have (near-dup density is roughly
  *     scale-free). So replica i > 0 gets its text tokens suffixed
  *     `_r<i>` (vocabulary shards by replica; per-replica token
  *     distribution, dup structure, and doc lengths are preserved)
  *     and its embeddings deterministically jittered (distance
  *     structure within a replica preserved to ~1e-3; cross-replica
  *     copies pushed out of near-dup range).
  *  3. **Dimension tables stay fixed** (region, nation) — exactly
  *     TPC-H's scaling rule — so broadcast-side sizes are realistic.
  *
  * Everything is expression-level and deterministic: same input →
  * byte-identical output rows (file layout aside), no RNG.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <dstDir> [factor]`
  */
object ScaleUp {

  /** Per-replica key offset; > every key domain at the source SFs. */
  val KeyStride: Long = 10_000_000L

  private def offset(col0: String, rep: Int) =
    (col(col0) + lit(rep * KeyStride)).as(col0)

  /** One replica of a table with its key columns offset. */
  private def replica(df: DataFrame, keys: Seq[String], rep: Int): DataFrame = {
    val cols = df.columns.map { c =>
      if (keys.contains(c)) offset(c, rep) else col(c)
    }
    df.select(cols.toSeq: _*)
  }

  /** Replica i > 0 of documents: keys offset AND every token suffixed
    * with a replica tag so replicas share no vocabulary (see point 2
    * above). The tag must be LETTERS ONLY ("qx" + 'a'+i): the text
    * operators normalize tokens by stripping non-letters, so a
    * digit/punct tag (`_r3`) would collapse to the same suffix for
    * every replica — making replicas 1..9 byte-identical after
    * normalization and recreating exactly the cross-replica duplicate
    * cliques the tag exists to prevent (the first sf1 cut hit this:
    * 68x ngram-jaccard at 10x data). `n_chars` is recomputed to stay
    * consistent with the new text.
    */
  private def documentsReplica(df: DataFrame, rep: Int): DataFrame = {
    val base = replica(df, Seq("doc_id"), rep)
    if (rep == 0) base
    else {
      val tag = "qx" + ('a' + rep).toChar
      base
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + tag))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
  }

  /** Replica i > 0 of embeddings: keys offset AND the vector replaced
    * by a deterministic hash-noise draw matched to the source's
    * component distribution (mean + uniform of equal variance).
    *
    * Why replace instead of jitter: the corpus vectors are near-random
    * (top neighbor cosines ~0.37, below the 0.4 near-dup threshold),
    * so REAL 10x data means 10x independent draws. Any small jitter
    * leaves cross-replica twins at cosine ~1, which hands every
    * vector ~factor near-dups and inflates all pair ops by factor^2 —
    * a synthetic quadratic cliff the first sf1 cut measured directly
    * (cosine_near_dup 27x at 10x data; fixed by this).
    */
  private def embeddingsReplica(df: DataFrame, rep: Int,
      mean: Double, std: Double): DataFrame = {
    val base = replica(df, Seq("vec_id"), rep)
    if (rep == 0) base
    else {
      // u in [0,1) from a fixed hash of (rep, vec_id, j); uniform on
      // mean +- sqrt(3)*std matches the source component variance
      val buckets = 1L << 40
      base.withColumn(
        "embedding",
        transform(
          col("embedding"),
          (_, j) => {
            val u = pmod(xxhash64(lit(rep), col("vec_id"), j), lit(buckets))
              .cast("double") / lit(buckets.toDouble)
            (lit(mean) + lit(math.sqrt(3.0) * std) * (u * 2.0 - 1.0))
              .cast("float")
          }))
    }
  }

  /** Key columns per scaled table (every column in ANY key domain —
    * primary or foreign — is offset identically). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
  )

  private val dims = Seq("region", "nation")

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      // Multiple output files -> multiple row groups, so the scaled
      // dataset scans in parallel without the single-row-group
      // autosplit crutch the driver testdata needs.
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] wrote $name x$factor")
    }

    dims.foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"), 1)
    }
    keyCols.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val scaled = (0 until factor).map(replica(df, keys, _)).reduce(_ union _)
      write(t, scaled, if (t == "lineitem") 16 else 8)
    }
    locally {
      val df = spark.read.parquet(s"$src/documents.parquet")
      write("documents",
        (0 until factor).map(documentsReplica(df, _)).reduce(_ union _), 8)
    }
    locally {
      val df = spark.read.parquet(s"$src/embeddings.parquet")
      val Array(mean, std) = df
        .select(explode(col("embedding")).as("x"))
        .agg(avg(col("x")), stddev_pop(col("x")))
        .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
      write("embeddings",
        (0 until factor).map(embeddingsReplica(df, _, mean, std))
          .reduce(_ union _), 8)
    }
    spark.stop()
  }
}
