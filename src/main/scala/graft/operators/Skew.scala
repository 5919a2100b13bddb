package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE handles moderate skew at runtime
  * (`spark.sql.adaptive.skewJoin`); these are the explicit patterns for
  * the pathological cases AQE cannot split — a single group key drawing
  * a double-digit percentage of all rows (the "the" problem in word
  * counting at 100 TB).
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on
    * (key, salt = hash(row) % saltFactor) spreading each hot key over
    * `saltFactor` reducers; phase 2 merges the partials per key. Both
    * phases are hash aggregates with map-side combine, and the merge
    * input is at most `saltFactor` rows per key — the heaviest key can
    * no longer pin a single reducer.
    *
    * `aggs` must be decomposable (sum/count/min/max): phase 1 computes
    * them per salt, phase 2 re-aggregates with the matching merge fn.
    */
  /** Row-content salt: deterministic under task retry. A salt from
    * monotonically_increasing_id (or rand) is NOT — when a lost
    * executor forces a partial map-stage re-run, re-executed tasks
    * would assign DIFFERENT salts than the lost originals while
    * already-fetched reduce partitions keep the old routing, silently
    * duplicating/dropping rows (Spark's indeterminate-stage rollback
    * covers round-robin repartition, not nondeterministic SQL shuffle
    * keys). Hashing the whole row keeps retries bit-identical;
    * identical duplicate rows share a salt, which costs nothing for
    * correctness and only concentrates skew if the hot key's rows are
    * also byte-identical duplicates.
    */
  private def contentSalt(df: DataFrame, saltFactor: Int): Column = {
    // xxhash64 rejects MapType inputs (undefined entry order) — salt
    // from the hashable columns only; identical rows on those columns
    // share a salt, which never affects correctness
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case a: org.apache.spark.sql.types.ArrayType =>
          hashable(a.elementType)
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => hashable(f.dataType))
        case _ => true
      }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toSeq
    require(cols.nonEmpty,
      "salting needs at least one non-map column to hash")
    pmod(xxhash64(cols: _*), lit(saltFactor))
  }

  def saltedCount(df: DataFrame, key: Column, saltFactor: Int,
      countName: String = "n"): DataFrame =
    df
      .withColumn("_salt", contentSalt(df, saltFactor))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("_key"))
      .agg(sum(col("_partial")).as(countName))

  /** Salted equi-join for a skewed fact against a dimension too large
    * to broadcast: each fact row gets a uniform salt in [0, saltFactor)
    * and the dimension is replicated once per salt value, so the join
    * key becomes (key, salt) and the hottest key's rows spread over
    * `saltFactor` reducers instead of pinning one. Exact same result
    * as the plain inner join at saltFactor times the dimension's
    * shuffle volume — the standard trade when one key holds a
    * double-digit share of the fact (AQE's skew split handles the
    * moderate cases first; this is the explicit escape hatch).
    *
    * Both inputs must carry the join column `key`; `_salt` never
    * escapes.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt; rename the input column")
    val salted = fact.withColumn("_salt",
      contentSalt(fact, saltFactor).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
