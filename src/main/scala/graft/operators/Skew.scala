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
  def saltedCount(df: DataFrame, key: Column, saltFactor: Int,
      countName: String = "n"): DataFrame =
    df
      .withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("_key"))
      .agg(sum(col("_partial")).as(countName))
}
