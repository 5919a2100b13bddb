package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a typed Aggregator: a d x w grid of long
  * counters; every input increments one cell per row (d independent
  * hash rows), and a point estimate reads the MINIMUM of its d cells —
  * an upper bound on the true count that overshoots only when all d
  * cells collide with other keys.
  *
  * The properties that matter at 100 TB:
  *  - `merge` is elementwise sum — commutative and associative, so the
  *    sketch composes map-side (each task builds a local grid, the
  *    shuffle carries d*w longs per task instead of the stream) and
  *    across corpora/days (mergeable-sketch contract, same as the HLL
  *    rollup).
  *  - the buffer is O(d*w) — 32 KB at the defaults — regardless of
  *    stream size or cardinality.
  *  - estimates are DETERMINISTIC for a fixed input multiset: counters
  *    are sums, hashes are fixed-seed XXH64 (the same function as the
  *    `xxhash64` SQL expression) — no RNG, no partition-order
  *    dependence, and point reads stay in whole-stage codegen via
  *    [[CountMinAggregator.estimateExpr]].
  */
class CountMinAggregator(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], x: String): Array[Long] = {
    // standard aggregate semantics: nulls don't count (and don't NPE —
    // the UDAF is registered generically, not only on non-null streams)
    if (x == null) return buf
    var i = 0
    while (i < d) {
      buf(i * w + CountMinAggregator.cell(x, i, w)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {
  /** Column index of `x` in hash row `row`.
    *
    * The hash is Spark's XXH64 seeded exactly like the built-in
    * `xxhash64(lit(row), x)` expression (seed 42, then the int row,
    * then the string bytes) — NOT an arbitrary JVM hash — so a point
    * estimate over a sketch column is expressible in pure codegen'd
    * expressions ([[estimateExpr]]) and provably reads the same cells
    * the aggregator wrote. floor-mod keeps the index non-negative.
    */
  def cell(x: String, row: Int, w: Int): Int = {
    val h1 = XxHash64Function.hash(row, IntegerType, 42L)
    val h2 = XxHash64Function.hash(
      UTF8String.fromString(x), StringType, h1)
    math.floorMod(h2, w.toLong).toInt
  }

  /** Point estimate: min over the d cells of `x`. Never undercounts. */
  def estimate(sketch: Seq[Long], x: String, d: Int, w: Int): Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < d) {
      m = math.min(m, sketch(i * w + cell(x, i, w)))
      i += 1
    }
    m
  }

  /** [[estimate]] as a pure Column expression: min over the d
    * `element_at` cell reads, each index the codegen'd
    * `pmod(xxhash64(row, x), w)` — bit-identical to the JVM path by
    * the [[cell]] seeding contract. Replaces the per-row Scala UDF
    * that kept sketch reads out of whole-stage codegen.
    */
  def estimateExpr(sketch: Column, x: Column, d: Int, w: Int): Column =
    least((0 until d).map { i =>
      element_at(sketch,
        (lit(i.toLong * w) + pmod(xxhash64(lit(i), x), lit(w.toLong)))
          .cast("int") + lit(1))
    }: _*)
}
