package graft.functions

import org.apache.spark.sql.SparkSession
import graft.plans.{ArrayCountLess, VecDot}

/** SQL registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column
  * API. Idempotent per session.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => {
        require(exprs.length == 2,
          s"vec_dot requires exactly 2 arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      },
      "built-in")
    // sorted-array lower bound (the rank machinery's bucket step) —
    // `size(filter(xs, s -> s < v))` at O(log n) compiled instead of
    // O(n) interpreted
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_count_less",
      exprs => {
        require(exprs.length == 2,
          s"array_count_less requires exactly 2 arguments, got ${exprs.length}")
        ArrayCountLess(exprs(0), exprs(1))
      },
      "built-in")
    // cosine composed from the same codegen primitive — expanded at
    // parse time, so the optimizer sees three VecDots it can CSE
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine",
      exprs => {
        require(exprs.length == 2,
          s"vec_cosine requires exactly 2 arguments, got ${exprs.length}")
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (exprs(0), exprs(1))
        Divide(VecDot(a, b),
          Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b))))
      },
      "built-in")
  }
}
