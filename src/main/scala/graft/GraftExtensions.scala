package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.{ArrayCountLess, RewriteSelfDotProduct, VecDot}

/** Library integration point: sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions`) get graft's native expressions in their
  * function registry without any imperative `register` call — the way
  * a deployed cluster ships the library to every user session via one
  * line of cluster config. `GraftFunctions.register` remains for
  * sessions that already exist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[VecDot].getName, null, "vec_dot",
        "vec_dot(a, b) - left-to-right double dot product of two numeric arrays",
        ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"vec_dot requires exactly 2 arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("array_count_less"),
      new ExpressionInfo(
        classOf[ArrayCountLess].getName, null, "array_count_less",
        "array_count_less(sorted_xs, v) - elements of a sorted array " +
          "strictly below v (lower-bound index, binary search)",
        ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"array_count_less requires exactly 2 arguments, got ${exprs.length}")
        ArrayCountLess(exprs(0), exprs(1))
      }))
    ext.injectOptimizerRule(_ => RewriteSelfDotProduct)
    // whole-operator extension: plans graft.plans.AsOfJoinPlan as the
    // co-partitioned single-pass merge (AsOfMergeJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
