package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** Native Catalyst expression: how many elements of a SORTED
  * (ascending, null-free) double array are strictly less than v — the
  * lower-bound index, by binary search.
  *
  * This is the bucket-assignment step of the distributed rank
  * machinery (Analytics.avgRank2Kinds): every distinct value is placed
  * against the broadcast quantile-split array. The higher-order
  * formulation `size(filter(splits, s -> s < v))` is semantically
  * identical but interpreted (HOFs are CodegenFallback) and O(nB) per
  * row — and nB scales with the session's shuffle parallelism, so a
  * 100 TB run at 10k partitions would pay 10k interpreted lambda
  * evaluations per distinct value where this loop pays 14 compiled
  * comparisons.
  *
  * Exact drop-in semantics with the HOF (property-spec'd), which means
  * SPARK's comparison semantics, not Java's — two corners matter:
  *
  *  - NaN probe: Spark's numeric comparison is a TOTAL order with NaN
  *    greatest, so `s < NaN` is TRUE for every non-NaN split and the
  *    HOF counts the whole array (NaN lands in the top bucket, where
  *    the within-bucket `orderBy(v)` also sorts it last —
  *    bucket-monotone). A Java `<` binary search would return 0 and
  *    silently file NaN under the SMALLEST values. Special-cased.
  *  - NULL probe: the lambda yields NULL, filter drops every element,
  *    and the HOF returns bucket 0 (NOT null) — which the offsets
  *    equi-join then matches, keeping null-keyed rank groups alive.
  *    Null-PROPAGATING eval here would emit a NULL bucket and the
  *    equi-join would silently drop the row. So: null array -> null,
  *    null probe -> 0.
  */
case class ArrayCountLess(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = left.nullable

  private def isDouble: Boolean = right.dataType == DoubleType

  /** Implicit input coercion, matching the HOF this replaces: the HOF's
    * lambda comparison promoted mixed numeric operands, so SQL like
    * `array_count_less(array(0.5D), 1)` (int literal probe) must keep
    * analyzing. Element type is keyed off the RESOLVED operand types:
    * integral array + integral probe stays exact in long; anything
    * else — fractional on either side, or unresolved — promotes both
    * sides to double, exactly the lambda's `s < v` promotion.
    */
  override def inputTypes: Seq[DataType] = {
    val elem =
      if (!left.resolved || !right.resolved) DoubleType
      else (left.dataType, right.dataType) match {
        case (ArrayType(ByteType | ShortType | IntegerType | LongType, _),
              ByteType | ShortType | IntegerType | LongType) => LongType
        case _ => DoubleType
      }
    Seq(ArrayType(elem), elem)
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => true
      case (ArrayType(LongType, _), LongType) => true
      case _ => false
    }
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_count_less expects (array<double>, double) or " +
          s"(array<bigint>, bigint), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val xs = a.asInstanceOf[ArrayData]
    val b = right.eval(input)
    if (b == null) return 0
    if (isDouble) {
      val v = b.asInstanceOf[Double]
      if (java.lang.Double.isNaN(v)) return xs.numElements()
      var lo = 0
      var hi = xs.numElements()
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        // splits are null-free by contract; a NaN SPLIT sorts last in
        // Spark order and Java's `NaN < v` is false for non-NaN v, so
        // the search naturally treats it as >= v — consistent
        if (xs.getDouble(mid) < v) lo = mid + 1 else hi = mid
      }
      lo
    } else {
      val v = b.asInstanceOf[Long]
      var lo = 0
      var hi = xs.numElements()
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (xs.getLong(mid) < v) lo = mid + 1 else hi = mid
      }
      lo
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val nullSafeLeft =
      if (left.nullable) s"${leftGen.isNull}" else "false"
    val getter = if (isDouble) "getDouble" else "getLong"
    // the NaN short-circuit only exists for double probes; a long
    // probe's Spark order IS Java's order
    val nanCase =
      if (isDouble)
        s"""else if (java.lang.Double.isNaN(${rightGen.value})) {
           |    ${ev.value} = ${leftGen.value}.numElements();
           |  }""".stripMargin
      else ""
    ev.copy(code = code"""
      |${leftGen.code}
      |boolean ${ev.isNull} = $nullSafeLeft;
      |int ${ev.value} = 0;
      |if (!${ev.isNull}) {
      |  ${rightGen.code}
      |  if (${if (right.nullable) rightGen.isNull else "false"}) {
      |    ${ev.value} = 0;
      |  } $nanCase else {
      |    int $lo = 0;
      |    int $hi = ${leftGen.value}.numElements();
      |    while ($lo < $hi) {
      |      int $mid = ($lo + $hi) >>> 1;
      |      if (${leftGen.value}.$getter($mid) < ${rightGen.value}) {
      |        $lo = $mid + 1;
      |      } else {
      |        $hi = $mid;
      |      }
      |    }
      |    ${ev.value} = $lo;
      |  }
      |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCountLess =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_count_less"
}

object ArrayCountLess {
  /** Column-API entry point. */
  def apply(a: Column, v: Column): Column =
    ColumnBridge.column(
      ArrayCountLess(ColumnBridge.expression(a), ColumnBridge.expression(v)))
}
