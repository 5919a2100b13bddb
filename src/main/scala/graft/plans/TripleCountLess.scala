package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: how many (b1, b2, b3) long triples of a
  * SORTED (lexicographic ascending, null-free, equal-length) broadcast
  * triple-of-arrays are strictly less than — or, with `orEq`, less
  * than or equal to — the probe triple (v1, v2, v3). Binary search,
  * fully inside whole-stage codegen.
  *
  * This is [[ArrayCountLess]] lifted to a 160-bit key space: the
  * suffix-rank merge compares 32-char windows packed as THREE longs
  * (12 + 12 + 8 base-32 chars — one long cannot hold 32 chars, and a
  * double cast of a 2^60 packing would silently collapse low bits),
  * so the bucket count must compare lexicographically over the triple.
  * The delta class set rides as three parallel literal arrays; each
  * old class resolves its insertion bucket in log2(|delta|) compiled
  * triple comparisons — the whole-corpus class pass stays a pure map.
  *
  * Null contract (house style, matching ArrayCountLess): a null array
  * yields null; a null probe component yields 0. Packed keys are
  * non-null by construction, so neither branch fires in the merge.
  */
case class TripleCountLess(a1: Expression, a2: Expression, a3: Expression,
    v1: Expression, v2: Expression, v3: Expression, orEq: Boolean)
    extends Expression with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(a1, a2, a3, v1, v2, v3)

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = a1.nullable || a2.nullable || a3.nullable

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType),
      LongType, LongType, LongType)

  // deterministic pure function of its inputs
  override def eval(input: InternalRow): Any = {
    val x1 = a1.eval(input); val x2 = a2.eval(input); val x3 = a3.eval(input)
    if (x1 == null || x2 == null || x3 == null) return null
    val b1 = x1.asInstanceOf[ArrayData]
    val b2 = x2.asInstanceOf[ArrayData]
    val b3 = x3.asInstanceOf[ArrayData]
    val p1 = v1.eval(input); val p2 = v2.eval(input); val p3 = v3.eval(input)
    if (p1 == null || p2 == null || p3 == null) return 0
    val w1 = p1.asInstanceOf[Long]
    val w2 = p2.asInstanceOf[Long]
    val w3 = p3.asInstanceOf[Long]
    var lo = 0
    var hi = b1.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val e1 = b1.getLong(mid); val e2 = b2.getLong(mid)
      val e3 = b3.getLong(mid)
      val less = e1 < w1 || (e1 == w1 && (e2 < w2 || (e2 == w2 &&
        (if (orEq) e3 <= w3 else e3 < w3))))
      if (less) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val g1 = a1.genCode(ctx); val g2 = a2.genCode(ctx)
    val g3 = a3.genCode(ctx)
    val p1 = v1.genCode(ctx); val p2 = v2.genCode(ctx)
    val p3 = v3.genCode(ctx)
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val e1 = ctx.freshName("e1"); val e2 = ctx.freshName("e2")
    val e3 = ctx.freshName("e3")
    val cmp3 = if (orEq) "<=" else "<"
    def nn(e: Expression, g: ExprCode): String =
      if (e.nullable) s"${g.isNull}" else "false"
    ev.copy(code = code"""
      |${g1.code}
      |${g2.code}
      |${g3.code}
      |boolean ${ev.isNull} =
      |  ${nn(a1, g1)} || ${nn(a2, g2)} || ${nn(a3, g3)};
      |int ${ev.value} = 0;
      |if (!${ev.isNull}) {
      |  ${p1.code}
      |  ${p2.code}
      |  ${p3.code}
      |  if (${nn(v1, p1)} || ${nn(v2, p2)} || ${nn(v3, p3)}) {
      |    ${ev.value} = 0;
      |  } else {
      |    int $lo = 0;
      |    int $hi = ${g1.value}.numElements();
      |    while ($lo < $hi) {
      |      int $mid = ($lo + $hi) >>> 1;
      |      long $e1 = ${g1.value}.getLong($mid);
      |      long $e2 = ${g2.value}.getLong($mid);
      |      long $e3 = ${g3.value}.getLong($mid);
      |      if ($e1 < ${p1.value} || ($e1 == ${p1.value} &&
      |          ($e2 < ${p2.value} || ($e2 == ${p2.value} &&
      |            $e3 $cmp3 ${p3.value})))) {
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
      newChildren: IndexedSeq[Expression]): TripleCountLess =
    copy(a1 = newChildren(0), a2 = newChildren(1), a3 = newChildren(2),
      v1 = newChildren(3), v2 = newChildren(4), v3 = newChildren(5))

  override def prettyName: String =
    if (orEq) "triple_count_less_eq" else "triple_count_less"
}

object TripleCountLess {
  /** Column-API entry point: arrays as three parallel sorted literal
    * columns, probe as three long columns. */
  def apply(a1: Column, a2: Column, a3: Column,
      v1: Column, v2: Column, v3: Column, orEq: Boolean): Column =
    ColumnBridge.column(TripleCountLess(
      ColumnBridge.expression(a1), ColumnBridge.expression(a2),
      ColumnBridge.expression(a3), ColumnBridge.expression(v1),
      ColumnBridge.expression(v2), ColumnBridge.expression(v3), orEq))
}
