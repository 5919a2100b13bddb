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

/** Executor-side holder for broadcast sorted-long-array payloads (one
  * to three parallel arrays). Primitive arrays Java-serialize at ~8
  * bytes/element; the literal-children encoding these broadcast
  * variants replace shipped the same longs as BOXED GenericArrayData
  * inside the expression tree — measured 158.8 MiB task binary per
  * stage at the 2M-class MaxDeltaClasses cap (TripleCapProbe), vs
  * ~48 MB of raw longs.
  */
final class SortedLongs(val a1: Array[Long], val a2: Array[Long],
    val a3: Array[Long]) extends Serializable

/** [[TripleCountLess]] with the sorted triple arrays carried as a REAL
  * broadcast variable instead of literal children — the at-cap path of
  * the suffix-rank merge (SuffixRanks.incremental): the arrays ship
  * once per executor via the broadcast protocol and the task binary
  * stays plan-sized. Same binary search, same codegen shape, same
  * null-probe-yields-0 contract; the arrays themselves are non-null by
  * construction so the expression is non-nullable.
  */
case class TripleCountLessBcast(
    bc: org.apache.spark.broadcast.Broadcast[SortedLongs],
    v1: Expression, v2: Expression, v3: Expression, orEq: Boolean)
    extends Expression with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(v1, v2, v3)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)

  @transient private lazy val arrs = bc.value

  override def eval(input: InternalRow): Any = {
    val p1 = v1.eval(input); val p2 = v2.eval(input); val p3 = v3.eval(input)
    if (p1 == null || p2 == null || p3 == null) return 0
    val w1 = p1.asInstanceOf[Long]
    val w2 = p2.asInstanceOf[Long]
    val w3 = p3.asInstanceOf[Long]
    val b1 = arrs.a1; val b2 = arrs.a2; val b3 = arrs.a3
    var lo = 0
    var hi = b1.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val e1 = b1(mid); val e2 = b2(mid); val e3 = b3(mid)
      val less = e1 < w1 || (e1 == w1 && (e2 < w2 || (e2 == w2 &&
        (if (orEq) e3 <= w3 else e3 < w3))))
      if (less) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val bcRef = ctx.addReferenceObj("tripleBcast", bc,
      classOf[org.apache.spark.broadcast.Broadcast[SortedLongs]].getName)
    // resolved ONCE per generated-class instance, not per row
    val arrsVar = ctx.addMutableState("graft.plans.SortedLongs", "tcArrs",
      v => s"$v = (graft.plans.SortedLongs) $bcRef.value();")
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
      |${p1.code}
      |${p2.code}
      |${p3.code}
      |boolean ${ev.isNull} = false;
      |int ${ev.value} = 0;
      |if (!(${nn(v1, p1)} || ${nn(v2, p2)} || ${nn(v3, p3)})) {
      |  int $lo = 0;
      |  int $hi = $arrsVar.a1().length;
      |  while ($lo < $hi) {
      |    int $mid = ($lo + $hi) >>> 1;
      |    long $e1 = $arrsVar.a1()[$mid];
      |    long $e2 = $arrsVar.a2()[$mid];
      |    long $e3 = $arrsVar.a3()[$mid];
      |    if ($e1 < ${p1.value} || ($e1 == ${p1.value} &&
      |        ($e2 < ${p2.value} || ($e2 == ${p2.value} &&
      |          $e3 $cmp3 ${p3.value})))) {
      |      $lo = $mid + 1;
      |    } else {
      |      $hi = $mid;
      |    }
      |  }
      |  ${ev.value} = $lo;
      |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TripleCountLessBcast =
    copy(v1 = newChildren(0), v2 = newChildren(1), v3 = newChildren(2))

  override def prettyName: String =
    if (orEq) "triple_count_less_eq_bcast" else "triple_count_less_bcast"
}

object TripleCountLessBcast {
  def apply(bc: org.apache.spark.broadcast.Broadcast[SortedLongs],
      v1: Column, v2: Column, v3: Column, orEq: Boolean): Column =
    ColumnBridge.column(TripleCountLessBcast(bc,
      ColumnBridge.expression(v1), ColumnBridge.expression(v2),
      ColumnBridge.expression(v3), orEq))
}

/** Single-array strictly-less count over a broadcast sorted long
  * array — [[ArrayCountLess]]'s exact long semantics with the array as
  * a broadcast variable, for the suffix merge's insertion-point shift
  * (step 3), whose array is delta-only-class-sized and hits the same
  * boxed-literal blowup at the cap. Probe contract matches the long
  * ArrayCountLess variant: counts elements < probe; null probe yields
  * 0 (unreachable in the merge — ranks are non-null).
  */
case class LongCountLessBcast(
    bc: org.apache.spark.broadcast.Broadcast[SortedLongs],
    v: Expression)
    extends Expression with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(v)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType)

  @transient private lazy val arr = bc.value.a1

  override def eval(input: InternalRow): Any = {
    val p = v.eval(input)
    if (p == null) return 0
    val w = p.asInstanceOf[Long]
    val b = arr
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < w) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val bcRef = ctx.addReferenceObj("longsBcast", bc,
      classOf[org.apache.spark.broadcast.Broadcast[SortedLongs]].getName)
    val arrVar = ctx.addMutableState("long[]", "lclArr",
      x => s"$x = ((graft.plans.SortedLongs) $bcRef.value()).a1();")
    val p = v.genCode(ctx)
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    def nn(e: Expression, g: ExprCode): String =
      if (e.nullable) s"${g.isNull}" else "false"
    ev.copy(code = code"""
      |${p.code}
      |boolean ${ev.isNull} = false;
      |int ${ev.value} = 0;
      |if (!${nn(v, p)}) {
      |  int $lo = 0;
      |  int $hi = $arrVar.length;
      |  while ($lo < $hi) {
      |    int $mid = ($lo + $hi) >>> 1;
      |    if ($arrVar[$mid] < ${p.value}) {
      |      $lo = $mid + 1;
      |    } else {
      |      $hi = $mid;
      |    }
      |  }
      |  ${ev.value} = $lo;
      |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongCountLessBcast =
    copy(v = newChildren(0))

  override def prettyName: String = "long_count_less_bcast"
}

object LongCountLessBcast {
  def apply(bc: org.apache.spark.broadcast.Broadcast[SortedLongs],
      v: Column): Column =
    ColumnBridge.column(LongCountLessBcast(bc, ColumnBridge.expression(v)))
}
