package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression #4: nearest-candidate search for one
  * vector against a (typically literal, broadcast-by-value) candidate
  * matrix. Returns `struct(pos int, cos double)` — the index of the
  * max-cosine candidate (ties toward the smaller index; a NaN cosine
  * loses to any number, matching Spark's min over `-cos` where NaN is
  * greatest) and that winning cosine.
  *
  * Why an expression and not a join: every IVF-family step that needs
  * "distance to each of k centroids, keep the best" was shaped as
  * corpus x candidates crossJoin + min_by/min aggregate — n*k NARROW
  * rows, but n*k ROWS nonetheless, at ~us-scale per-row pipeline cost.
  * Profiled at the 10x SF with k = sqrt(N) = 142: the k-means|| init
  * alone spent 383 s pushing ~50M such rows (per-round distances +
  * the weights pass), and every assign() added n*k more. This loop
  * does the same k*dim double FMAs per row INSIDE whole-stage codegen
  * — n rows, zero extra exchanges, same left-to-right double
  * accumulation as [[VecDot]] so cosines are bit-identical to the
  * join formulation's.
  *
  * Numeric contract, element-for-element identical to
  * `cosine(a, b) = VecDot(a,b) / (sqrt(VecDot(a,a)) * sqrt(VecDot(b,b)))`:
  * dot over the shorter prefix, norms over each array's own full
  * length, null elements skipped, all accumulation left-to-right in
  * double. Winner selection compares `-cos` with
  * `java.lang.Double.compare` (Spark's total order: NaN greatest) —
  * so a zero-norm vector (all-NaN cosines) resolves to pos 0, exactly
  * like `min_by(cid, struct(d, cid))` over all-NaN d. A null
  * candidate row is skipped; its index still counts (pos stays the
  * array index). Null vec or null candidate array -> null.
  */
case class VecNearest(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val candsOk = right.dataType match {
      case ArrayType(inner, _) => vecOk(inner)
      case _ => false
    }
    if (vecOk(left.dataType) && candsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_nearest expects (array<float>, array<array<float>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cands = b.asInstanceOf[ArrayData]
    val nv = v.numElements()
    // norm(v) once: full own length, nulls skipped (VecDot(a,a))
    var na = 0.0
    var i = 0
    while (i < nv) {
      if (!v.isNullAt(i)) { val x = v.getFloat(i).toDouble; na += x * x }
      i += 1
    }
    val sna = math.sqrt(na)
    var bestNeg = 0.0
    var bestPos = -1
    var j = 0
    val k = cands.numElements()
    while (j < k) {
      if (!cands.isNullAt(j)) {
        val c = cands.getArray(j)
        val nc = c.numElements()
        val n = math.min(nv, nc)
        var dot = 0.0
        var nb = 0.0
        var t = 0
        while (t < n) {
          if (!v.isNullAt(t) && !c.isNullAt(t))
            dot += v.getFloat(t).toDouble * c.getFloat(t).toDouble
          t += 1
        }
        // candidate norm: ITS full length (VecDot(b,b) semantics)
        var t2 = 0
        while (t2 < nc) {
          if (!c.isNullAt(t2)) { val y = c.getFloat(t2).toDouble; nb += y * y }
          t2 += 1
        }
        val neg = -(dot / (sna * math.sqrt(nb)))
        if (bestPos < 0 || java.lang.Double.compare(neg, bestNeg) < 0) {
          bestNeg = neg; bestPos = j
        }
      }
      j += 1
    }
    // empty / all-null candidate arrays (never produced by callers):
    // a sentinel row, NOT null — keeps nullability identical to the
    // children's so codegen's isNull wiring stays trivial
    if (bestPos < 0)
      new GenericInternalRow(Array[Any](-1, Double.NaN))
    else new GenericInternalRow(Array[Any](bestPos, -bestNeg))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val t2 = ctx.freshName("t2")
      val nv = ctx.freshName("nv"); val k = ctx.freshName("k")
      val na = ctx.freshName("na"); val sna = ctx.freshName("sna")
      val c = ctx.freshName("c"); val nc = ctx.freshName("nc")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb"); val neg = ctx.freshName("neg")
      val bestNeg = ctx.freshName("bestNeg")
      val bestPos = ctx.freshName("bestPos")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $nv = $a.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = (double) $a.getFloat($i); $na += $x * $x;
         |  }
         |}
         |double $sna = java.lang.Math.sqrt($na);
         |double $bestNeg = 0.0;
         |int $bestPos = -1;
         |int $k = $b.numElements();
         |for (int $j = 0; $j < $k; $j++) {
         |  if (!$b.isNullAt($j)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
         |    int $nc = $c.numElements();
         |    int $n = $nv < $nc ? $nv : $nc;
         |    double $dot = 0.0; double $nb = 0.0;
         |    for (int $t = 0; $t < $n; $t++) {
         |      if (!$a.isNullAt($t) && !$c.isNullAt($t)) {
         |        $dot += (double) $a.getFloat($t) * (double) $c.getFloat($t);
         |      }
         |    }
         |    for (int $t2 = 0; $t2 < $nc; $t2++) {
         |      if (!$c.isNullAt($t2)) {
         |        double $y = (double) $c.getFloat($t2); $nb += $y * $y;
         |      }
         |    }
         |    double $neg = -($dot / ($sna * java.lang.Math.sqrt($nb)));
         |    if ($bestPos < 0 ||
         |        java.lang.Double.compare($neg, $bestNeg) < 0) {
         |      $bestNeg = $neg; $bestPos = $j;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  $bestPos < 0 ? new Object[]{-1, Double.NaN}
         |               : new Object[]{$bestPos, -$bestNeg});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecNearest =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_nearest"
}

object VecNearest {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecNearest(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
