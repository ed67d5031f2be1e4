package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

private[plans] trait FloatArrayInputs { self: BinaryExpression =>
  def prettyName: String
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }
}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns. A higher-order-function formulation
  * (`aggregate(zip_with(...))`) allocates per-row lambda frames and
  * falls out of whole-stage codegen; this expression stays inside the
  * generated loop — the difference is large at 100 TB where the
  * embedding column dominates scan output.
  *
  * Null if: either side null, dimensions differ, any element null, or
  * either norm is zero — corrupt embeddings surface as null rather than
  * as a plausible-looking score computed over a truncated prefix.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val bad = ctx.freshName("bad")
      s"""
        |int $n = $x.numElements();
        |boolean $bad = ($n != $y.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; !$bad && $i < $n; $i++) {
        |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
        |  double $xi = (double) $x.getFloat($i);
        |  double $yi = (double) $y.getFloat($i);
        |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |}
        |if ($bad || $nx == 0.0 || $ny == 0.0) { ${ev.isNull} = true; }
        |else { ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny); }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two `array<float>` columns (see [[CosineSimilarity]]
  * for why a native expression rather than a higher-order function).
  * Same null discipline: dimension mismatch or null element → null. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      s"""
        |int $n = $x.numElements();
        |boolean $bad = ($n != $y.numElements());
        |${ev.value} = 0.0;
        |for (int $i = 0; !$bad && $i < $n; $i++) {
        |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
        |  ${ev.value} += (double) $x.getFloat($i) * (double) $y.getFloat($i);
        |}
        |if ($bad) { ${ev.isNull} = true; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
