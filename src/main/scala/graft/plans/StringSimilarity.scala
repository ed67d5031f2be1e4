package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity kernel, shared by the interpreted and
  * codegen paths. Semantics pinned byte-for-byte to DuckDB's
  * `jaro_winkler_similarity` (verified on reference pairs): match
  * window `max(|a|,|b|)/2 − 1`, transpositions halved, Winkler boost
  * `p·0.1·(1−j)` with prefix capped at 4 applied only when the Jaro
  * score strictly exceeds 0.7. Computed over UTF-8 BYTES, not UTF-16
  * code units: DuckDB's kernel iterates the raw UTF-8 string, so byte
  * units are what keep non-ASCII (and supplementary-plane) inputs in
  * hash parity with the oracle — and UTF8String hands us those bytes
  * without a toString allocation. */
object JaroWinklerUtil {
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    if (ua.equals(ub)) return 1.0
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var p = 0
      val cap = math.min(4, math.min(la, lb))
      while (p < cap && a(p) == b(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}

/** `jaro_winkler(a, b)` as a native codegen'd expression: the fuzzy
  * match primitive for entity resolution / near-dup name matching.
  * Codegen calls the shared static kernel, so the expression stays
  * inside whole-stage codegen without inlining the loops. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerUtil.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
