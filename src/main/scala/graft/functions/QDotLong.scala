package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two ARRAY<BIGINT> columns —
  * the hot kernel of the quantized-cosine similarity surface
  * (graft.text.Similarity; SURVEY north_star similarity search).
  *
  * Why a custom Catalyst expression: the declarative alternatives both
  * fall off the fast path. `aggregate(zip_with(a,b,*),0,+)` runs fully
  * interpreted (higher-order functions never enter codegen, and lambda
  * children re-evaluate — see the round-1 HOF findings), and the
  * dimension-unrolled `element_at` chain builds a 64-node expression
  * tree per call that bloats generated code and re-checks bounds per
  * element. This expression compiles to ONE tight Java loop over the
  * unsafe array words inside whole-stage codegen — and it needs no
  * compile-time dimension.
  *
  * Semantics: pairwise product-sum over the common prefix of the two
  * arrays; null ELEMENTS contribute 0 (quantized vectors never carry
  * null elements, but the expression stays total); a null ARRAY yields
  * null (standard null-intolerant binary semantics). Sums are exact for
  * |x|<=~8, dim<=1024 quantized at 1e6 (< 2^53, far from Long
  * overflow — see Similarity's class doc).
  *
  * SQL name: `qdot_long` (registered by [[GraftExtensions]] /
  * [[Native.register]]).
  */
final case class QDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"qdot_long expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "qdot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getLong(i) * y.getLong(i)
      }
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min(
         |  $a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotLong =
    copy(left = newLeft, right = newRight)
}
