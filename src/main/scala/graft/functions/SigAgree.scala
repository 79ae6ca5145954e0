package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType}

/** Native codegen'd positional-agreement count over two ARRAY<BIGINT>
  * columns — the MinHash-signature Jaccard ESTIMATOR kernel
  * (`agreements / k` is an unbiased estimate of the Jaccard similarity
  * of the underlying shingle sets; Broder '97, public).
  *
  * Why a custom Catalyst expression: this runs once per band-collision
  * row of the LSH candidate stream (measured 279M rows at gen-sf100
  * for the registered q_dedup_minhash banding), where the declarative
  * `size(filter(zip_with(a,b,(x,y)=>x===y), v=>v))` form is an
  * interpreted higher-order chain allocating two intermediate arrays
  * per row. This compiles to one tight equality loop inside
  * whole-stage codegen, no per-row allocation.
  *
  * Semantics: count of positions in the common prefix of the two
  * arrays where both elements are non-null and equal (signature arrays
  * are fixed-width and null-free, but the expression stays total); a
  * null ARRAY yields null (standard null-intolerant binary semantics).
  *
  * SQL name: `sig_agree` (registered by [[GraftExtensions]] /
  * [[Native.register]]).
  */
final case class SigAgree(left: Expression, right: Expression)
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
        s"sig_agree expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) &&
          x.getLong(i) == y.getLong(i)) {
        agree += 1
      }
      i += 1
    }
    agree
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min(
         |  $a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) {
         |    $acc++;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}
