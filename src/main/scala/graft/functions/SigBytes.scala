package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType}

/** Packs a MinHash signature (ARRAY<BIGINT>, length k) into k/8 longs
  * by keeping each value's LOW BYTE: packed[g] carries the low bytes
  * of sig[8g..8g+7], element 8g in the most-significant byte. The
  * length MUST be a multiple of 8 — any other length raises at eval
  * time (ADVICE r13: the earlier behavior silently dropped the
  * trailing partial group, so a direct SQL caller with k = 13 got
  * truncated agreement counts with no error; internal callers always
  * gate on k % 8 == 0, so the raise never fires in the library's own
  * plans). A null element packs as byte 0.
  *
  * This is the payload side of the BYTE-PROXY prefilter: the banded
  * LSH table carries 8× less signature through the pair-join sort
  * (k=32: 32 B instead of 256 B), and [[SigAgreeBytes]] counts
  * byte-agreements on the join output. Byte equality is IMPLIED by
  * value equality, so for any threshold the byte gate's recall is ≥
  * the full-signature gate's — the proxy can only let extra
  * candidates through (P = 1/256 per disagreeing position), never
  * prune a pair the full gate would keep.
  */
final case class SigPack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"sig_pack expects ARRAY<BIGINT>, got ${dt.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sig_pack"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() % 8 != 0) {
      throw new IllegalArgumentException(
        s"sig_pack requires a signature length that is a multiple of 8," +
          s" got ${x.numElements()}")
    }
    val groups = x.numElements() / 8
    val out = new Array[Long](groups)
    var g = 0
    while (g < groups) {
      var acc = 0L
      var j = 0
      while (j < 8) {
        val i = g * 8 + j
        val b = if (x.isNullAt(i)) 0L else x.getLong(i) & 0xFFL
        acc = (acc << 8) | b
        j += 1
      }
      out(g) = acc
      g += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val groups = ctx.freshName("groups")
      val out = ctx.freshName("out")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val byt = ctx.freshName("byt")
      // Janino (Spark's codegen compiler) mis-parses a parenthesized
      // shift on an assignment RHS — `x = (x << 8) | y` dies with
      // `Expression "x << 8" is not a type`, silently demoting the
      // whole stage to interpreted eval under the default FALLBACK
      // factory mode. Keep the shift and the or as separate compound
      // assignments; SigBytesSpec pins CODEGEN_ONLY so a regression
      // throws instead of quietly falling back.
      s"""
         |if ($a.numElements() % 8 != 0) {
         |  throw new IllegalArgumentException(
         |    "sig_pack requires a signature length that is a multiple"
         |    + " of 8, got " + $a.numElements());
         |}
         |final int $groups = $a.numElements() / 8;
         |final long[] $out = new long[$groups];
         |for (int $g = 0; $g < $groups; $g++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < 8; $j++) {
         |    final int $i = $g * 8 + $j;
         |    final long $byt =
         |      $a.isNullAt($i) ? 0L : ($a.getLong($i) & 0xFFL);
         |    $acc <<= 8;
         |    $acc |= $byt;
         |  }
         |  $out[$g] = $acc;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SigPack = copy(child = newChild)
}

/** Count of agreeing BYTE positions between two [[SigPack]]-packed
  * signatures — the byte-proxy twin of [[SigAgree]]. Runs once per
  * band-collision row of the LSH candidate stream, compiled to an
  * XOR + 8-byte scan per long inside whole-stage codegen. A null
  * element contributes 0 agreements; a null array yields null.
  *
  * For signatures packed from the same positions,
  * `sigAgreeBytes(pack(a), pack(b)) >= sigAgree(a, b)` always (value
  * equality implies low-byte equality), with expected inflation
  * (k − agree)/256 — so a threshold tuned for [[SigAgree]] keeps at
  * least its recall when applied to the byte proxy.
  */
final case class SigAgreeBytes(left: Expression, right: Expression)
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
        s"sig_agree_bytes expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sig_agree_bytes"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xor = x.getLong(i) ^ y.getLong(i)
        var s = 0
        while (s < 64) {
          if (((xor >>> s) & 0xFFL) == 0L) agree += 1
          s += 8
        }
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
      val xor = ctx.freshName("xor")
      val s = ctx.freshName("s")
      val sh = ctx.freshName("sh")
      // Hoist the parenthesized shift into a local — see SigPack's
      // doGenCode note on the Janino cast-vs-expression mis-parse.
      s"""
         |final int $n = java.lang.Math.min(
         |  $a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    final long $xor = $a.getLong($i) ^ $b.getLong($i);
         |    for (int $s = 0; $s < 64; $s += 8) {
         |      final long $sh = $xor >>> $s;
         |      if (($sh & 0xFFL) == 0L) $acc++;
         |    }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreeBytes =
    copy(left = newLeft, right = newRight)
}
