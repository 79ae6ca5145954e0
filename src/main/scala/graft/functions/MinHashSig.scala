package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd k-band MinHash signature over pre-hashed shingles:
  * sig[j] = min over elements h of xxhash64_long(h, seed_j), with
  * seed_j = xxhash64_int(j, 42) — bit-identical to the declarative
  * `transform(sequence(0,k-1), j -> array_min(transform(hs, h ->
  * xxhash64(j, h))))` it replaces (Spark's xxhash64 folds the int band
  * index into the default 42 seed, then the long element into that).
  *
  * Why a custom expression: the nested higher-order-function form runs
  * fully interpreted and allocates an intermediate k×n hash array per
  * row; this compiles to one tight two-level Java loop inside
  * whole-stage codegen with the k band seeds precomputed once per
  * plan, no per-row allocation beyond the k-long result.
  *
  * Null elements hash to the band seed itself (Spark's hash functions
  * skip nulls), matching the declarative form. An EMPTY input array
  * yields null (the HOF form yields an array of null mins that
  * [[graft.text.Dedup]] filters out before signing; callers must
  * filter empties either way).
  */
final case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects ARRAY<BIGINT>, got ${dt.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(j => XXH64.hashInt(j, 42L))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return null
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val seed = seeds(j)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val cand =
          if (x.isNullAt(i)) seed else XXH64.hashLong(x.getLong(i), seed)
        if (cand < mn) mn = cand
        i += 1
      }
      sig(j) = mn
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val seed = ctx.freshName("seed")
      val mn = ctx.freshName("mn")
      val cand = ctx.freshName("cand")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $sig = new long[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $seed = $seedsRef[$j];
         |    long $mn = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final long $cand = $a.isNullAt($i)
         |        ? $seed : $xxh.hashLong($a.getLong($i), $seed);
         |      if ($cand < $mn) $mn = $cand;
         |    }
         |    $sig[$j] = $mn;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}
