package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature fold over an array of mod-p shingle hashes:
  * acc_j = min over shingles of (a_j * h + b_j) mod p. The pure-expression
  * formulation (aggregate + two zip_with per shingle) walks a numPerms-
  * wide array accumulator through interpreted higher-order functions;
  * this is the same computation as a two-level Java loop inside codegen.
  * Identical output to the expression form (pinned in DedupSpec); empty
  * inputs yield the all-p sentinel signature.
  *
  * The permutation coefficients are plan-time constants, emitted once
  * into generated-class state — not per-row allocations. */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long],
                            prime: Long) extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash needs array<bigint> shingle hashes, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val k = aArr.length
    val acc = Array.fill(k)(prime)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (aArr(j) * h + bArr(j)) % prime
        if (v < acc(j)) acc(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = a.length
    val aLit = a.map(_ + "L").mkString("new long[]{", ", ", "}")
    val bLit = b.map(_ + "L").mkString("new long[]{", ", ", "}")
    val aRef = ctx.addMutableState("long[]", "minhashA", v => s"$v = $aLit;")
    val bRef = ctx.addMutableState("long[]", "minhashB", v => s"$v = $bLit;")
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, ${prime}L);
         |int ${i}n = $in.numElements();
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  long $h = $in.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
         |    if ($v < $acc[$j]) $acc[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashExpression {
  /** MinHash signature over an array<bigint> of mod-p shingle hashes. */
  def minhash(shingleHashes: Column, a: Seq[Long], b: Seq[Long], prime: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingleHashes), a, b, prime))
}
