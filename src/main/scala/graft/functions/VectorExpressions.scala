package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the hot inner loop of similarity search.
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` runs on
  * the interpreted higher-order-function path — at 500k candidate pairs x
  * 64 dims it dominated the all-pairs benchmarks. This expression performs
  * the same left-to-right summation (bit-identical results, which the
  * DuckDB oracle comparison relies on) but participates in whole-stage
  * codegen as a tight primitive loop over the array data.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == ArrayType(DoubleType)) ||
      Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** argmin_c ‖v − centers(c)‖² = argmin_c (‖c‖² − 2 v·c) over a LITERAL
  * center matrix, as ONE codegen node (round 9). The composed form — n
  * separate [[DotProduct]] kernels inside
  * `array_position(array(dists), array_min(dists))` — duplicates every
  * kernel (the dists array is evaluated for both array_position and
  * array_min) and blows the whole-stage-codegen method budget past ~50
  * centers, dropping the projection to interpreted eval (measured ~20×
  * wall on the 100×-fixture IVF encode at nlist 64+). One expression
  * emits one tight k×dim loop over a flattened reference array instead.
  * Ties take the LOWEST index — the same first-occurrence rule as
  * array_position-of-min — and the per-center distance mirrors the
  * composed op tree (‖c‖² − (2·dot)) bit for bit, so cell assignments
  * are identical to the composed form. */
case class NearestCenter(child: Expression, centers: Array[Array[Double]],
                         rank: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(rank >= 0 && rank < centers.length,
    s"nearest-center rank must be in [0, ${centers.length}): $rank")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_center needs an array<double> input, got ${child.dataType}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_center"

  @transient private lazy val dim: Int = centers(0).length
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](centers.length * dim)
    var c = 0
    while (c < centers.length) {
      System.arraycopy(centers(c), 0, f, c * dim, dim); c += 1
    }
    f
  }
  @transient private lazy val normSq: Array[Double] =
    centers.map(_.map(x => x * x).sum)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    // top-(rank+1) smallest distances, insertion-ordered; strict <
    // keeps ties in center order (rank 0 == the old first-minimum)
    val top = rank + 1
    val bd = Array.fill(top)(Double.MaxValue)
    val bi = new Array[Int](top)
    var c = 0
    while (c < centers.length) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { s += v.getDouble(i) * flat(off + i); i += 1 }
      val d = normSq(c) - 2.0 * s
      var j = top - 1
      if (d < bd(j)) {
        while (j > 0 && d < bd(j - 1)) { bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bd(j) = d; bi(j) = c
      }
      c += 1
    }
    bi(rank)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centersFlat", flat, "double[]")
      val nsqRef = ctx.addReferenceObj("centersNormSq", normSq, "double[]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val off = ctx.freshName("off")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val bd = ctx.freshName("bd"); val bi = ctx.freshName("bi")
      val j = ctx.freshName("j")
      val top = rank + 1
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |double[] $bd = new double[$top];
         |int[] $bi = new int[$top];
         |java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |for (int $c = 0; $c < ${centers.length}; $c++) {
         |  double $s = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $flatRef[$off + $i];
         |  }
         |  double $d = $nsqRef[$c] - 2.0 * $s;
         |  int $j = $top - 1;
         |  if ($d < $bd[$j]) {
         |    while ($j > 0 && $d < $bd[$j - 1]) {
         |      $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
         |    }
         |    $bd[$j] = $d; $bi[$j] = $c;
         |  }
         |}
         |${ev.value} = $bi[$rank];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCenter =
    copy(child = newChild)
}

/** Full ADC lookup table for one query vector against LITERAL PQ
  * codebooks, as ONE codegen node (round 9): out[j·ksub + c] =
  * dot(v[j·dsub .. (j+1)·dsub), codebooks(j)(c)) — the m×ksub
  * query-to-codeword partial dot products the ADC scan then reads by
  * code index. The composed form — m×ksub separate [[DotProduct]]
  * kernels over `slice` columns inside a nested `array(array(...))` —
  * is a 512-expression projection at (m=16, ksub=32) that blows the
  * janino method budget and drops the whole query-side stage to
  * interpreted eval. Same per-entry FP operation order as the composed
  * form (left-to-right partial-dot accumulation), so ADC scores are
  * bit-identical; short input vectors mirror `slice`+dot semantics
  * (sum over the elements that exist). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut needs an array<double> input, got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  @transient private lazy val m: Int = codebooks.length
  @transient private lazy val ksub: Int = codebooks(0).length
  @transient private lazy val dsub: Int = codebooks(0)(0).length
  // flat[(j*ksub + c)*dsub + i] = codebooks(j)(c)(i)
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(j)(c), 0, f, (j * ksub + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    f
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val lim = math.max(0, math.min(dsub, n - base))
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var s = 0.0
        var i = 0
        while (i < lim) { s += v.getDouble(base + i) * flat(off + i); i += 1 }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("pqBooksFlat", flat, "double[]")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val base = ctx.freshName("base"); val lim = ctx.freshName("lim")
      val off = ctx.freshName("off"); val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $dsub;
         |  int $lim = java.lang.Math.max(0, java.lang.Math.min($dsub, $n - $base));
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $off = ($j * $ksub + $c) * $dsub;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      $s += $a.getDouble($base + $i) * $flatRef[$off + $i];
         |    }
         |    $out[$j * $ksub + $c] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level dot product over array<double> (codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm via the same codegen'd kernel. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Index of the nearest center (squared-L2) in a literal matrix —
    * one codegen node, first-minimum tie-break. */
  def nearestCenter(v: Column, centers: Array[Array[Double]]): Column =
    Bridge.column(NearestCenter(Bridge.expression(v), centers))

  /** Index of the RANK-th nearest center (rank 0 = nearest) — the
    * multi-assignment cell router (round 15): each vector indexes into
    * its top-a cells, lifting IVF recall at a fixed probed cell
    * fraction. Same kernel, a small insertion top-(rank+1) instead of
    * a single minimum; ties keep center order at every rank. */
  def nearestCenterRank(v: Column, centers: Array[Array[Double]],
                        rank: Int): Column =
    Bridge.column(NearestCenter(Bridge.expression(v), centers, rank))

  /** Flat m·ksub ADC lookup table against literal PQ codebooks — one
    * codegen node; entry (j·ksub + c) = partial dot of subvector j with
    * codeword c. */
  def pqLut(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqLut(Bridge.expression(v), codebooks))
}
