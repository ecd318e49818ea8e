package graft

import graft.functions.{DotProduct, MinHashSignature, SimHash64}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use, so `SELECT graft_dot(a, b)` works in plain
  * spark.sql. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
    (children: Seq[Expression]) => SimHash64(children(0)))

  /** graft_minhash(hashArray): 32-permutation signature with the engine's
    * fixed coefficients (Dedup.perm). */
  val minhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val perms = (0 until 32).map(Dedup.perm)
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        perms.map(_._1), perms.map(_._2), Dedup.MinhashPrime))
  }

  val functions = Seq(dotFunction, simhashFunction, minhashFunction)

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach(f => registry.registerFunction(f._1, f._2, f._3))
  }
}
