package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product over two `array<double>`
  * columns in ONE fused allocation-free loop (whole-stage codegen via
  * [[doGenCode]]) — the primitive under [[CosineSimilarity]] and
  * [[EuclideanDistance]], exposed on its own for the pre-normalized
  * similarity path: when unit vectors are materialized once per row,
  * a candidate pair costs ONE dot instead of dot + two norms
  * ([[graft.llm.Similarity.nearDupPairs]]).
  *
  * Float semantics: left-to-right accumulation from a 0.0 seed — the
  * same fold order as the HOF `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0d, (acc, p) -> acc + p)` and as DuckDB's `list_reduce` left fold
  * (whose seed is the first product; `0.0 + p1 == p1` exactly), so all
  * three formulations agree bit-for-bit on equal-length non-null input.
  *
  * Input convention (same as [[CosineSimilarity]]): unequal lengths fold
  * over the common prefix; null elements are unsupported (`getDouble` on
  * a null slot is undefined). Engine callers produce fixed-dimension
  * `containsNull=false` embedding columns.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
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
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $acc = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: dot product over two array<double> columns. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register as the SQL function `dot_product` on the session. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)))
}
