package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for vector math (SURVEY §7.3: custom code is
  * justified only where built-ins can't express the semantics *efficiently*
  * — Spark's higher-order functions (`zip_with` + `aggregate`) compute a dot
  * product but are `CodegenFallback`: one closure call and boxed array
  * allocation per element. `VectorDot` generates a primitive double loop
  * inside whole-stage codegen instead.
  *
  * Semantics are a strict left-to-right fold in double precision — exactly
  * the higher-order-function formulation and DuckDB's `list_dot_product`,
  * so oracle hash-parity is preserved bit for bit.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

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
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.functions.{call_function, sqrt}

  /** Register `vector_dot` in the session's function registry — the
    * supported Spark 4 route to a custom Expression (Column↔Expression
    * bridges are private to the sql package). Idempotent. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs.head, exprs(1)), "built-in")

  /** Dot product of two array<double> columns (codegen'd).
    * Requires ensureRegistered on the session. */
  def vector_dot(a: Column, b: Column): Column =
    call_function("vector_dot", a, b)

  /** Cosine similarity built from vector_dot — same fold order as the
    * DuckDB oracle (`list_dot_product` / sqrt composition). */
  def vector_cosine(a: Column, b: Column): Column =
    vector_dot(a, b) / (sqrt(vector_dot(a, a)) * sqrt(vector_dot(b, b)))
}
