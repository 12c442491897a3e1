package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the sequential-fold dot product of two
  * `ARRAY<DOUBLE>` columns — the hot inner loop of every similarity
  * operator (e1–e4: kNN probe, blocked near-dup, LSH, IVF).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Catalyst's
  * higher-order functions evaluate their lambda INTERPRETED, one function
  * call per element per row, even inside WholeStageCodegen. This
  * expression emits a tight primitive `for` loop via `doGenCode`, so an
  * all-pairs similarity stage does O(dim) primitive multiply-adds per
  * pair with no per-element allocation. Extension-path choice per the
  * design brief: compose built-ins first (done — the HOF form), drop to a
  * custom Expression only where the built-in is the measured bottleneck
  * (this is; the HOF fold dominated e2/e3 profiles).
  *
  * Semantics are IDENTICAL to the HOF form it replaces, bit for bit:
  *   - same left-to-right accumulation order (IEEE-754 addition is not
  *     associative; a reordered loop would break oracle hash-matches)
  *   - length mismatch → NULL (zip_with pads the shorter side with null,
  *     which poisons the sum)
  *   - any NULL element → NULL (null product poisons the fold)
  * A differential spec pins native ≡ HOF exactly (no tolerance).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual type check (ExpectsInputTypes' AbstractDataType is
  // private[sql]); callers pass array<double> columns, anything else is
  // an analysis-time error, never a runtime cast surprise
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two ARRAY<DOUBLE> inputs, got " +
            s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native vector expressions. */
object VectorFunctions {

  import org.apache.spark.sql.classic.GraftSqlBridge

  /** Codegen'd sequential dot product; see [[DotProductExpr]]. */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProductExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
