package graft.ext.expr

import org.apache.spark.QueryContext
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, SupportQueryContext}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine similarity over two `array<double>` columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * The composed form (`zip_with` product + three `aggregate` folds)
  * walks each array four times and allocates the zipped product array
  * per row; on a brute-force ANN scan that is the entire inner loop.
  * This expression computes dot, ‖a‖² and ‖b‖² in ONE pass with three
  * scalar accumulators and no allocation, inside the surrounding
  * WholeStageCodegen span.
  *
  * Semantics are BIT-IDENTICAL to the composed form (proven in
  * CosineExprSpec): each accumulator folds left-to-right in element
  * order exactly like `aggregate`, and the final value is
  * `dot / (sqrt(na) * sqrt(nb))` in the same operation order — so
  * swapping it into an oracle-pinned query changes no hashes.
  * Null/length edge cases mirror the composed form: a null element or
  * a length mismatch (where `zip_with` pads with null) yields NULL.
  * Division mirrors Spark's `Divide` exactly, including ANSI mode: a
  * zero divisor (empty or zero-norm input) throws DIVIDE_BY_ZERO under
  * ANSI (`failOnError`, captured at construction like `Divide`'s) and
  * returns NULL otherwise (SQL semantics, not IEEE NaN).
  */
case class CosineSimExpr(left: Expression, right: Expression,
                         failOnError: Boolean = SQLConf.get.ansiEnabled)
    extends BinaryExpression with ExpectsInputTypes with SupportQueryContext {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] conforms
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // a length mismatch / null element returns NULL even for non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def initQueryContext(): Option[QueryContext] =
    if (failOnError) Some(origin.context) else None

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = av.numElements()
    if (n != bv.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      val x = av.getDouble(i); val y = bv.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val div = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)
    if (div == 0.0) {
      if (failOnError) throw ColumnShim.divideByZeroError(getContextOrNull())
      return null
    }
    dot / div
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val div = ctx.freshName("div")
      val errCtx = getContextOrNullCode(ctx, failOnError)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $div = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($div == 0.0D) {
         |      if ($failOnError) {
         |        throw org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError($errCtx);
         |      }
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / $div;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Column-API entry point: fused cosine of two array<double> columns. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimExpr(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
