package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity between two float-vector
  * columns, with whole-stage codegen (`doGenCode`) — the hot kernel of the
  * ANN operators. Replaces a chain of higher-order functions
  * (`aggregate(zip_with(...))` + two `transform` norms), which evaluate
  * interpreted lambdas per element; this is one fused loop in generated
  * Java. Semantics match the HOF formulation on equal-length arrays (dot
  * over min length, each norm over its full array, all math in Double)
  * with two DELIBERATE refinements for real corpora:
  *  - a zero-norm operand yields 0.0 ("orthogonal"), never NaN — NaN
  *    sorts GREATEST in both Spark and DuckDB descending orders, so an
  *    empty/zero embedding would otherwise become the rank-1 neighbor of
  *    every query;
  *  - a null ELEMENT propagates NULL (reading the slot would return an
  *    undefined value on unsafe rows), like the HOF formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    CosineSimilarity.cosine(a, b) // boxed: null propagates a null element
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = graft.functions.CosineSimilarity.cosine($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object CosineSimilarity {

  /** Shared by interpreted eval and generated code. Boxed so a null
    * ELEMENT can propagate NULL (ArrayData.getFloat on a null slot is
    * undefined for unsafe rows); a zero-norm operand yields 0.0, never
    * NaN (see the class scaladoc). The isNullAt checks are bitset reads —
    * negligible next to the multiply-adds. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    while (i < na) { if (a.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < nb) { if (b.isNullAt(i)) return null; i += 1 }
    val n = math.min(na, nb)
    var dot = 0.0
    i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    var sa = 0.0
    i = 0
    while (i < na) { val x = a.getFloat(i).toDouble; sa += x * x; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val y = b.getFloat(i).toDouble; sb += y * y; i += 1 }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  val name = "graft_cosine"
  private[functions] val info = new ExpressionInfo(classOf[CosineSimilarity].getName, name)
  private[functions] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$name takes exactly 2 arguments")
    CosineSimilarity(args.head, args(1))
  }

  /** Register into an existing session (used by the ops layer). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}

/** SparkSessionExtensions hook: enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)` — the idiomatic way to ship
  * the engine's native functions into any user session. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(CosineSimilarity.name),
      CosineSimilarity.info, CosineSimilarity.builder))
}
