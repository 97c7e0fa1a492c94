package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for vector math over array<double>.
  *
  * The built-in higher-order route (`aggregate(zip_with(a, b, *), 0.0, +)`)
  * is interpreted (no codegen) and allocates a zipped intermediate array
  * per row — measured 163 s for the brute-force cosine top-k at sf0.1.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen instead, with identical left-fold float semantics
  * (0.0 + x₀ + x₁ + … — bit-compatible with the DuckDB oracle's
  * list_reduce).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_d requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw DotProductD.lengthMismatch(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) throw DotProductD.nullElement()
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw graft.functions.DotProductD.lengthMismatch($n, $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw graft.functions.DotProductD.nullElement();
         |  }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  /** Malformed embeddings fail loudly instead of yielding silently
    * wrong cosines (the previous code truncated to the shorter array). */
  def lengthMismatch(a: Int, b: Int): IllegalArgumentException =
    new IllegalArgumentException(s"dot_d: vector length mismatch ($a vs $b)")
  def nullElement(): IllegalArgumentException =
    new IllegalArgumentException("dot_d: null vector element")
}

object VectorExprs {
  /** Register SQL-callable vector functions on a session (idempotent, silent). */
  def register(spark: SparkSession): Unit = GraftFunctions.registerAll(spark)
}
