package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot paths.
  *
  * The `zip_with`+`aggregate` higher-order-function formulation of a dot
  * product is semantically right but interpretively slow (~30 µs/pair on
  * the all-pairs near-dup join: per-element lambda dispatch, boxed
  * accumulators). [[DotProduct]] is the same sequential left-to-right fold
  * as a tight codegen'd loop over the unboxed array data — identical
  * results (same summation order), ~100× less per-pair overhead. This is
  * the preference order SURVEY.md §7 prescribes: compose built-ins first,
  * drop to a custom `Expression` only where the built-in shape measurably
  * can't keep up.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // a clean AnalysisException at plan time beats a ClassCastException at
  // execution time: both inputs must be array<double> (the eval/codegen
  // reads unboxed doubles from the array storage, so other element types
  // would read garbage, not coerce - callers cast first, as
  // VectorFunctions.asDouble does)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    Seq(left, right).map(_.dataType).zipWithIndex.find {
      case (ArrayType(DoubleType, _), _) => false
      case _ => true
    } match {
      case Some((t, i)) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName argument ${i + 1} requires array<double>, got ${t.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Multi-table sign-LSH bucket ids for a double-array vector: for each
  * hash table t, the m-bit sign pattern of the vector's projections onto
  * that table's hyperplanes. Returns `array<int>` of length L (one bucket
  * per table).
  *
  * The plane matrix rides along as a referenced object instead of a
  * 1500-term literal expression tree — the HOF formulation of the same
  * projections spent more time in Janino than in the data at bench scale.
  * Interpreted eval (CodegenFallback) is a per-row O(L·m·dims) primitive
  * loop, plenty for a bucketing pass that reads each row once.
  */
case class SignLshBuckets(
    child: Expression,
    planes: Array[Array[Array[Double]]]) // [table][plane][dim]
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType)
  override def prettyName: String = "sign_lsh_buckets"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Int](planes.length)
    var t = 0
    while (t < planes.length) {
      var bucket = 0
      var p = 0
      while (p < planes(t).length) {
        val plane = planes(t)(p)
        val n = math.min(plane.length, v.numElements())
        var proj = 0.0
        var d = 0
        while (d < n) { proj += v.getDouble(d) * plane(d); d += 1 }
        if (proj >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExpressions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def sign_lsh_buckets(v: Column, planes: Array[Array[Array[Double]]]): Column =
    column(SignLshBuckets(expression(v), planes))

  /** The one canonical cosine expression tree — both registration paths
    * (per-session registry, SparkSessionExtensions) build from here so a
    * future change cannot diverge between them.
    */
  def cosineExpr(a: Expression, b: Expression): Expression =
    Divide(DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
}
