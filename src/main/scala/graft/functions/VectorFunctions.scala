package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float vectors, accumulated in double, as a native
  * Catalyst expression with whole-stage codegen.
  *
  * This is the (b)-tier extension point from the build rules: a scalar
  * the similarity/dedup operators evaluate millions of times per task.
  * A Scala UDF here would box two `Seq[Float]` per call and fall out of
  * codegen; this expression reads the unsafe array data in place and
  * emits a tight primitive loop into the generated code, so the whole
  * KNN / near-dup stage stays inside one WholeStageCodegen span.
  *
  * The accumulation is a strict left-to-right double fold — bit-exact
  * with DuckDB's `list_dot_product` over `DOUBLE[]`, which the oracles
  * rely on.
  */
/** Natural log via `java.lang.Math.log` (the platform intrinsic), not
  * the `StrictMath.log` that Spark's built-in `log` uses. The two
  * differ by 1 ULP on ~4 % of arguments (measured on the t22 KL ratio
  * set: 27 of 617), and DuckDB's `ln` — this engine's oracle — is the
  * platform libm, which agrees with the intrinsic. Queries whose
  * oracle checks float-exact ln values (t22) use this; the cost is
  * identical (the intrinsic is the faster path).
  */
case class PlatformLn(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any): Any = Math.log(x.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Math.log($x)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `Math.exp` as a codegen'd expression — the [[PlatformLn]] contract
  * for the inverse direction (Spark's builtin `exp` routes through
  * StrictMath; DuckDB's libm exp matches java.lang.Math bit for bit —
  * verified over a value sweep in GraftFunctionsSpec).
  */
case class PlatformExp(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any): Any = Math.exp(x.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Math.exp($x)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Element accessor picked from the input type: works for both
    * array<float> (the embeddings table) and array<double> (derived
    * profiles). Both accumulate in double, left to right.
    */
  private lazy val isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    } else while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      val get = if (isFloat) "(double) %s.getFloat(%s)" else "%s.getDouble(%s)"
      val xa = get.format(a, i)
      val xb = get.format(b, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $xa * $xb;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** `vec_dot(a, b)` as a Column. */
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm of a float vector. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Full cosine similarity (recomputes both norms — prefer
    * [[cosinePrenormed]] in joins, where norms are computed once per
    * vector before the pair explosion).
    */
  def cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Cosine from a pair dot product and per-side precomputed norms. */
  def cosinePrenormed(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** Platform-libm natural log — see [[PlatformLn]]. */
  def platform_ln(x: Column): Column =
    GraftBridge.column(PlatformLn(GraftBridge.expression(x)))

  /** Platform-libm exponential — see [[PlatformExp]]. */
  def platform_exp(x: Column): Column =
    GraftBridge.column(PlatformExp(GraftBridge.expression(x)))
}
