package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector math over `array<float>` embedding columns.
  *
  * Re-expresses the reference's NumPy cosine kernel (reference:
  * src/core/embeddings/processor.py:408 `_cosine_similarity` — dot /
  * (norm*norm), zero-norm guard returning 0) as native Catalyst
  * expressions: single pass over the two arrays, no boxing, no UDF,
  * inlined into whole-stage codegen. This is the hot inner loop of
  * every D-family query, so it must stay on the codegen path.
  *
  * Parity note (SURVEY.md §4): elements are widened float→double
  * (exact), accumulated sequentially; query results round to 6 dp on
  * both engines before any ordering/threshold so Spark and DuckDB
  * select identical rows.
  */
object VectorFunctions {

  /** cosine(a, b) ∈ [-1, 1]; 0 when either norm is 0 (reference
    * processor.py:431). */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(expr(a), expr(b)))

  /** Sequential-fold dot product of two float vectors. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(expr(a), expr(b)))

  /** L2 norm of one float vector. */
  def l2Norm(a: Column): Column =
    GraftColumnBridge.column(L2Norm(expr(a)))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null on dimension mismatch (see checkInputDataTypes)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.twoNumericArrays(prettyName, left, right)

  /** Dimension mismatch (corrupt row, wrong-model embedding) yields
    * NULL — visible and skippable — instead of a plausible score over
    * the truncated prefix (the reference's NumPy dot raises on shape
    * mismatch; an engine must not kill the job for one bad row). */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val getA = VectorTypeCheck.getter(left.dataType)
    val getB = VectorTypeCheck.getter(right.dataType)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getA(a, i)
      val y = getB(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val gA = VectorTypeCheck.genGetter(left.dataType, a, i)
      val gB = VectorTypeCheck.genGetter(right.dataType, b, i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $gA;
         |    final double $y = $gB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.twoNumericArrays(prettyName, left, right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val getA = VectorTypeCheck.getter(left.dataType)
    val getB = VectorTypeCheck.getter(right.dataType)
    val n = a.numElements()
    var dot = 0.0; var i = 0
    while (i < n) { dot += getA(a, i) * getB(b, i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val gA = VectorTypeCheck.genGetter(left.dataType, a, i)
      val gB = VectorTypeCheck.genGetter(right.dataType, b, i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $gA * $gB;
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.numericArray(prettyName, child)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val get = VectorTypeCheck.getter(child.dataType)
    var s = 0.0; var i = 0
    while (i < a.numElements()) {
      val x = get(a, i); s += x * x; i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val g = VectorTypeCheck.genGetter(child.dataType, a, i)
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $x = $g;
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Analysis-time input validation + element accessors for the vector
  * expressions. These are registered as public SQL functions, so they
  * must fail ANALYSIS on non-vector inputs (instead of mis-reading
  * UnsafeArrayData at the wrong stride) and must accept both
  * array<float> and array<double> embeddings — double arrays are the
  * common storage type outside this repo. */
object VectorTypeCheck {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def numericArray(fn: String, e: Expression): TypeCheckResult =
    if (ok(e.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<float> or array<double>, got ${e.dataType.catalogString}")

  def twoNumericArrays(fn: String, l: Expression, r: Expression): TypeCheckResult =
    if (!ok(l.dataType)) numericArray(fn, l)
    else numericArray(fn, r)

  /** Interpreted-path element accessor widened to double. */
  def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case _ => (a, i) => a.getFloat(i).toDouble
  }

  /** Codegen element accessor widened to double. */
  def genGetter(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case _ => s"(double) $arr.getFloat($i)"
  }
}
