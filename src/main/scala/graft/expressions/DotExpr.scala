package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for Σ aᵢ·bᵢ over two numeric arrays —
  * semantically identical (bit-for-bit, including the left-to-right double
  * accumulation, element casts, null elements and length-mismatch → NULL)
  * to the `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _ + _)`
  * composition it replaces in [[graft.similarity.Vectors.dot]], and to the
  * DuckDB `list_reduce(list_transform(...))` oracle twin.
  *
  * Why it exists: Spark's higher-order functions (`zip_with`, `aggregate`)
  * have no `doGenCode` — each evaluation allocates the zipped array and
  * boxes every lambda step. On pair-generation hot paths (ANN refine,
  * in-cell SemDeDup scoring: hundreds of thousands of cosines) those three
  * interpreted 64-element folds per pair dominate the query. This kernel is
  * one tight primitive loop, and the static-call codegen keeps the whole
  * projection in a single whole-stage span ([[GraftHash]] pattern).
  */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // NULL can come from VALUES, not just null inputs (length mismatch /
  // null elements), so nullable must not derive from child nullability:
  // with non-nullable children the default (false) makes every consumer
  // skip the null bit and read 0.0 where the kernel said NULL
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  /** The kernel reads raw float/double slots; any other element type must
    * fail analysis, not silently reinterpret bits (the composition this
    * replaced accepted any numeric array via per-element cast). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}" +
          " — cast integral arrays explicitly")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  // null decision split from the value so the common path is a primitive
  // double with NO per-row boxing (this kernel exists for the ANN/SemDeDup
  // pair-scoring hot path; a boxed java.lang.Double per pair defeats it)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if (!graft.expressions.GraftVec.lengthsAndNullsOk($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.GraftVec.dotPrim(
         |    $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

object DotExpr {
  import org.apache.spark.sql.graftbridge

  /** Column factory over `array<float>` / `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    graftbridge.toColumn(DotExpr(graftbridge.toExpression(a),
      graftbridge.toExpression(b)))
}

/** Static kernel shared by interpreted eval and generated code (Scala
  * object methods compile to static forwarders — see [[GraftHash]]). */
object GraftVec {

  /** NULL-result predicate: false when the lengths differ or any element is
    * null — exactly when the zip_with/aggregate composition this kernel
    * replaces yields NULL (zip_with pads the shorter side with null; a null
    * product makes the running sum null and it stays null). The null scan
    * is a separate cheap pass so [[dotPrim]] stays branch-free. */
  def lengthsAndNullsOk(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Left-to-right double dot product over inputs [[lengthsAndNullsOk]]
    * already validated — primitive return, zero allocation per call. */
  def dotPrim(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Boxed variant for interpreted (non-codegen) eval only. */
  def dotBoxed(a: ArrayData, b: ArrayData,
               aFloat: Boolean, bFloat: Boolean): java.lang.Double =
    if (!lengthsAndNullsOk(a, b)) null else dotPrim(a, b, aFloat, bFloat)

  /** Elementwise `a ± b` → array<double> with zip_with's extend-and-null
    * semantics (see [[VecCombExpr]]). */
  def combine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean,
              subtract: Boolean): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val n = math.max(na, nb)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val aOk = i < na && !a.isNullAt(i)
      val bOk = i < nb && !b.isNullAt(i)
      if (aOk && bOk) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        out(i) = if (subtract) x - y else x + y
      } // else stays null
      i += 1
    }
    new GenericArrayData(out)
  }
}
