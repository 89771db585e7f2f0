package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression computing the full 8-member MinHash signature
  * of a string in ONE pass — semantically identical to the
  * `array_min(transform(shingles, md5-slice))` composition in
  * [[graft.text.TextOps]] (and to its DuckDB oracle SQL), but with no
  * intermediate shingle/digest arrays: per shingle it computes the two md5
  * digests and folds the 4+4 32-bit slices into running minima
  * (measured ~2× on the minhash bench vs the functions composition).
  *
  * Signature member j (j<4: plain digest, j≥4: "x"-salted digest) is the
  * minimum over shingles of hex digest chars [8j%32, 8j%32+8) — tracked
  * as unsigned ints and formatted as %08x at the end (lexicographic
  * order on fixed-width lowercase hex == numeric order).
  *
  * Codegen emits a static call into [[GraftHash]] (the md5 work dominates,
  * so the call itself is noise), which keeps the surrounding projection in
  * ONE whole-stage-codegen span instead of the interpreted island a
  * `CodegenFallback` would force.
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    GraftHash.minhashSig(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GraftHash.minhashSig($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  import org.apache.spark.sql.graftbridge

  /** Column factory: full signature as `array<string>(8)`. */
  def sigs(text: Column, k: Int): Column =
    graftbridge.toColumn(MinHashSigExpr(graftbridge.toExpression(text), k))
}
