package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear-style rolling-hash content-defined-chunking boundaries — the
  * O(1)-per-char CDC kernel (Xia et al., FastCDC 2016's Gear recurrence:
  * h ← h·2 + T[c], boundary when the masked low bits hit 0) replacing the
  * t42 family's md5-of-every-k-gram pass (~k× the per-char work plus a
  * digest per POSITION; this kernel leaves one md5 per CHUNK).
  *
  * Returns the ascending 1-based CODEPOINT end positions i (i ≥ minPos)
  * where `(h_i & mask) == 0`, with `h_i` the full-prefix Gear state.
  * Because the recurrence shifts left once per char, `h_i mod 2^b`
  * depends on exactly the last b codepoints — so with mask = 2^b − 1 the
  * boundary decision is content-LOCAL (window b), which is both the CDC
  * property (insertions re-synchronize after b chars) and what makes the
  * kernel DuckDB-oracle-able per position: the oracle recomputes
  * Σ_{j=0..b−1} (T[c_{i−j}] mod 2^b)·2^j mod 2^b from b `ascii(substr)`
  * terms — pure integer arithmetic, no fold (wrapped Long arithmetic
  * here equals the unwrapped mod since 2^b divides 2^64). T[c] =
  * codepoint · 2654435761 (the Knuth multiplier the repo's keyed LCG
  * already pins as `Det.K`). Codepoint iteration (not UTF-16 units)
  * keeps char indexing identical to DuckDB's substr/ascii semantics.
  * Expected chunk length ≈ 2^b + the unconditional end-of-doc boundary.
  */
case class GearBoundsExpr(child: Expression, minPos: Int, mask: Long)
    extends UnaryExpression {
  require(minPos >= 1 && mask > 0 && (mask & (mask + 1)) == 0,
    s"gear bounds needs minPos >= 1 and mask = 2^b - 1, got ($minPos, $mask)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_gear_bounds"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_gear_bounds needs string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    GraftHash.gearEnds(input.asInstanceOf[UTF8String], minPos, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GraftHash.gearEnds($c, $minPos, ${mask}L);")

  override protected def withNewChildInternal(newChild: Expression): GearBoundsExpr =
    copy(child = newChild)
}

object GearBoundsExpr {
  import org.apache.spark.sql.graftbridge

  def gearBounds(text: Column, minPos: Int, mask: Long): Column =
    graftbridge.toColumn(
      GearBoundsExpr(graftbridge.toExpression(text), minPos, mask))
}
