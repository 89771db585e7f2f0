package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Native Catalyst expression computing the full 8-member MinHash signature
  * of a string in ONE pass — semantically identical to the
  * `array_min(transform(shingles, md5-slice))` composition in
  * [[graft.text.TextOps]] (and to its DuckDB oracle SQL), but with no
  * intermediate shingle/digest arrays: per shingle it computes the two md5
  * digests and folds the 4+4 32-bit slices into running minima.
  *
  * Signature member j (j<4: plain digest, j≥4: "x"-salted digest) is the
  * minimum over shingles of hex digest chars [8j%32, 8j%32+8) — tracked
  * here as unsigned ints and formatted as %08x at the end (lexicographic
  * order on fixed-width lowercase hex == numeric order).
  *
  * `CodegenFallback`: the md5 work dominates; eval-mode costs one virtual
  * call per row while removing ~4× md5 recomputation and all array churn
  * (measured ~2× on the minhash bench vs the functions composition).
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  // per-thread digest: one expression instance can be evaluated from
  // several threads (interpreted projections, subexpression reuse) and a
  // shared MessageDigest would interleave state across rows
  @transient private lazy val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val md = mdLocal.get()
    val text = input.asInstanceOf[UTF8String]
    val n = math.max(text.numChars() - (k - 1), 1)
    val mins = Array.fill(8)(0xffffffffL)
    val salt = "x".getBytes("UTF-8")
    var i = 0
    while (i < n) {
      // substringSQL is 1-based and character-counted — identical to the
      // substr() semantics in both the Column composition and DuckDB
      val sh = text.substringSQL(i + 1, k).getBytes
      md.reset(); md.update(sh)
      fold(md.digest(), mins, 0)
      md.reset(); md.update(salt); md.update(sh)
      fold(md.digest(), mins, 4)
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      UTF8String.fromString(f"$m%08x").asInstanceOf[Any]))
  }

  /** Fold digest bytes into 4 unsigned-int slice minima at mins[base..base+3]. */
  private def fold(digest: Array[Byte], mins: Array[Long], base: Int): Unit = {
    var s = 0
    while (s < 4) {
      val o = s * 4
      val v = ((digest(o) & 0xffL) << 24) | ((digest(o + 1) & 0xffL) << 16) |
        ((digest(o + 2) & 0xffL) << 8) | (digest(o + 3) & 0xffL)
      if (v < mins(base + s)) mins(base + s) = v
      s += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  import org.apache.spark.sql.graftbridge

  /** Column factory: full signature as `array<string>(8)`. */
  def sigs(text: Column, k: Int): Column =
    graftbridge.toColumn(MinHashSigExpr(graftbridge.toExpression(text), k))
}
