package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Static kernels behind [[MinHashSigExpr]] and [[Simhash64Expr]], shared by
  * interpreted eval and generated code: Scala object methods compile to
  * static forwarders, so Janino-generated projections call
  * `graft.expressions.GraftHash.minhashSig(...)` directly — the expressions
  * stay inside whole-stage codegen instead of breaking the span with a
  * `CodegenFallback` interpreted island.
  *
  * The MD5 instance is per-thread: codegen'd tasks run one thread per
  * partition, but interpreted/driver-side eval and subexpression reuse can
  * hit the same JVM-wide helper from many threads at once.
  */
object GraftHash {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val SALT = "x".getBytes("UTF-8")

  /** Full 8-member MinHash signature of `text` over k-char shingles —
    * semantics documented on [[MinHashSigExpr]]. */
  def minhashSig(text: UTF8String, k: Int): ArrayData = {
    val md = mdLocal.get()
    val n = math.max(text.numChars() - (k - 1), 1)
    val mins = Array.fill(8)(0xffffffffL)
    var i = 0
    while (i < n) {
      // substringSQL is 1-based and character-counted — identical to the
      // substr() semantics in both the Column composition and DuckDB
      val sh = text.substringSQL(i + 1, k).getBytes
      md.reset(); md.update(sh)
      fold(md.digest(), mins, 0)
      md.reset(); md.update(SALT); md.update(sh)
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

  /** 64-bit SimHash of a token array — semantics documented on
    * [[Simhash64Expr]]. */
  def simhash64(arr: ArrayData): Long = {
    val md = mdLocal.get()
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        md.reset(); md.update(tok.getBytes)
        val digest = md.digest()
        var b = 0
        while (b < 64) {
          val bit = (digest(b >> 3) >> (7 - (b & 7))) & 1
          votes(b) += (if (bit == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Word n-grams of a token array, space-joined — semantics identical to
    * `transform(sequence(0, greatest(size-n, 0)), i ->
    * array_join(slice(toks, i+1, n), " "))`: size ≥ n gives size−n+1
    * grams; shorter inputs give ONE partial gram (the whole array joined);
    * null tokens are skipped by the join (ConcatWs semantics), matching
    * `array_join` with no null replacement. */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val size = toks.numElements()
    val m = math.max(size - n, 0)
    val out = new Array[Any](m + 1)
    var i = 0
    while (i <= m) {
      val end = math.min(i + n, size)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (toks.isNullAt(j)) null else toks.getUTF8String(j)
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Gear CDC boundary scan — contract on [[GearBoundsExpr]]: ascending
    * 1-based codepoint end positions i ≥ minPos with (h_i & mask) == 0,
    * h ← h·2 + codepoint·2654435761 over the full prefix (wrapped Long —
    * equal to the unwrapped value mod (mask+1)). ONE pass per doc, no
    * digest; codepoint (not UTF-16-unit) indexing matches DuckDB
    * substr/ascii. */
  def gearEnds(text: UTF8String, minPos: Int, mask: Long): ArrayData = {
    val s = text.toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var i = 0L // codepoint index (1-based after increment)
    var ci = 0 // UTF-16 unit index
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      ci += Character.charCount(cp)
      i += 1L
      h = h * 2L + cp.toLong * 2654435761L
      if (i >= minPos && (h & mask) == 0L) buf += i
    }
    new GenericArrayData(buf.toArray)
  }
}
