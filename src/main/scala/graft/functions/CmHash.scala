package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE count-min slot derivation — d independent 32-bit hash rows from one
  * md5 (8-hex-char slices, the minhash trick), width w. Shared by the
  * `a14_cm_heavy_hitters` batch sketch and the streaming
  * [[graft.streaming.StreamJob.cmSketchStream]] so the two derivations can
  * never drift apart (its DuckDB twin is the strpos hex fold in the a14
  * oracle). */
object CmHash {

  def slotArray(key: Column, d: Int, w: Int): Column = {
    val h = md5(key.cast("string").cast("binary"))
    array((0 until d).map(j =>
      conv(substring(h, j * 8 + 1, 8), 16, 10).cast("long") % w): _*)
  }
}
