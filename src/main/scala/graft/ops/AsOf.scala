package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of joins (backward and forward) — the time-series join Spark has no
  * native operator for (each left row picks the single right row with the
  * greatest right timestamp ≤ its own — or, forward, the smallest ≥ —
  * per key). The classic uses: align each event with the most recent
  * prior marker (deploy, error, config change), or with the next
  * following outcome (conversion, fill, ack).
  *
  * Implementation is the union-and-carry form, not a join: tag both sides,
  * union them, and run ONE keyed window pass carrying the last non-null
  * right payload forward (`last(..., ignoreNulls)` over an unbounded-
  * preceding row frame). Cost = one shuffle on the key + one sorted pass —
  * the same shape as any per-key window, vs. a range-join's quadratic
  * candidate blowup. Right rows sort BEFORE left rows at equal timestamps,
  * so the match is inclusive (ts_right = ts_left matches).
  *
  * Contract: `right` must be unique per (keys, tsCol) — dedupe first (e.g.
  * keep the max-id row per key+ts) or the carried payload is the last one
  * in nondeterministic order. Timestamp columns must be the same type on
  * both sides. Null timestamps: right rows with a null timestamp are
  * EXCLUDED (an as-of join can never match a row with no time); left rows
  * with a null timestamp are KEPT but get no match in EITHER direction
  * (they order before all timestamped rows in both passes).
  */
object AsOf {

  /** Left-outer backward as-of join: every left row, plus `asof_<p>`
    * columns from the matched right row (null when no prior right row). */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payload: Seq[String]): DataFrame =
    carry(left, right, keys, tsCol, payload, forward = false)

  /** Left-outer FORWARD as-of join: each left row picks the single right
    * row with the SMALLEST right timestamp ≥ its own, per key (null when
    * no later right row). Same union-and-carry shape as
    * [[joinBackward]] — the only difference is the carry direction: the
    * keyed window sorts descending, so "last right payload seen" means
    * "next right row at or after me". Identical cost: one keyed shuffle +
    * one sorted pass. */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String, payload: Seq[String]): DataFrame =
    carry(left, right, keys, tsCol, payload, forward = true)

  private def carry(left: DataFrame, right: DataFrame, keys: Seq[String],
                    tsCol: String, payload: Seq[String],
                    forward: Boolean): DataFrame = {
    val keyCols = keys.map(col)
    val carry = struct(payload.map(col): _*)
    val carryType = right.select(carry.as("__c")).schema("__c").dataType

    // a null-ts right row would sort nulls-first and be carried as the
    // "prior" match for every left row until superseded — an as-of join
    // must never match a right row with no timestamp
    val r2base = right.filter(col(tsCol).isNotNull)
      .select(keyCols :+ col(tsCol) :+ carry.as("__carry"): _*)
      .withColumn("__side", lit(0))
    // pad the right side with typed nulls for every other left column
    val extras = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val r2 = extras.foldLeft(r2base)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val l2 = left
      .withColumn("__carry", lit(null).cast(carryType))
      .withColumn("__side", lit(1))

    // backward: ascending ts, right rows (side 0) before left at equal ts
    // → "last right seen" = greatest right ts ≤ mine, inclusive.
    // forward: descending ts with the same side order → "last right seen"
    // = smallest right ts ≥ mine, inclusive.
    // Null LEFT timestamps sort FIRST in both directions (asc default /
    // desc_nulls_first) so a left row with no timestamp gets no match
    // either way — under plain `desc` (nulls LAST) a null-ts left row
    // would sit after every right row and silently match the earliest one.
    val ord =
      if (forward) Seq(col(tsCol).desc_nulls_first, col("__side"))
      else Seq(col(tsCol), col("__side"))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asofCols = payload.map(p => col(s"__match.$p").as(s"asof_$p"))
    l2.unionByName(r2.select(l2.columns.map(col): _*))
      .withColumn("__match", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++ asofCols: _*)
  }
}
