package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard writer: the delivery step after token-budget packing.
  *
  * Takes a frame of documents with a `bin` assignment (from the t6 recipe:
  * `Ranks.globalCumSum` over token counts, `bin = cum div budget`) and
  * writes ONE parquet file per bin under `bin=<n>/` directories, rows
  * ordered by the pack order inside each file — the layout a training
  * loader consumes shard-by-shard.
  *
  * Scale shape: `repartition(binCol)` puts each bin in exactly one task
  * (hash partitioning sends every row of a bin to the same partition), so
  * the dynamic-partition write emits exactly one file per bin with no
  * driver-side loop and no global sort — the only shuffle is the
  * repartition itself. Bins are budget-bounded by construction, so a task
  * never holds more than `budget` tokens of payload: skew-proof by the
  * packer's own invariant.
  */
object Shards {

  /** @param packed frame carrying `binCol` + an intra-bin order column
    * @return number of shard files written (= distinct bins) */
  def writeByBin(packed: DataFrame, outDir: String, binCol: String,
                 orderCol: String): Long = {
    packed
      .repartition(col(binCol))
      .sortWithinPartitions(col(binCol), col(orderCol))
      .write.mode("overwrite")
      .partitionBy(binCol)
      .parquet(outDir)
    packed.sparkSession.read.parquet(outDir)
      .select(col(binCol)).distinct().count()
  }

  /** One-call convenience: pack by token budget, then shard.
    * `tokenCol` must be a positive LONG column; documents keep `idCols`. */
  def packAndWrite(docs: DataFrame, idCols: Seq[Column], tokenCol: Column,
                   budget: Long, outDir: String): Long = {
    val packed = Ranks.globalCumSum(docs.select(idCols :+
        tokenCol.cast("long").as("n_tok"): _*),
        idCols, col("n_tok"), "cum_tok")
      .withColumn("bin", expr(s"(cum_tok - n_tok) div $budget"))
    writeByBin(packed, outDir, "bin", "cum_tok")
  }
}
