package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (the 100 TB knob AQE doesn't always
  * reach: extreme single-key skew on a non-broadcastable build side).
  *
  * [[saltedJoin]] splits each big-side key across `salts` sub-keys and
  * replicates the small side per salt, so one hot key's rows spread over
  * `salts` tasks instead of one straggler. The JOIN RESULT is independent
  * of the salt assignment (each big row still meets every matching small
  * row exactly once), which is why the oracle can check it against a plain
  * join — only the physical distribution changes. */
object Skew {

  /** Inner equi-join `big ⋈ small` on `bigKey == smallKey`, salted.
    * `small` is replicated `salts`× (keep it dimension-sized). */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column, salts: Int,
                 seed: Long = 42L): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      floor(rand(seed) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
