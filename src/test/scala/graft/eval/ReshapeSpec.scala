package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property gates for a33 (unpivot) and a34 (calibration) beyond the
  * cross-engine oracle rows. */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("a33 unpivot conserves rows: every metric carries exactly one cell " +
      "per source row") {
    val src = graft.Tables.t(spark, dir, "lineitem").count()
    val rows = graft.SparkEntry.queries("a33_unpivot")(spark, dir)
      .select($"metric", $"n").as[(String, Long)].collect().toMap
    assert(rows.keySet ==
      Set("qty_c", "price_c", "disc_c", "tax_c"))
    assert(rows.values.forall(_ == src), s"expected n=$src in every metric: $rows")
  }

  test("a34 calibration bins are equi-depth (±1) and mean predicted proba " +
      "is non-decreasing across bins") {
    val rows = graft.SparkEntry.queries("a34_calibration")(spark, dir)
      .select($"bin", $"n_bin", $"mean_proba_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 10L))
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"bins not equi-depth: ${sizes.toSeq}")
    val means = rows.map(_._3)
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      s"mean proba not monotone over proba-ordered bins: ${means.toSeq}")
  }
}
