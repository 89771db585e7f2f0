package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactness gates for the two blocking-paradigm queries the DuckDB oracle
  * also covers — these specs prove the stronger CONTRACT, not just one
  * result: d15's prefix filter admits ZERO false negatives vs brute-force
  * all-pairs Jaccard, and d14's adjacent-block equi-join enumerates exactly
  * the window-of-W pairs of the global sort order. */
class DedupJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Host-side Levenshtein (classic DP) for the d14 gate. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Gram sets via the SAME expression the query uses (this spec tests the
    * join/blocking logic, not tokenization — TextOpsSpec covers that). */
  private def gramSets(): Map[Long, Set[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        array_distinct(TextOps.wordNgrams(TextOps.tokens($"text"), 3)).as("g"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, g) => id -> g.toSet }.toMap

  test("d15 prefix filtering is EXACT: equals brute-force all-pairs " +
      "Jaccard >= 0.6 (zero false negatives, zero false positives)") {
    val sets = gramSets()
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      inter = (sets(a) & sets(b)).size.toLong
      uni = sets(a).size + sets(b).size - inter
      if uni > 0 && inter * 10 >= uni * 6
    } yield (a, b, inter, uni, inter * 1000000L / uni)).toSet
    val got = graft.SparkEntry.queries("d15_prefix_filter_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
    assert(expected.nonEmpty, "fixture produced no pairs — gate is vacuous")
  }

  test("d14 adjacent-block equi-join enumerates exactly the window-of-W " +
      "pairs of the global (key, doc_id) sort order") {
    val keyed = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        (id, text.replaceAll("[^a-zA-Z0-9]", "").toLowerCase.take(24),
          text.take(120))
      }
    val ranked = keyed.sortBy { case (id, k, _) => (k, id) }.zipWithIndex
    val expected = (for {
      ((aId, _, aPfx), aRnk) <- ranked
      ((bId, _, bPfx), bRnk) <- ranked
      if bRnk - aRnk >= 1 && bRnk - aRnk <= 10
      l = lev(aPfx, bPfx) if l <= 20
    } yield (math.min(aId, bId), math.max(aId, bId),
        (bRnk - aRnk).toLong, l.toLong)).toSet
    val got = graft.SparkEntry.queries("d14_sorted_neighborhood")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
    assert(expected.nonEmpty, "fixture produced no pairs — gate is vacuous")
  }

  test("u5 unionByName fills the missing column with nulls and keeps the " +
      "left schema order") {
    val df = graft.SparkEntry.queries("u5_union_by_name")(spark, dir)
    assert(df.columns.toSeq ==
      Seq("event_id", "user_id", "cents", "event_type"))
    val n = df.count()
    val legacyNulls = df.filter($"event_id" % 2 === 0)
      .filter($"event_type".isNull).count()
    assert(legacyNulls * 2 >= n - 1, s"legacy rows must null-fill: $legacyNulls of $n")
    assert(df.filter($"event_id" % 2 === 1)
      .filter($"event_type".isNull).count() == 0)
  }
}
