package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GearBoundsSpec extends SparkSpec {
  import spark.implicits._

  private val Win = 6
  private val Mask = 63L

  private def ends(ss: Seq[String]): Seq[Seq[Long]] =
    ss.toDF("text")
      .select(GearBoundsExpr.gearBounds($"text", Win, Mask).as("bs"))
      .as[Seq[Long]].collect().toSeq

  /** The oracle's per-position identity (GearBoundsExpr doc): boundary
    * at i ⇔ Σ_{j=0..5} (cp_{i−j}·K mod 64)·2^j ≡ 0 (mod 64) — the
    * brute-force reference the wrapped-Long recurrence must equal. */
  private def refEnds(s: String): Seq[Long] = {
    val cps = s.codePoints().toArray
    (Win to cps.length).collect { case i
      if (0 until Win).map(j =>
        (cps(i - 1 - j).toLong * 2654435761L % 64L) * (1L << j)).sum % 64L == 0L =>
      i.toLong
    }
  }

  private val rng = new scala.util.Random(7)
  private val samples = (0 until 50).map(_ =>
    (0 until (20 + rng.nextInt(400))).map(_ =>
      (32 + rng.nextInt(95)).toChar).mkString) ++
    Seq("", "a", "abcde", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")

  test("wrapped-Long recurrence ≡ the per-position mod identity the " +
      "DuckDB oracle recomputes (2^b divides 2^64)") {
    val got = ends(samples.filter(_.nonEmpty))
    val want = samples.filter(_.nonEmpty).map(refEnds)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"sample $i: $g != $w")
    }
  }

  test("ends are ascending, ≥ window, ≤ length; short strings are empty") {
    ends(samples.filter(_.nonEmpty)).zip(samples.filter(_.nonEmpty))
      .foreach { case (bs, s) =>
        assert(bs == bs.sorted && bs.distinct == bs)
        bs.foreach(e => assert(e >= Win && e <= s.length))
      }
    assert(ends(Seq("a", "abcde")).forall(_.isEmpty))
  }

  test("content locality: edits more than the window before a boundary " +
      "never move it (the CDC re-synchronization property)") {
    var checked = 0
    samples.filter(_.length > 40).foreach { s =>
      val bs = ends(Seq(s)).head
      bs.filter(_ > 20).take(2).foreach { b =>
        val p = (b - Win - 5).toInt // strictly before the boundary window
        val mutated = s.updated(p, if (s(p) == 'z') 'y' else 'z')
        assert(ends(Seq(mutated)).head.contains(b),
          s"boundary $b moved after editing position $p")
        checked += 1
      }
    }
    assert(checked > 10, s"locality exercised only $checked times")
  }
}
