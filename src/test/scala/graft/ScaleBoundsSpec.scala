package graft

import org.scalatest.funsuite.AnyFunSuite

/** SCALE_BOUNDS.md ↔ code consistency gate: the exactness-bound ledger
  * cites quantization/cap constants by `Object.Field`; this spec parses
  * the "Pinned constants" table and asserts each documented value equals
  * the live code value — BOTH directions (every doc row resolves, every
  * registered constant is documented), so retuning a constant without
  * re-deriving its documented bound fails loudly. No SparkSession needed. */
class ScaleBoundsSpec extends AnyFunSuite {

  private val registry: Map[String, Double] = Map(
    "Det.A" -> graft.functions.Det.A.toDouble,
    "Det.C" -> graft.functions.Det.C.toDouble,
    "Det.M" -> graft.functions.Det.M.toDouble,
    "Det.K" -> graft.functions.Det.K.toDouble,
    "TextOps.ManifestShards" -> graft.text.TextOps.ManifestShards.toDouble,
    "TextOps.ManifestChecksumMod" ->
      graft.text.TextOps.ManifestChecksumMod.toDouble,
    "Stats.MilliScale" -> graft.queries.Stats.MilliScale,
    "Stats.BootCap" -> graft.queries.Stats.BootCap.toDouble,
    "Stats.KmScale" -> graft.queries.Stats.KmScale,
    "Stats.G6CustomerCap" -> graft.queries.Stats.G6CustomerCap.toDouble,
    "Embed.KppScale" -> graft.queries.Embed.KppScale,
    "Buckets.DefaultCap" -> graft.ops.Buckets.DefaultCap.toDouble,
    "Curate.UnimaxE" -> graft.queries.Curate.UnimaxE.toDouble,
    "Curate.WinCap" -> graft.queries.Curate.WinCap.toDouble,
    "Curate.JsdVocabK" -> graft.queries.Curate.JsdVocabK.toDouble,
    "Stats.TsPairCap" -> graft.queries.Stats.TsPairCap.toDouble,
    "Stats2.PhDeltaE9" -> graft.queries.Stats2.PhDeltaE9.toDouble,
    "Stats2.PhLambdaE9" -> graft.queries.Stats2.PhLambdaE9.toDouble,
    "Curate.CdcK" -> graft.queries.Curate.CdcK.toDouble,
    "Curate.CdcMask" -> graft.queries.Curate.CdcMask.toDouble,
    "Curate.FsChunkCap" -> graft.queries.Curate.FsChunkCap.toDouble,
    "Curate.GearWin" -> graft.queries.Curate.GearWin.toDouble,
    "Stats3.CpPackShift" -> graft.queries.Stats3.CpPackShift.toDouble,
    "Stats2.KAnonBand" -> graft.queries.Stats2.KAnonBand.toDouble)

  private def docRows: Seq[(String, Double)] = {
    val lines = scala.io.Source.fromFile("SCALE_BOUNDS.md", "UTF-8").getLines().toSeq
    val row =
      """\|\s*`(\w+\.\w+)`\s*\|\s*([0-9][0-9.eE]*)\s*\|.*""".r
    lines.collect { case row(name, value) => (name, value.toDouble) }
  }

  test("every pinned constant in SCALE_BOUNDS.md matches its code value") {
    val rows = docRows
    assert(rows.nonEmpty, "parsed zero constant rows — table format moved?")
    rows.foreach { case (name, documented) =>
      val actual = registry.get(name)
      assert(actual.isDefined, s"$name documented but not registered here")
      assert(actual.contains(documented),
        s"$name: documented $documented, code has ${actual.get} — " +
          "re-derive the bound in SCALE_BOUNDS.md before retuning")
    }
  }

  test("every registered constant is documented (no silent ledger gaps)") {
    val documented = docRows.map(_._1).toSet
    val missing = registry.keySet -- documented
    assert(missing.isEmpty, s"constants missing from SCALE_BOUNDS.md: " +
      missing.toSeq.sorted.mkString(", "))
  }

  test("the manifest checksum bound arithmetic holds as documented") {
    // docs/shard · (mod − 1) must stay < 2^63 at the documented ~4.29e9
    val mod = graft.text.TextOps.ManifestChecksumMod
    assert(mod == (1L << 31))
    assert(BigInt(4290000000L) * (mod - 1) < BigInt(Long.MaxValue))
  }
}
