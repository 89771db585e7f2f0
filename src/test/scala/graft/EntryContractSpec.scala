package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that don't need a SparkSession. The
  * correctness gate compares BY NAME — a query registered without an
  * oracle silently downgrades to a rows-only check, and an oracle whose
  * query was renamed would never run at all. Both drifts are build
  * errors here, not weaker gates at the driver. */
class EntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across packs (no silent Map overwrite)") {
    val packs: Seq[(String, Set[String])] = Seq(
      "Core" -> queries.Core.queries.keySet,
      "Inject" -> queries.Inject.queries.keySet,
      "TextDedup" -> queries.TextDedup.queries.keySet,
      "Embed" -> queries.Embed.queries.keySet,
      "Core2" -> queries.Core2.queries.keySet,
      "Lifecycle" -> queries.Lifecycle.queries.keySet,
      "Pipeline" -> queries.Pipeline.queries.keySet,
      "Mm" -> queries.Mm.queries.keySet,
      "Analytics" -> queries.Analytics.queries.keySet,
      "Stats" -> queries.Stats.queries.keySet,
      "Stats2" -> queries.Stats2.queries.keySet,
      "Stats3" -> queries.Stats3.queries.keySet,
      "Curate" -> queries.Curate.queries.keySet,
      "Survival" -> queries.Survival.queries.keySet)
    val dups = packs.combinations(2).flatMap {
      case Seq((na, a), (nb, b)) => (a & b).map(k => s"$k ($na ∩ $nb)")
    }.toSeq
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(packs.map(_._2.size).sum == SparkEntry.queries.size)
  }
}
