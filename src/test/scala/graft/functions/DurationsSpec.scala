package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class DurationsSpec extends AnyFunSuite {
  test("reference grammar cases (Backend/Simulator/DBAPI/utils.py:6-76)") {
    assert(Durations.parse("1H").contains(3600L))
    assert(Durations.parse("30min").contains(1800L))
    assert(Durations.parse("2D").contains(172800L))
    assert(Durations.parse("1h30m").contains(5400L))
    assert(Durations.parse("2days 5hours").contains(190800L))
    assert(Durations.parse("10s").contains(10L))
    assert(Durations.parse("1w").contains(604800L))
    assert(Durations.parse("90").contains(90L))   // bare number = seconds
    assert(Durations.parse("1.5h").contains(5400L))
    assert(Durations.parse("").contains(0L))
    assert(Durations.parse("0").contains(0L))
  }

  test("unknown units fail fast; parseOrZero is total") {
    assert(Durations.parse("5 parsecs").isEmpty)
    assert(Durations.parse("bogus").isEmpty)
    assert(Durations.parseOrZero("bogus") == 0L)
  }

  test("property: n seconds round-trips (seeded sample)") {
    val rng = new Random(42)
    (1 to 200).foreach { _ =>
      val n = rng.nextLong(1000000L).abs
      assert(Durations.parse(s"${n}s").contains(n))
      assert(Durations.parse(n.toString).contains(n))
      assert(Durations.parse(s"${n}m").contains(n * 60))
    }
  }
}
