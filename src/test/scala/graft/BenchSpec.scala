package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout-line budget invariant. The driver keeps only the
  * last ~2000 chars of stdout (plus sbt's `[success]` trailer), so the
  * ONE machine-parseable line must fit [[Bench.StdoutBudget]] no matter
  * how many queries the registry grows to — rounds 8 and 9 both lost
  * their bench artifacts (`parsed:null`) when the fixed-format line
  * crossed the window at 74 entries. No SparkSession needed: the line
  * builder is pure. */
class BenchSpec extends AnyFunSuite {

  private val noise =
    """{"rel_spread_median":0.123,"rel_spread_max":11.128,"worst":[["a_very_noisy_query",11.13],["another_one",10.85],["third_noisiest",10.79]]}"""

  private def registry(n: Int): Seq[(String, Double)] =
    (0 until n).map(i => (f"some_rather_long_query_name_$i%03d", 0.123 + i * 0.017))

  private def parseable(line: String): Boolean = {
    // minimal structural check without a JSON lib: balanced braces, the
    // required keys present, ends cleanly
    line.startsWith("{") && line.endsWith("}") &&
      line.contains(""""metric":"total"""") && line.contains(""""queries":{""") &&
      line.count(_ == '{') == line.count(_ == '}')
  }

  test("current registry's line fits the budget and reconciles its total") {
    // realistic spread: most sub-second, a few multi-second outliers
    val med = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map {
      case (n, i) => n -> (0.1 + (i % 7) * 0.4 + (if (i % 13 == 0) 25.0 else 0.0))
    }
    val total = med.map(_._2).sum
    val line = Bench.stdoutLine(med, total, "/root/testdata/sf0.1", 3, noise)
    assert(line.length <= Bench.StdoutBudget, s"len=${line.length}")
    assert(parseable(line))
    if (line.contains("q_omitted")) {
      // the dropped tail must be the FASTEST entries and must be summed,
      // so sum(shown) + omitted_sec reconciles with value
      val shown = """"([^"]+)":(-?[0-9.]+)""".r.findAllMatchIn(
        line.substring(line.indexOf(""""queries":{"""), line.indexOf("""},"sf""""))
      ).map(m => m.group(1) -> m.group(2).toDouble).toMap
      val omittedSec = """"omitted_sec":([0-9.]+)""".r
        .findFirstMatchIn(line).get.group(1).toDouble
      // shown entries are 1dp-quantized under truncation: ±0.05 s each
      assert(math.abs(shown.values.sum + omittedSec - total) <
          0.051 * (shown.size + 1),
        "shown + omitted_sec does not reconcile with total")
      // outside the always-kept anchors, no slower query may be dropped
      // before a faster one
      val maxOmitted = med.filterNot(kv => shown.contains(kv._1)).map(_._2).max
      val minShown = med.filter(kv => shown.contains(kv._1))
        .filterNot(kv => Bench.Anchors.contains(kv._1)).map(_._2).min
      assert(maxOmitted <= minShown, "a slower query was dropped before a faster one")
      // the pinned anchors survive truncation regardless of rank
      Bench.Anchors.foreach(anc =>
        assert(shown.contains(anc), s"anchor $anc dropped from stdout projection"))
    }
  }

  test("anchors survive truncation even as the fastest entries; degraded flag ships") {
    // 300 synthetic slow entries + the 3 real anchors at near-zero time:
    // the anchors are rank-last by slowness yet must stay in the map
    val med = registry(300) ++ Bench.Anchors.map(_ -> 0.01)
    val total = med.map(_._2).sum
    val line = Bench.stdoutLine(med, total, "sf", 3, noise, degraded = true)
    assert(line.length <= Bench.StdoutBudget)
    assert(parseable(line))
    assert(line.contains(""""degraded":true"""))
    assert(line.contains("q_omitted"))
    Bench.Anchors.foreach(anc =>
      assert(line.contains(s""""$anc":"""), s"anchor $anc dropped"))
    // reconciliation still holds with anchors pulled out of rank order
    val shown = """"([^"]+)":(-?[0-9.]+)""".r.findAllMatchIn(
      line.substring(line.indexOf(""""queries":{"""), line.indexOf(""""sf""""))
    ).map(m => m.group(1) -> m.group(2).toDouble).toMap
    val omittedSec = """"omitted_sec":([0-9.]+)""".r
      .findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(shown.values.sum + omittedSec - total) <
      0.051 * (shown.size + 1))
  }

  test("degraded defaults to absent") {
    val line = Bench.stdoutLine(registry(10), 1.0, "sf", 3, noise)
    assert(!line.contains("degraded"))
  }

  test("an oversized registry degrades to slowest-K + q_omitted, never past budget") {
    for (n <- Seq(60, 74, 90, 120, 200, 400)) {
      val med = registry(n)
      val line = Bench.stdoutLine(med, med.map(_._2).sum, "/root/testdata/sf0.1", 3, noise)
      assert(line.length <= Bench.StdoutBudget, s"n=$n len=${line.length}")
      assert(parseable(line), s"n=$n not parseable")
      assert(line.contains(s""""n_queries":$n"""))
      if (line.contains("q_omitted")) {
        // the slowest entry must survive truncation — it dominates total
        val slowest = med.maxBy(_._2)._1
        assert(line.contains(s""""$slowest""""), s"n=$n dropped the slowest query")
      }
    }
  }

  test("failed queries (-1.0 medians) are counted, never summed into omitted_sec") {
    // failures sort as "fastest" under truncation, so with a big registry
    // they all land in the omitted tail — omitted_sec must not go down by
    // a phantom second per failure
    val med = registry(300).take(295) ++
      (0 until 5).map(i => (f"failed_query_$i%02d", -1.0))
    val total = med.map(_._2).filter(_ >= 0).sum
    val line = Bench.stdoutLine(med, total, "sf", 3, noise)
    assert(line.length <= Bench.StdoutBudget)
    assert(parseable(line))
    assert(line.contains(""""q_failed":5"""))
    assert(line.contains("q_omitted"))
    val shown = """"([^"]+)":(-?[0-9.]+)""".r.findAllMatchIn(
      line.substring(line.indexOf(""""queries":{"""), line.indexOf(""""sf""""))
    ).map(m => m.group(1) -> m.group(2).toDouble).toMap
    val omittedSec = """"omitted_sec":(-?[0-9.]+)""".r
      .findFirstMatchIn(line).get.group(1).toDouble
    assert(omittedSec >= 0, "omitted_sec went negative-adjusted by failures")
    // shown entries are 1dp-quantized under truncation: ±0.05 s each
    assert(math.abs(shown.values.filter(_ >= 0).sum + omittedSec - total) <
        0.051 * (shown.size + 1),
      "shown + omitted_sec does not reconcile with the non-failed total")
  }

  test("truncation keeps the slowest entries and counts the dropped ones") {
    val med = registry(300)
    val line = Bench.stdoutLine(med, 1.0, "sf", 3, noise)
    assert(line.contains("q_omitted"))
    val shown = """"some_rather_long_query_name_(\d+)":""".r
      .findAllMatchIn(line).map(_.group(1).toInt).toSeq
    assert(shown.nonEmpty)
    // entries are indexed in increasing duration, so the kept set must be
    // a suffix of the index range (the slowest K)
    val minShown = shown.min
    assert(shown.toSet == (minShown until 300).toSet,
      "kept set is not the slowest-K suffix")
    val omitted = """"q_omitted":(\d+)""".r.findFirstMatchIn(line).get.group(1).toInt
    assert(omitted == 300 - shown.size)
  }
}
